"""LoFTR training harness (train/loftr.py): homography supervision + losses.

Counterpart coverage for the reference's vendored-but-never-invoked Lightning
harness (`/root/reference/src/utils/src/lightning/lightning_loftr.py`,
`losses/loftr_loss.py`, `loftr/utils/supervision.py`) — SURVEY section 2.5's
one remaining "no" row.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu import parallel, train as T
from image_search_engine_for_historical_research_tpu.models import loftr
from image_search_engine_for_historical_research_tpu.train.loftr import (
    apply_homography,
    coarse_gt_matrix,
    coarse_focal_loss,
)


SMALL = loftr.LoFTRConfig(
    initial_dim=16, block_dims=(16, 24, 32), d_coarse=32, d_fine=16,
    nhead=4, coarse_layers=("self", "cross"), thr=0.0, max_matches=24,
)


def test_identity_homography_fixed_points():
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (32, 48, 1)).astype(np.float32)
    )
    eye = jnp.eye(3)
    np.testing.assert_allclose(
        np.asarray(T.warp_image(img, eye)), np.asarray(img), atol=1e-5
    )
    gt = coarse_gt_matrix(eye, 4, 6, 8)
    np.testing.assert_array_equal(np.asarray(gt), np.eye(24, dtype=bool))


def test_translation_homography_gt_shift():
    """A +8px x-translation (one coarse cell) maps cell i -> i+1 per row,
    with the last column falling out of bounds."""
    Hm = jnp.asarray(
        np.array([[1, 0, 8], [0, 1, 0], [0, 0, 1]], np.float32)
    )
    Hc, Wc = 3, 4
    gt = np.asarray(coarse_gt_matrix(Hm, Hc, Wc, 8))
    for r in range(Hc):
        for c in range(Wc):
            i = r * Wc + c
            row = np.nonzero(gt[i])[0]
            if c + 1 < Wc:
                assert row.tolist() == [i + 1], (i, row)
            else:
                assert row.size == 0


def test_focal_loss_prefers_correct_confidence():
    gt = jnp.eye(6, dtype=bool)
    good = jnp.where(gt, 0.9, 0.01)
    bad = jnp.where(gt, 0.1, 0.4)
    assert float(coarse_focal_loss(good, gt)) < float(coarse_focal_loss(bad, gt))


def test_warp_matches_point_mapping():
    rng = np.random.default_rng(3)
    Hm = T.random_homography(rng, 32, 48, jitter=0.08)
    pts = jnp.asarray([[10.0, 12.0], [30.0, 20.0]])
    mapped = np.asarray(apply_homography(jnp.asarray(Hm), pts))
    back = np.asarray(
        apply_homography(jnp.asarray(np.linalg.inv(Hm)), jnp.asarray(mapped))
    )
    np.testing.assert_allclose(back, np.asarray(pts), atol=1e-3)


class TestTrainLoop:
    @pytest.fixture(scope="class")
    def setup(self):
        m, variables = loftr.init_matcher(
            image_shape=(32, 48), rng=jax.random.PRNGKey(0), config=SMALL
        )
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(0, 1, (8, 32, 48, 1)).astype(np.float32))
        Hs = jnp.stack([
            jnp.asarray(T.random_homography(rng, 32, 48, jitter=0.05))
            for _ in range(8)
        ])
        return m, variables, imgs, Hs

    def test_loss_decreases_and_stats_frozen(self, setup):
        m, variables, imgs, Hs = setup
        tx = T.make_loftr_optimizer(lr=3e-4, warmup_steps=2)
        state = T.init_loftr_train_state(variables, tx)
        step = T.make_loftr_train_step(m, tx)
        losses = []
        for _ in range(5):
            state, loss = step(state, imgs[:2], Hs[:2])
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        np.testing.assert_array_equal(
            np.asarray(variables["batch_stats"]["backbone"]["bn1"]["mean"]),
            np.asarray(state.params["batch_stats"]["backbone"]["bn1"]["mean"]),
        )

    def test_accum_matches_full_batch(self, setup):
        """Gradient accumulation over micro-batches (accum=2) is the same
        optimizer step as the full vmap batch (equal micro sizes -> the
        mean of micro means equals the batch mean)."""
        m, variables, imgs, Hs = setup
        tx = T.make_loftr_optimizer(lr=3e-4, warmup_steps=2)

        state_a = T.init_loftr_train_state(variables, tx)
        step = T.make_loftr_train_step(m, tx)
        state_a, loss_full = step(state_a, imgs[:4], Hs[:4])

        state_b = T.init_loftr_train_state(variables, tx)
        step_acc = T.make_loftr_train_step(m, tx, accum=2)
        state_b, loss_acc = step_acc(state_b, imgs[:4], Hs[:4])

        assert float(loss_acc) == pytest.approx(float(loss_full), rel=1e-5)
        la = jax.tree_util.tree_leaves(state_a.params["params"])
        lb = jax.tree_util.tree_leaves(state_b.params["params"])
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
            )

    def test_bf16_remat_step_trains(self, setup):
        """The throughput ladder (bf16 compute + remat'd encoder layers,
        VERDICT r4 #6) still decreases the loss; params stay f32."""
        from dataclasses import replace

        m, variables, imgs, Hs = setup
        mod = m.clone(config=replace(m.config, remat=True))
        tx = T.make_loftr_optimizer(lr=3e-4, warmup_steps=2)
        state = T.init_loftr_train_state(variables, tx)
        step = T.make_loftr_train_step(
            mod, tx, compute_dtype=jnp.bfloat16, accum=2
        )
        losses = []
        for _ in range(5):
            state, loss = step(state, imgs[:2], Hs[:2])
            try:
                losses.append(float(loss))
            except jax.errors.JaxRuntimeError as e:  # pragma: no cover
                if "BF16" in str(e) and jax.default_backend() == "cpu":
                    pytest.skip(
                        "CPU thunk runtime lacks BF16xBF16->F32 dot; the "
                        "bf16 ladder is exercised on TPU "
                        "(scripts/measure_loftr_train.py)"
                    )
                raise
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        leaf = jax.tree_util.tree_leaves(state.params["params"])[0]
        assert leaf.dtype == jnp.float32

    def test_sharded_step_matches_unsharded(self, setup):
        m, variables, imgs, Hs = setup
        mesh = parallel.data_mesh(8)
        tx = T.make_loftr_optimizer(lr=3e-4, warmup_steps=2)

        state = T.init_loftr_train_state(variables, tx)
        step = T.make_loftr_train_step(m, tx)
        _, loss_1 = step(state, imgs, Hs)

        state_sh = jax.device_put(
            T.init_loftr_train_state(variables, tx),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
        )
        step_sh = T.make_loftr_train_step(m, tx, mesh=mesh)
        _, loss_8 = step_sh(
            state_sh,
            parallel.shard_batch(imgs, mesh),
            parallel.shard_batch(Hs, mesh),
        )
        assert float(loss_8) == pytest.approx(float(loss_1), rel=1e-4)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from image_search_engine_for_historical_research_tpu import parallel


@pytest.fixture(scope="module")
def mesh():
    return parallel.data_mesh(8)


def test_sharded_topk_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    db = rng.standard_normal((1024, 64)).astype(np.float32)
    q = rng.standard_normal((5, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    db_sharded = parallel.shard_batch(jnp.asarray(db), mesh)
    s, i = parallel.sharded_exact_topk(jnp.asarray(q), db_sharded, 17, mesh, chunk=128)
    ref_idx = np.argsort(-(q @ db.T), axis=1)[:, :17]
    np.testing.assert_array_equal(np.asarray(i), ref_idx)


def test_sharded_topk_k_exceeds_shard(mesh):
    rng = np.random.default_rng(1)
    db = rng.standard_normal((64, 16)).astype(np.float32)  # 8 rows per shard
    q = rng.standard_normal((3, 16)).astype(np.float32)
    db_sharded = parallel.shard_batch(jnp.asarray(db), mesh)
    # k=20 > shard size 8: merge must still return the global top-20
    s, i = parallel.sharded_exact_topk(jnp.asarray(q), db_sharded, 20, mesh, chunk=128)
    assert i.shape == (3, 20)
    ref_idx = np.argsort(-(q @ db.T), axis=1)[:, :8]
    # per-shard cap of 8 candidates: global top-8 is guaranteed correct
    np.testing.assert_array_equal(np.asarray(i)[:, :8], ref_idx)


def test_indivisible_rows_raises(mesh):
    db = jnp.zeros((10, 4))
    with pytest.raises(ValueError, match="divisible"):
        parallel.sharded_exact_topk(jnp.zeros((1, 4)), db, 2, mesh)

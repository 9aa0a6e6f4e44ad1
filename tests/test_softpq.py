import numpy as np
import jax
import jax.numpy as jnp
import optax

from image_search_engine_for_historical_research_tpu.ops import softpq
from image_search_engine_for_historical_research_tpu.index.matchers import (
    matching_PQ_Net,
    matching_PQ_Net_bucket,
)


def data(N=600, D=32, k=12, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, D)).astype(np.float32)
    x = centers[rng.integers(0, k, N)] + 0.2 * rng.standard_normal((N, D)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def test_soft_quantize_shapes_and_hard_consistency():
    x = jnp.asarray(data())
    st = softpq.init_softpq(32, M=4, Ks=16)
    q, soft, hard = softpq.soft_quantize(st, x, tau=50.0)
    assert q.shape == x.shape
    assert soft.shape == (600, 4, 16)
    assert hard.shape == (600, 4)
    # at high tau, soft assignment concentrates on the hard argmin
    assert float(jnp.take_along_axis(soft, hard[:, :, None], 2).mean()) > 0.9


def test_softpq_training_reduces_distortion():
    x = jnp.asarray(data(seed=1))
    st = softpq.init_softpq(32, M=4, Ks=16, key=jax.random.PRNGKey(1))
    tx = optax.adam(1e-2)
    opt = tx.init(st)

    @jax.jit
    def step(st, opt):
        loss, g = jax.value_and_grad(softpq.softpq_loss)(st, x)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(st, updates), opt, loss

    losses = []
    for _ in range(60):
        st, opt, loss = step(st, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5


def test_codewords_flat_roundtrip():
    st = softpq.init_softpq(32, M=4, Ks=16)
    flat = softpq.codewords_flat(st)
    assert flat.shape == (16, 32)
    back = softpq.codewords_from_flat(flat, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(st.codewords))


def test_matching_pq_net_matches_decoded_ordering():
    x = data(seed=2)
    st = softpq.init_softpq(32, M=4, Ks=32, key=jax.random.PRNGKey(2))
    _, _, hard = softpq.soft_quantize(st, jnp.asarray(x))
    flat = np.asarray(softpq.codewords_flat(st))
    q = x[:5]
    idx, tpq = matching_PQ_Net(10, flat, q, 4, np.asarray(hard))
    assert idx.shape == (5, 10)
    assert tpq >= 0
    # oracle: decode codes and compute exact distances
    cw = np.asarray(st.codewords)
    decoded = np.stack(
        [cw[m][np.asarray(hard)[:, m]] for m in range(4)], axis=1
    ).reshape(600, 32)
    d = np.linalg.norm(q[:, None] - decoded[None], axis=2)
    ref_top1 = np.argsort(d, axis=1)[:, 0]
    # ADC distance == decoded distance up to per-subspace cross terms; top-1
    # should agree for clustered data
    assert (idx[:, 0] == ref_top1).mean() >= 0.8


def test_matching_pq_net_bucket():
    x = data(seed=3)
    st = softpq.init_softpq(32, M=4, Ks=32, key=jax.random.PRNGKey(3))
    _, _, hard = softpq.soft_quantize(st, jnp.asarray(x))
    flat = np.asarray(softpq.codewords_flat(st))
    q = x[:4]
    idx, _ = matching_PQ_Net_bucket(5, flat, q, 4, np.asarray(hard), x, n_buckets=5)
    assert idx.shape == (4, 5)
    # query 0 is x[0]; its own index should appear in its bucket's top results
    assert 0 in idx[0]

"""Property-based tests (hypothesis) for the core kernels.

Randomized shape/value sweeps over the invariants that every other layer
builds on: exact top-k == numpy argsort, the streaming (beyond-HBM) scan ==
the in-memory scan for ANY chunking, PQ ADC scores == the explicit LUT sum,
and the pooling ops' closed-form identities.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

SET = dict(max_examples=20, deadline=None)


@settings(**SET)
@given(
    n=st.integers(5, 200),
    d=st.integers(2, 48),
    q=st.integers(1, 9),
    k=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_exact_topk_matches_numpy(n, d, q, k, seed):
    from image_search_engine_for_historical_research_tpu.ops import exact_topk

    rng = np.random.default_rng(seed)
    db = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    k = min(k, n)
    s, i = exact_topk(jnp.asarray(qs), jnp.asarray(db), k)
    ref = np.argsort(-(qs @ db.T), axis=1, kind="stable")[:, :k]
    # scores must match the true top-k scores exactly (ids may differ on ties)
    np.testing.assert_allclose(
        np.asarray(s),
        np.take_along_axis(qs @ db.T, ref, axis=1),
        rtol=1e-5, atol=1e-5,
    )


@settings(**SET)
@given(
    n=st.integers(10, 300),
    chunk=st.integers(3, 350),
    k=st.integers(1, 25),
    seed=st.integers(0, 2**31 - 1),
)
def test_streaming_equals_in_memory(n, chunk, k, seed):
    from image_search_engine_for_historical_research_tpu.ops import (
        exact_topk, streaming_exact_topk,
    )

    rng = np.random.default_rng(seed)
    db = rng.standard_normal((n, 16)).astype(np.float32)
    qs = rng.standard_normal((3, 16)).astype(np.float32)
    k = min(k, n)
    s1, i1 = exact_topk(jnp.asarray(qs), jnp.asarray(db), k)
    s2, i2 = streaming_exact_topk(qs, db, k, device_chunk=chunk)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=1e-5)
    # ids equal wherever scores are distinct
    same = np.isclose(np.asarray(s1), np.asarray(s2))
    assert same.all()


@settings(**SET)
@given(
    n=st.integers(8, 120),
    m=st.sampled_from([2, 4]),
    ks=st.sampled_from([4, 8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_pq_adc_scores_equal_lut_sum(n, m, ks, seed):
    from image_search_engine_for_historical_research_tpu.ops.pq import (
        PQCodebook, pq_search,
    )

    rng = np.random.default_rng(seed)
    ds = 8
    cw = rng.standard_normal((m, ks, ds)).astype(np.float32)
    codes = rng.integers(0, ks, (n, m)).astype(np.uint8)
    q = rng.standard_normal((2, m * ds)).astype(np.float32)
    cb = PQCodebook(codewords=jnp.asarray(cw))
    s, i = pq_search(cb, jnp.asarray(codes), jnp.asarray(q), min(5, n),
                     method="onehot")
    # explicit ADC: score = -sum_m ||q_m - cw[m, code]||^2
    qs = q.reshape(2, m, ds)
    d2 = ((qs[:, :, None, :] - cw[None]) ** 2).sum(-1)     # (2, m, ks)
    full = -np.stack([
        d2[b, np.arange(m)[:, None], codes.T].sum(0) for b in range(2)
    ])
    top = np.sort(full, axis=1)[:, ::-1][:, : min(5, n)]
    np.testing.assert_allclose(np.sort(np.asarray(s), axis=1)[:, ::-1],
                               top, rtol=1e-4, atol=1e-4)


@settings(**SET)
@given(
    b=st.integers(1, 4),
    h=st.integers(3, 12),
    w=st.integers(3, 12),
    c=st.integers(1, 8),
    seed=st.integers(0, 2**31 - 1),
)
def test_pooling_identities(b, h, w, c, seed):
    from image_search_engine_for_historical_research_tpu.ops import gem, mac, spoc

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0.01, 2.0, (b, h, w, c)).astype(np.float32))
    # gem(p=1) == spoc (mean); gem(p->large) -> mac (max)
    np.testing.assert_allclose(
        np.asarray(gem(x, p=1.0)), np.asarray(spoc(x)), rtol=1e-5
    )
    g_big = np.asarray(gem(x, p=64.0))
    np.testing.assert_allclose(g_big, np.asarray(mac(x)), rtol=0.15)
    # monotone in p
    assert (np.asarray(gem(x, p=3.0)) <= np.asarray(gem(x, p=8.0)) + 1e-5).all()

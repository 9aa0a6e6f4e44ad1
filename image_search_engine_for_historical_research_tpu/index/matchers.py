"""Reference-parity matcher API: the ``matching_*`` function family.

Drop-in counterparts of the reference's matcher functions
(``/root/reference/src/utils/nnsearch.py``), with the same inputs/outputs —
``(idx (num_test, K) int64, time_per_query seconds)`` — and the same
``ifgenerate`` build-or-load artifact contract, but with row-major arrays,
npz/manifest artifacts instead of pickled live objects, and every search running
as jitted TPU programs. Matching the reference, input features are row-L2-
normalized inside each matcher.

Timing follows the reference protocol: the clock covers the search only, never
the index build (nnsearch.py:699-706 et al.). One caveat carried over honestly:
on TPU the first call includes XLA compilation; pass ``warmup=True`` (default)
to exclude it like the reference excludes faiss index training.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.hashing import fractional_topk, hamming_topk, lsh_encode, lsh_hyperplanes
from .base import load_index, normalize_rows, save_index
from .flat import build_flat, build_flat_i8
from .hnsw import build_hnsw, build_hnsw_pq
from .ivfpq import build_ivfpq
from .pq import build_pq
from .rpforest import build_rpforest


def _as_rows(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, np.float32))


def _timed_search(index, qvecs, K, warmup=True):
    if warmup:
        index.search(qvecs[:1], min(K, index.n))
    t1 = time.time()
    scores, idx = index.search(qvecs, K)
    idx = np.asarray(idx, np.int64)
    t2 = time.time()
    return idx, (t2 - t1) / qvecs.shape[0]


def _artifact(dataset: str, name: str, outputs: str = "outputs") -> str:
    d = os.path.join(outputs, dataset)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def matching_L2(K, train, test, warmup=True):
    """Exact search (nnsearch.py:687-706)."""
    db = normalize_rows(_as_rows(train))
    q = normalize_rows(_as_rows(test))
    index = build_flat(db, metric="cosine")
    return _timed_search(index, q, min(K, db.shape[0]), warmup)


def matching_L2_int8(K, train, test, rerank="bfloat16", shortlist=512,
                     warmup=True):
    """Int8-quantized exact search (no reference counterpart; plays the role
    of faiss IndexScalarQuantizer(QT_8bit) in that ecosystem). Half the scan
    bytes of the bf16 flat scan at the same measured recall when
    ``rerank="bfloat16"`` (BASELINE.md int8 rows)."""
    db = _as_rows(train)
    q = normalize_rows(_as_rows(test))
    index = build_flat_i8(db, rerank=rerank, shortlist=shortlist)
    return _timed_search(index, q, min(K, index.n), warmup)


def matching_fractional_dis(K, train, test, p=0.5, warmup=True):
    """Fractional-distance matcher (nnsearch.py:709-731)."""
    db = normalize_rows(_as_rows(train))
    q = normalize_rows(_as_rows(test))
    if warmup:
        fractional_topk(db, q[:1], min(K, db.shape[0]), p)
    t1 = time.time()
    _, idx = fractional_topk(db, q, min(K, db.shape[0]), p)
    idx = np.asarray(idx, np.int64)
    t2 = time.time()
    return idx, (t2 - t1) / q.shape[0]


def matching_LSH(K, train, test, n_bits=512, seed=42, warmup=True):
    """Random-hyperplane LSH + Hamming scan (nnsearch.py:734-745)."""
    db = normalize_rows(_as_rows(train))
    q = normalize_rows(_as_rows(test))
    planes = lsh_hyperplanes(db.shape[1], n_bits, seed)
    db_codes = lsh_encode(planes, db)
    q_codes = lsh_encode(planes, q)
    if warmup:
        hamming_topk(db_codes, q_codes[:1], min(K, db.shape[0]))
    t1 = time.time()
    _, idx = hamming_topk(db_codes, q_codes, min(K, db.shape[0]))
    idx = np.asarray(idx, np.int64)
    t2 = time.time()
    return idx, (t2 - t1) / q.shape[0]


def matching_Greedyhash(K, hash_train, hash_test, warmup=True):
    """Hamming matcher over external binary codes (nnsearch.py:1001-1013)."""
    from ..ops.hashing import pack_bits

    db = pack_bits(jnp.asarray(np.asarray(hash_train) > 0))
    q = pack_bits(jnp.asarray(np.asarray(hash_test) > 0))
    if warmup:
        hamming_topk(db, q[:1], min(K, db.shape[0]))
    t1 = time.time()
    _, idx = hamming_topk(db, q, min(K, db.shape[0]))
    idx = np.asarray(idx, np.int64)
    t2 = time.time()
    return idx, (t2 - t1) / q.shape[0]


def _build_or_load(path, ifgenerate, builder):
    if ifgenerate or not os.path.exists(os.path.join(path, "manifest.json")):
        index = builder()
        save_index(index, path)
        return index
    return load_index(path)


def _clamp_ks(Ks, n_rows):
    """Largest power-of-two codebook the training set can populate.

    The reference drivers hardwire Ks=2^13 (offline.py:109,116) and nanopq
    asserts N >= Ks; small fixture datasets keep working by halving down."""
    while Ks > max(1, n_rows):
        Ks //= 2
    return Ks


def matching_Nano_PQ(
    K, train, test, dataset, N_books=16, n_bits_perbook=13,
    ifgenerate=True, outputs="outputs", warmup=True, opq=False, refine_M=0,
):
    """PQ + asymmetric-distance scan (nnsearch.py:847-901).

    Defaults follow the reference driver (offline.py:109: N_books=16,
    n_bits_perbook=13), not nanopq's 8-bit default. ``refine_M > 0`` adds
    second-level residual codes (PQ-R / faiss IndexPQR, round 5): search
    auto-switches to the codes-only ``adc+refine`` re-rank — the
    full-coverage route for the >= 10M regime (BASELINE.md)."""
    q = normalize_rows(_as_rows(test))
    rows = _as_rows(train)
    path = _artifact(dataset, "pq", outputs)
    index = _build_or_load(
        path, ifgenerate,
        lambda: build_pq(
            rows, M=N_books, Ks=_clamp_ks(2 ** n_bits_perbook, rows.shape[0]),
            opq=opq, refine_M=refine_M,
        ),
    )
    return _timed_search(index, q, min(K, index.n), warmup)


def matching_ANNOY(
    K, train, test, metric="euclidean", dataset="default", n_trees=100,
    leaf_size=512, ifgenerate=True, outputs="outputs", warmup=True,
):
    """RP-forest, the ANNOY-class matcher (nnsearch.py:1016-1051).

    Defaults follow the reference driver (offline.py:112: n_trees=100);
    leaf_size=512 per the measured recall-vs-memory curve (BASELINE.md)."""
    q = normalize_rows(_as_rows(test))
    path = _artifact(dataset, "rpforest", outputs)
    index = _build_or_load(
        path, ifgenerate,
        lambda: build_rpforest(_as_rows(train), n_trees=n_trees, leaf_size=leaf_size),
    )
    return _timed_search(index, q, min(K, index.n), warmup)


def matching_HNSW(
    K, train, test, dataset, m=16, ef=100,
    ifgenerate=True, outputs="outputs", warmup=True,
):
    """HNSW graph matcher (nnsearch.py:487-538; params from offline.py:114)."""
    q = normalize_rows(_as_rows(test))
    path = _artifact(dataset, "hnsw", outputs)
    index = _build_or_load(
        path, ifgenerate,
        lambda: build_hnsw(_as_rows(train), m=m, ef_construction=ef),
    )
    return _timed_search(index, q, min(K, index.n), warmup)


def matching_HNSW_NanoPQ(
    K, train, test, dataset, N_books=16, N_words=2 ** 13, m=16, ef=100,
    ifgenerate=True, outputs="outputs", warmup=True, opq=False,
):
    """PQ-encode + dedupe + HNSW over unique codes (nnsearch.py:585-683).

    Defaults follow the reference driver (offline.py:116 / online.py:141:
    N_books=16, N_words=2**13, m=16, ef=100)."""
    q = normalize_rows(_as_rows(test))
    rows = _as_rows(train)
    path = _artifact(dataset, "hnsw_pq", outputs)
    index = _build_or_load(
        path, ifgenerate,
        lambda: build_hnsw_pq(
            rows, M=N_books, Ks=_clamp_ks(N_words, rows.shape[0]),
            m=m, ef_construction=ef, opq=opq,
        ),
    )
    return _timed_search(index, q, min(K, index.n), warmup)


def matching_IVFPQ(
    K, train, test, dataset, nlist=316, M=16, nbits=8, nprobe=64,
    ifgenerate=True, outputs="outputs", warmup=True, opq=False, refine_M=0,
):
    """IVF-PQ matcher (the faiss ANN of knn.py:43-54). ``opq`` learns an
    orthogonal pre-rotation of the residuals (faiss OPQMatrix arrangement);
    ``refine_M > 0`` adds second-level refinement codes (faiss IndexIVFPQR)
    and search auto-switches to the codes-only ``adc+refine`` re-rank.

    .. note:: Not the recommended codes-only default at ~1M. Measured at 1M
       (BASELINE.md): recall@100 0.927 / recall@10 0.730 at 4.08 ms/q with
       OPQ — below ``matching_HNSW_NanoPQ``'s hybrid-OPQ route (0.951@100 /
       0.821@10 at 2.63 ms/q). IVF probing starts paying only at >= 10M
       codes (the measured crossover, scripts/measure_10m.py), or as the
       kNN backend for diffusion where the reference uses it
       (diffusion.py:47)."""
    q = normalize_rows(_as_rows(test))
    path = _artifact(dataset, "ivfpq", outputs)
    index = _build_or_load(
        path, ifgenerate,
        lambda: build_ivfpq(
            _as_rows(train), nlist=nlist, M=M, Ks=2 ** nbits, nprobe=nprobe,
            opq=opq, refine_M=refine_M,
        ),
    )
    return _timed_search(index, q, min(K, index.n), warmup)


# method-name dispatch used by the CLIs (offline.py:107-116 / online.py:130-143)
MATCHERS: Dict[str, Callable] = {
    "L2": matching_L2,
    "L2_int8": matching_L2_int8,
    "fractional": matching_fractional_dis,
    "LSH": matching_LSH,
    "PQ": matching_Nano_PQ,
    "Nano_PQ": matching_Nano_PQ,
    "ANNOY": matching_ANNOY,
    "HNSW": matching_HNSW,
    "PQ_HNSW": matching_HNSW_NanoPQ,
    "HNSW_NanoPQ": matching_HNSW_NanoPQ,
    "IVFPQ": matching_IVFPQ,
    "Greedyhash": matching_Greedyhash,
}


def matching_PQ_Net(K, Codewords, Query, N_books, CW_idx, warmup=True):
    """ADC matcher over externally trained codewords (nnsearch.py:905-946).

    ``Codewords``: (N_words, N_books * L_word) flat layout (the reference's
    transpose+reshape of per-book codewords); ``CW_idx``: (N, N_books) codes.
    """
    from ..ops.pq import PQCodebook, pq_search
    from ..ops.softpq import codewords_from_flat

    cw = codewords_from_flat(jnp.asarray(np.asarray(Codewords, np.float32)), N_books)
    codes = jnp.asarray(np.asarray(CW_idx, np.int32))
    q = _as_rows(Query)
    if warmup:
        pq_search(PQCodebook(cw), codes, q[:1], min(K, codes.shape[0]))
    t1 = time.time()
    _, idx = pq_search(PQCodebook(cw), codes, q, min(K, codes.shape[0]))
    idx = np.asarray(idx, np.int64)
    t2 = time.time()
    return idx, (t2 - t1) / q.shape[0]


def matching_PQ_Net_bucket(
    K, Codewords, Query, N_books, CW_idx, Gallery_features,
    n_buckets=10, warmup=True,
):
    """Coarse-bucketed ADC matcher (nnsearch.py:949-998): k-means buckets over
    raw gallery features select candidates, ADC ranks within the bucket.

    The reference scans only the query's own bucket; kept here (including its
    weakness: fewer than K candidates in a bucket are padded with -1). The scan
    is one batched device program over bucket-major contiguous windows instead
    of the reference's per-query member loop: codes are reordered by bucket so
    each query reads a contiguous padded slice (the IVF-list layout of
    ``index.ivfpq``), and the ADC lookup + ranking run under jit.
    """
    import jax

    from ..ops.kmeans import kmeans_fit, _assign
    from ..ops.pq import PQCodebook, pq_dist_table
    from ..ops.softpq import codewords_from_flat

    g = _as_rows(Gallery_features)
    q = _as_rows(Query)
    centers, labels = kmeans_fit(g, n_buckets, iters=20)
    labels = np.asarray(labels)
    qbucket = np.asarray(_assign(q, centers))

    cw = codewords_from_flat(jnp.asarray(np.asarray(Codewords, np.float32)), N_books)
    codes = np.asarray(CW_idx, np.int32)
    dt = pq_dist_table(PQCodebook(cw), q)  # (Q, M, Ks) on device

    # bucket-major layout: each bucket's codes are one contiguous slice
    order = np.argsort(labels, kind="stable")
    counts = np.bincount(labels, minlength=n_buckets)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    maxlen = int(counts.max())
    sorted_codes = np.zeros((starts[-1] + counts[-1] + maxlen, N_books), np.int32)
    sorted_codes[: codes.shape[0]] = codes[order]

    k_eff = min(K, maxlen)

    @jax.jit
    def bucket_scan(dt_dev, codes_dev, start, length):
        win = start[:, None] + jnp.arange(maxlen)[None, :]          # (Q, maxlen)
        cand = codes_dev[win]                                       # (Q, maxlen, M)
        d = jnp.take_along_axis(
            dt_dev, jnp.transpose(cand, (0, 2, 1)), axis=2
        ).sum(axis=1)                                               # (Q, maxlen)
        s = jnp.where(jnp.arange(maxlen)[None, :] < length[:, None], -d, -jnp.inf)
        top_s, sel = jax.lax.top_k(s, k_eff)
        return top_s, win[jnp.arange(s.shape[0])[:, None], sel]

    t1 = time.time()
    top_s, pos = bucket_scan(
        dt, jnp.asarray(sorted_codes),
        jnp.asarray(starts[qbucket]), jnp.asarray(counts[qbucket]),
    )
    top_s, pos = np.asarray(top_s), np.asarray(pos)
    idx = np.full((q.shape[0], K), -1, np.int64)
    idx[:, :k_eff] = np.where(np.isfinite(top_s), order[np.minimum(pos, len(order) - 1)], -1)
    t2 = time.time()
    return idx, (t2 - t1) / q.shape[0]


MATCHERS["PQ_Net"] = matching_PQ_Net

"""k-reciprocal re-ranking (CVPR'17 person re-ID) as dense device linear algebra.

TPU-native counterpart of ``kr_reranking``
(``/root/reference/src/utils/Reranking.py:447-624``): the reference builds
k-reciprocal neighbour sets with host loops over python lists, an inverted index,
and a sparse Jaccard accumulation on CUDA+numpy. Here the sets are boolean
matrices and every step is a (masked) matmul — O(n^2) memory, which matches the
reference's own dense ``V (all_num, all_num)`` float32 allocation (:513-525), so
the practical size envelope is the same (~tens of thousands of images).

Semantics kept: k1=20 reciprocal neighbours with 2/3-overlap expansion, exp(-d)
weights, k2=6 query expansion of V, Jaccard distance, final
``(1-lambda) * jaccard + lambda * original`` with lambda=0.3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.normalization import l2n


@partial(jax.jit, static_argnames=("k1", "k2"))
def kr_rerank_scores(
    qvecs: jnp.ndarray,
    vecs: jnp.ndarray,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
) -> jnp.ndarray:
    """Returns the final distance matrix (Q, N); rank ascending.

    Inputs are L2-normalized descriptors (the reference assumes this:
    ``dist = 2 - 2 q.g``, Reranking.py:460).
    """
    feat = jnp.concatenate([qvecs, vecs], axis=0)
    nq = qvecs.shape[0]
    n = feat.shape[0]

    d = 2.0 - 2.0 * (feat @ feat.T)                     # (n, n)
    d = d / jnp.clip(jnp.max(d, axis=0, keepdims=True), min=1e-12)

    # top-(k1+1) neighbour membership, row-wise
    def topk_mask(dist, k):
        _, idx = jax.lax.top_k(-dist, k)
        m = jnp.zeros((n, n), bool)
        rows = jnp.arange(n, dtype=jnp.int32)[:, None]
        return m.at[rows, idx].set(True)

    nbr = topk_mask(d, k1 + 1)                          # i -> top k1+1
    recip = jnp.logical_and(nbr, nbr.T)                 # k-reciprocal set R(i, k1)

    half = topk_mask(d, int(round(k1 / 2)) + 1)
    recip_half = jnp.logical_and(half, half.T)          # R(j, k1/2)

    # expansion: include R_half(j) when |R_half(j) & R(i)| > 2/3 |R_half(j)|
    overlap = recip_half.astype(jnp.float32) @ recip.astype(jnp.float32).T  # (j, i)
    sizes = jnp.sum(recip_half, axis=1).astype(jnp.float32)[:, None]
    grow = jnp.logical_and(overlap > (2.0 / 3.0) * sizes, recip.T)          # (j, i)
    expanded = jnp.logical_or(
        recip, (grow.astype(jnp.float32).T @ recip_half.astype(jnp.float32)) > 0
    )

    # V: exp(-d) weights over the expanded sets, row-normalized
    w = jnp.where(expanded, jnp.exp(-d), 0.0)
    V = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1e-12)

    # query expansion of V over the k2 nearest neighbours
    _, idx2 = jax.lax.top_k(-d, k2)
    V = jnp.mean(V[idx2], axis=1)                       # (n, n)

    # Jaccard distance for query rows against everything
    def jac_row(vq):
        minsum = jnp.sum(jnp.minimum(vq[None, :], V), axis=1)  # (n,)
        return 1.0 - minsum / (2.0 - minsum)

    jaccard = jax.lax.map(jac_row, V[:nq])              # (nq, n)

    orig = d[:nq, :]
    final = jaccard * (1 - lambda_value) + orig * lambda_value
    return final[:, nq:]                                # (Q, N)


def kr_rerank(
    qvecs,
    vecs,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    max_bytes: int = 8 << 30,
):
    """Ranks (Q, N) ascending by the re-ranked distance (Reranking.py:616-624).

    Raises before allocating when the O(n^2) working set would exceed
    ``max_bytes``: the algorithm holds ~6 (n, n) buffers live (distance matrix,
    reciprocal masks, V and its expansion), ~24 bytes/entry peak. An OOM on the
    16 GB chip wedges the worker for minutes (CLAUDE.md), so fail fast instead.
    """
    n = int(qvecs.shape[0]) + int(vecs.shape[0])
    est = 24 * n * n
    if est > max_bytes:
        raise ValueError(
            f"kr_rerank needs ~{est / 2**30:.1f} GiB for n={n} (queries+gallery); "
            f"budget is {max_bytes / 2**30:.1f} GiB. k-reciprocal re-ranking is "
            "inherently O(n^2) (same envelope as the reference, Reranking.py:513) "
            "— restrict the gallery (e.g. re-rank only top candidates) or raise "
            "max_bytes explicitly if the device really has the memory."
        )
    final = kr_rerank_scores(
        l2n(jnp.asarray(qvecs)), l2n(jnp.asarray(vecs)), k1=k1, k2=k2,
        lambda_value=lambda_value,
    )
    return jnp.argsort(final, axis=1)

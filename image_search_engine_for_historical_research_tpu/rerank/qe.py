"""Query-expansion re-ranking: alphaQE/QGE feature enhancement, AQE, DBA.

TPU-native counterparts of the global-feature re-rankers in
``/root/reference/src/utils/Reranking.py``: ``feature_enhancement`` inside QGE
(:195-208), its serving variant ``qge1`` (:287-306), classic average query
expansion (:314-365) and database augmentation (:375-432). All are pure jitted
array programs over row-major descriptors.

Row-major conventions: ``qvecs (Q, D)``, ``vecs (N, D)``, ``ranks (Q, >=k)``
(the reference uses column-major ``ranks`` and D x N matrices).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.normalization import l2n
from ..ops.topk import exact_scores


@partial(jax.jit, static_argnames=("k", "iterations"))
def feature_enhancement(
    qvecs: jnp.ndarray,
    vecs: jnp.ndarray,
    ranks: jnp.ndarray,
    k: int = 10,
    w: float = 4.0,
    iterations: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """alphaQE-style iterative enhancement (Reranking.py:195-208).

    Each iteration: q' = l2n(sum_{r<k} ((k-r)/k)^w * vecs[ranks[r]]) (the
    original query participates only through its ranks, matching the
    "query in database" branch the reference uses), then re-rank by q' . vecs.
    Reference regimes: k=10/iters=3 below 120k images, k=3/iters=1 above
    (:212-219, :273-280). Returns (enhanced queries, full new ranks (Q, N)).
    """
    weights = ((jnp.arange(k, 0, -1) / k) ** w)[None, :, None]  # (1, k, 1)
    q = qvecs
    r = ranks
    for _ in range(iterations):
        top = vecs[r[:, :k]]                        # (Q, k, D)
        q = l2n(jnp.sum(top * weights, axis=1))     # (Q, D)
        scores = exact_scores(q, vecs)              # (Q, N)
        r = jnp.argsort(-scores, axis=1)
    return q, r


def qge1(ranks, qvecs, vecs, k: int = 3, w: float = 4.0, out_k: int = None):
    """Single-iteration serving-path enhancement (Reranking.py:287-306).

    ``out_k`` returns only the top-``out_k`` re-ranked ids via ``lax.top_k``
    instead of a full argsort — the serving path never needs the complete
    permutation, and a 1M-row argsort per request is measurable latency."""
    if out_k is None:
        _, r = feature_enhancement(qvecs, vecs, ranks, k=k, w=w, iterations=1)
        return r
    return _qge1_topk(ranks, qvecs, vecs, k, w, out_k)


@partial(jax.jit, static_argnames=("k", "out_k"))
def _qge1_topk(ranks, qvecs, vecs, k, w, out_k):
    weights = ((jnp.arange(k, 0, -1) / k) ** w)[None, :, None]
    top = vecs[ranks[:, :k]]
    q = l2n(jnp.sum(top * weights, axis=1))
    scores = exact_scores(q, vecs)
    return jax.lax.top_k(scores, out_k)[1]


def _centered_normalized(a: jnp.ndarray, b: jnp.ndarray):
    """Shared centering + row L2 norm (Reranking.py:326-332)."""
    center = jnp.concatenate([a, b], axis=0).mean(axis=0)
    return l2n(a - center, eps=0.0), l2n(b - center, eps=0.0)


@partial(jax.jit, static_argnames=("top_k",))
def average_query_expansion(
    qvecs: jnp.ndarray, vecs: jnp.ndarray, top_k: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Classic AQE (Reranking.py:314-365).

    Queries and gallery are centered+normalized, each query/gallery vector is
    concatenated with the mean of its top-k references (gallery skips itself),
    and matching runs on the doubled-dimension vectors. Returns the augmented
    (qvecs', vecs') (the caller searches with the flat index).
    """
    qc, vc = _centered_normalized(qvecs, vecs)
    sims_q = qc @ vc.T                       # distance 2-2*sim: same ordering
    top_q = jax.lax.top_k(sims_q, top_k)[1]  # (Q, top_k)
    q_aug = jnp.concatenate([qc, vc[top_q].mean(axis=1)], axis=1)

    sims_g = vc @ vc.T
    top_g = jax.lax.top_k(sims_g, top_k + 1)[1][:, 1:]  # skip self
    v_aug = jnp.concatenate([vc, vc[top_g].mean(axis=1)], axis=1)
    return q_aug, v_aug


@partial(jax.jit, static_argnames=("top_k",))
def database_augmentation(
    qvecs: jnp.ndarray, vecs: jnp.ndarray, top_k: int = 3
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted DBA (Reranking.py:375-432).

    logspace(1 .. 10^-2) weights over [self, top-k neighbours]; both sides are
    replaced by the weighted sums. Returns (qvecs', vecs').
    """
    weights = jnp.logspace(0, -2.0, top_k + 1)
    qc, vc = _centered_normalized(qvecs, vecs)

    top_q = jax.lax.top_k(qc @ vc.T, top_k)[1]            # (Q, k)
    stack_q = jnp.concatenate([qc[:, None, :], vc[top_q]], axis=1)  # (Q, k+1, D)
    q_new = jnp.tensordot(weights, stack_q, axes=(0, 1))

    top_g = jax.lax.top_k(vc @ vc.T, top_k + 1)[1]        # (N, k+1) incl self
    v_new = jnp.tensordot(weights, vc[top_g], axes=(0, 1))
    return q_new, v_new

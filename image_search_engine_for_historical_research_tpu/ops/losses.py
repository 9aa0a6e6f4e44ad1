"""Metric-learning losses over retrieval tuples.

TPU-native counterparts of the reference losses
(``/root/reference/src/layers/functional.py:140-186`` and
``/root/reference/src/layers/loss.py``): contrastive, triplet, and second-order
similarity (SOS).

Tuple encoding (same contract as the reference): a batch of ``nq`` tuples, each of
``S`` images laid out contiguously as ``[query, positive, neg_1..neg_{S-2}]``.
Descriptors are row-major ``x: (nq * S, D)`` (the reference uses the transposed
``D x N``), labels are ``(nq * S,)`` with ``-1`` = query, ``1`` = positive, ``0`` =
negative. Because the layout is static, the losses reshape to ``(nq, S, D)`` and
never do data-dependent indexing — fully jit/grad friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def _split_tuples(x: jnp.ndarray, label: jnp.ndarray, S=None):
    """Reshape flat tuple batch to (nq, S, D) plus per-image labels (nq, S).

    ``S`` (images per tuple) is derived from concrete labels when omitted; pass it
    explicitly when ``label`` is a traced value inside ``jit``.
    """
    if S is None:
        nq = int((label == -1).sum())  # needs concrete labels
        S = x.shape[0] // nq
    nq = x.shape[0] // S
    return x.reshape(nq, S, x.shape[-1]), label.reshape(nq, S), nq, S


def contrastive_loss(
    x: jnp.ndarray, label: jnp.ndarray, margin: float = 0.7, eps: float = EPS, S=None
) -> jnp.ndarray:
    """Contrastive loss over (query, other) pairs (functional.py:140-156).

    For each non-query image ``o`` with label ``y`` in a tuple with query ``q``:
    ``0.5*y*d^2 + 0.5*(1-y)*max(margin-d, 0)^2`` where ``d = ||q - o + eps||``;
    summed over all pairs (reference sums, does not average).
    """
    xt, lt, nq, S = _split_tuples(x, label, S)
    q = xt[:, :1, :]                     # (nq, 1, D)
    others = xt[:, 1:, :]                # (nq, S-1, D)
    lbl = lt[:, 1:].astype(x.dtype)      # (nq, S-1)

    dif = q - others
    d = jnp.sqrt(jnp.sum((dif + eps) ** 2, axis=-1))  # (nq, S-1)
    y = 0.5 * lbl * d**2 + 0.5 * (1.0 - lbl) * jnp.clip(margin - d, min=0.0) ** 2
    return jnp.sum(y)


def triplet_loss(
    x: jnp.ndarray, label: jnp.ndarray, margin: float = 0.1, S=None
) -> jnp.ndarray:
    """Triplet loss (functional.py:158-171).

    Anchors/positives are broadcast against each of the ``S-2`` negatives;
    ``sum(max(d(a,p)^2 - d(a,n)^2 + margin, 0)) / nq``.
    """
    xt, lt, nq, S = _split_tuples(x, label, S)
    xa = xt[:, :1, :]       # query/anchor
    xp = xt[:, 1:2, :]      # positive
    xn = xt[:, 2:, :]       # negatives (nq, S-2, D)

    dist_pos = jnp.sum((xa - xp) ** 2, axis=-1)  # (nq, 1)
    dist_neg = jnp.sum((xa - xn) ** 2, axis=-1)  # (nq, S-2)
    return jnp.sum(jnp.clip(dist_pos - dist_neg + margin, min=0.0)) / nq


def sos_loss(x: jnp.ndarray, label: jnp.ndarray, S=None) -> jnp.ndarray:
    """Second-order-similarity loss (functional.py:173-186, SOLAR paper).

    ``sqrt(sum_n (d(a,n)^2 - d(p,n)^2)^2) / nq`` over all negatives of all tuples.
    """
    xt, lt, nq, S = _split_tuples(x, label, S)
    xa = xt[:, :1, :]
    xp = xt[:, 1:2, :]
    xn = xt[:, 2:, :]

    dist_an = jnp.sum((xa - xn) ** 2, axis=-1)
    dist_pn = jnp.sum((xp - xn) ** 2, axis=-1)
    return jnp.sqrt(jnp.sum((dist_an - dist_pn) ** 2)) / nq

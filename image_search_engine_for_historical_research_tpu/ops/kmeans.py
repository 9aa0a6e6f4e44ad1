"""Batched Lloyd k-means on TPU.

The workhorse behind product quantization and IVF coarse quantizers — the
TPU-native replacement for nanopq's per-subspace scipy k-means
(``/root/reference/src/utils/nnsearch.py:880-885``: M=16 books, 20 iterations,
seed 42) and the sklearn KMeans in ``matching_PQ_Net_bucket``
(nnsearch.py:967). Assignment is one MXU matmul per iteration; centroid update
is a segment-sum; ``lax.scan`` carries the centroids so the whole fit is a single
compiled program. ``vmap`` over leading axes fits all PQ subspaces at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _assign(x, centers):
    """Nearest-center ids by ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2."""
    dots = jax.lax.dot_general(
        x, centers, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    c2 = jnp.sum(centers.astype(jnp.float32) ** 2, axis=1)
    return jnp.argmin(c2[None, :] - 2.0 * dots, axis=1)


def _kmeanspp_init(x: jnp.ndarray, k: int, key) -> jnp.ndarray:
    """k-means++ initialization: D^2-weighted greedy center sampling.

    A lax.scan of k steps, each one matvec batch against the newest center —
    avoids the empty/merged-cluster local optima of random point init (nanopq
    inherits those from scipy; we don't have to)."""
    N, d = x.shape
    x32 = x.astype(jnp.float32)
    key, sub = jax.random.split(key)
    first = x32[jax.random.randint(sub, (), 0, N)]
    min_d2 = jnp.sum((x32 - first[None, :]) ** 2, axis=1)

    def step(carry, subkey):
        min_d2, _ = carry
        logits = jnp.log(jnp.clip(min_d2, min=1e-30))
        idx = jax.random.categorical(subkey, logits)
        center = x32[idx]
        new_d2 = jnp.sum((x32 - center[None, :]) ** 2, axis=1)
        return (jnp.minimum(min_d2, new_d2), center), center

    keys = jax.random.split(key, k - 1)
    (_, _), rest = jax.lax.scan(step, (min_d2, first), keys)
    return jnp.concatenate([first[None, :], rest], axis=0)


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(x: jnp.ndarray, k: int, iters: int = 20, key=None):
    """Lloyd k-means: returns ``(centers (k, d), assignments (N,))``.

    k-means++ init (seeded, deterministic like nanopq's seed=42 contract).
    Empty clusters keep their previous center.
    """
    N, d = x.shape
    key = key if key is not None else jax.random.PRNGKey(42)
    init_centers = _kmeanspp_init(x, k, key)

    def step(centers, _):
        assign = _assign(x, centers)
        sums = jax.ops.segment_sum(x.astype(jnp.float32), assign, num_segments=k)
        counts = jax.ops.segment_sum(
            jnp.ones((N,), jnp.float32), assign, num_segments=k
        )
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.clip(counts[:, None], min=1.0), centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(step, init_centers, None, length=iters)
    return centers, _assign(x, centers)


def kmeans_fit_batched(x: jnp.ndarray, k: int, iters: int = 20, key=None):
    """vmapped fit over a leading axis: ``x (M, N, d) -> (M, k, d), (M, N)``.

    Fits all M PQ subspaces in one compiled program (the reference loops
    sub-codebooks on the host inside nanopq).
    """
    M = x.shape[0]
    key = key if key is not None else jax.random.PRNGKey(42)
    keys = jax.random.split(key, M)
    return jax.vmap(lambda xi, ki: kmeans_fit(xi, k, iters, ki))(x, keys)

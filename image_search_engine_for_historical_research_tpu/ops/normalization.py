"""Descriptor normalization ops.

TPU-native counterparts of the reference's normalization functions
(``/root/reference/src/layers/functional.py:129-134`` and
``/root/reference/src/layers/normalization.py``). All functions are pure, operate on
the **last** axis (row-major ``(N, D)`` descriptors / NHWC channel axis) and are safe
under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def l2n(x: jnp.ndarray, eps: float = EPS, axis: int = -1) -> jnp.ndarray:
    """L2-normalize along ``axis``: ``x / (||x|| + eps)``.

    Matches the reference ``l2n`` (functional.py:129-130) which normalizes torch
    dim=1 of an NCHW/(D,N) tensor; here the feature axis is last by convention.
    """
    norm = jnp.linalg.norm(x, ord=2, axis=axis, keepdims=True)
    return x / (norm + eps)


def powerlaw(x: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Signed square-root power-law normalization.

    Reference ``powerlaw`` (functional.py:132-134) — note the reference body is
    buggy (refers to ``self.eps`` in a free function); the intended semantics,
    used by its ``PowerLaw`` module, are ``sign(x) * sqrt(|x + eps|)``.
    """
    x = x + eps
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))

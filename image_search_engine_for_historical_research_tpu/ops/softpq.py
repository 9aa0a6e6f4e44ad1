"""Soft product quantization: differentiable codebooks for deep-PQ training.

Counterpart of the reference's ``Soft_PQ`` module
(``/root/reference/src/layers/quantization.py``) and its consumers
``matching_PQ_Net`` / ``matching_PQ_Net_bucket``
(``src/utils/nnsearch.py:905-998``). The reference module is actually broken —
it imports ``Soft_Quantization`` from ``layers/functional.py`` which never
defines it (SURVEY.md section 2 fidelity notes) — so this implements the
intended semantics (SPQ-style soft quantization): per-subspace softmax
assignment over learnable codewords with a temperature, giving a differentiable
quantizer whose hard path matches ``ops.pq``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SoftPQState(NamedTuple):
    codewords: jnp.ndarray  # (M, Ks, ds) learnable


def init_softpq(dim: int, M: int = 16, Ks: int = 256, key=None) -> SoftPQState:
    key = key if key is not None else jax.random.PRNGKey(0)
    ds = dim // M
    return SoftPQState(
        codewords=jax.random.normal(key, (M, Ks, ds), jnp.float32) * (ds ** -0.5)
    )


@partial(jax.jit, static_argnames=())
def soft_quantize(state: SoftPQState, x: jnp.ndarray, tau: float = 5.0):
    """Differentiable quantization.

    Returns (quantized (N, D), soft assignment (N, M, Ks), hard codes (N, M)).
    ``tau`` is the softmax inverse temperature: higher = harder assignment.
    """
    N, D = x.shape
    M, Ks, ds = state.codewords.shape
    xs = x.reshape(N, M, ds)
    dots = jnp.einsum(
        "nmd,mkd->nmk", xs, state.codewords, preferred_element_type=jnp.float32
    )
    c2 = jnp.sum(state.codewords**2, axis=2)
    x2 = jnp.sum(xs**2, axis=2)
    d2 = x2[:, :, None] - 2.0 * dots + c2[None, :, :]  # (N, M, Ks)
    soft = jax.nn.softmax(-tau * d2, axis=-1)
    q = jnp.einsum("nmk,mkd->nmd", soft, state.codewords).reshape(N, D)
    hard = jnp.argmin(d2, axis=-1)
    return q, soft, hard


def softpq_loss(
    state: SoftPQState, x: jnp.ndarray, tau: float = 5.0
) -> jnp.ndarray:
    """Quantization distortion + codeword-usage entropy regularizer."""
    q, soft, _ = soft_quantize(state, x, tau)
    distortion = jnp.mean(jnp.sum((x - q) ** 2, axis=1))
    usage = jnp.mean(soft, axis=0)                       # (M, Ks)
    entropy = -jnp.sum(usage * jnp.log(usage + 1e-12), axis=-1).mean()
    return distortion - 1e-3 * entropy


def codewords_flat(state: SoftPQState) -> jnp.ndarray:
    """(Ks, M * ds) layout used by the reference's matchers
    (nnsearch.py:842-843: transpose + reshape of nanopq codewords)."""
    M, Ks, ds = state.codewords.shape
    return jnp.transpose(state.codewords, (1, 0, 2)).reshape(Ks, M * ds)


def codewords_from_flat(flat: jnp.ndarray, M: int) -> jnp.ndarray:
    """Inverse of ``codewords_flat``: (Ks, M*ds) -> (M, Ks, ds)."""
    Ks, D = flat.shape
    return jnp.transpose(flat.reshape(Ks, M, D // M), (1, 0, 2))

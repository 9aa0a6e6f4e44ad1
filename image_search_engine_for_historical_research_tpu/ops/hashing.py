"""Binary hashing ops: random-hyperplane LSH and Hamming top-k.

TPU-native counterparts of the reference's hashing matchers:
``matching_LSH_faiss`` (``/root/reference/src/utils/nnsearch.py:734-745``,
faiss IndexLSH) and ``matching_Greedyhash`` (:1001-1013, xor + popcount loop).
Codes are bit-packed into int32 lanes; Hamming distance is xor + popcount over
the packed words, streamed like the exact scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def lsh_hyperplanes(dim: int, n_bits: int, seed: int = 42) -> jnp.ndarray:
    """Random projection matrix (n_bits, dim)."""
    return jax.random.normal(jax.random.PRNGKey(seed), (n_bits, dim), jnp.float32)


@jax.jit
def lsh_encode(planes: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Sign-bit codes packed into int32 words: (N, ceil(n_bits/32)) uint32."""
    bits = (vecs @ planes.T) > 0  # (N, n_bits)
    return pack_bits(bits)


@jax.jit
def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(N, B) bool -> (N, ceil(B/32)) uint32, little-endian within words."""
    N, B = bits.shape
    pad = (-B) % 32
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((N, pad), bool)], axis=1)
    words = bits.reshape(N, -1, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1)


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    """Bit population count for uint32 (SWAR)."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


@partial(jax.jit, static_argnames=("k",))
def hamming_topk(db_codes: jnp.ndarray, q_codes: jnp.ndarray, k: int):
    """Top-k by ascending Hamming distance over packed codes.

    ``db_codes (N, W) uint32``, ``q_codes (Q, W) uint32``. Returns
    (scores = -distance, idx) like every other searcher.
    """
    N = db_codes.shape[0]
    k = min(k, N)

    def per_query(q):
        x = jnp.bitwise_xor(db_codes, q[None, :])
        d = jnp.sum(_popcount(x), axis=1).astype(jnp.int32)
        top = jax.lax.top_k(-d, k)
        return top[0].astype(jnp.float32), top[1]

    return jax.vmap(per_query)(q_codes)


@partial(jax.jit, static_argnames=("k",))
def fractional_topk(db: jnp.ndarray, queries: jnp.ndarray, k: int, p: float = 0.5):
    """Fractional-distance matcher (nnsearch.py:46-56, 709-731):
    ``d(x, y) = (sum |x-y|^p)^(1/p)``. O(Q*N*D) elementwise — kept for parity."""
    N = db.shape[0]
    k = min(k, N)

    def per_query(q):
        d = jnp.sum(jnp.abs(db - q[None, :]) ** p, axis=1) ** (1.0 / p)
        top = jax.lax.top_k(-d, k)
        return top[0], top[1]

    return jax.vmap(per_query)(queries)

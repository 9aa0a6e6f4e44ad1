"""Synthetic descriptor databases with *meaningful* neighborhoods.

Isotropic cluster noise in 2048-d is a trap: at spread s the noise norm is
s * sqrt(D) (~11 at s=0.25), so after normalization within-cluster cosine is
~1/(1 + s^2 D) ~ 0.008 — the data is effectively uniform on the sphere and
every ANN method's recall collapses to "found the query's own row".

Real CNN descriptors live near a low-dimensional manifold, so generate in a
rank-``d_eff`` subspace embedded in D dims: z = c_k + s * g (g in R^d_eff),
x = z @ U. At d_eff=64, s=0.1: within-cluster cosine ~ 0.86 with graded
member-to-member variation, cross-cluster ~ +-1/8 — exact top-k is
well-defined and approximate methods can be judged fairly.
"""

from __future__ import annotations


def clustered_db(key, n, d, n_centers=8192, d_eff=64, spread=0.1,
                 chunk=131072, dtype=None):
    """(n, d) unit-norm low-rank clustered db; single final allocation.

    ``dtype=bfloat16`` halves the footprint for graph-build workloads where
    the index stores bf16 anyway (an f32 1M x 2048 db plus the builder's bf16
    working copy is 12 GB before any transients)."""
    import jax
    import jax.numpy as jnp

    kc, ku, kx = jax.random.split(key, 3)
    centers_z = jax.random.normal(kc, (n_centers, d_eff), jnp.float32)
    centers_z = centers_z / jnp.linalg.norm(centers_z, axis=1, keepdims=True)
    u = jax.random.normal(ku, (d_eff, d), jnp.float32) / (d ** 0.5)

    nchunks = (n + chunk - 1) // chunk
    if n % nchunks == 0:
        chunk = n // nchunks  # exact: a trailing [:n] slice would copy 8 GB

    @jax.jit
    def gen(keys):
        def one(k2):
            ka, kn = jax.random.split(k2)
            a = jax.random.randint(ka, (chunk,), 0, n_centers)
            z = centers_z[a] + spread * jax.random.normal(
                kn, (chunk, d_eff), jnp.float32
            )
            x = z @ u
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
            return x if dtype is None else x.astype(dtype)

        return jax.lax.map(one, keys).reshape(nchunks * chunk, d)

    out = gen(jax.random.split(kx, nchunks))
    return out if out.shape[0] == n else out[:n]


def clustered_db_chunks(key, n, d, chunk=125000, n_centers=8192, d_eff=64,
                        spread=0.1):
    """Callable chunk source for the same distribution as ``clustered_db``,
    regenerated on device chunk-by-chunk — the beyond-HBM/beyond-host-RAM
    harness input (10M x 2048 f32 = 80 GB never exists anywhere; each call
    of the returned function replays the identical deterministic stream).

    Returns ``(chunks_fn, n)`` suitable for
    ``build_ivfpq(chunks_fn, n=n, ...)`` and for streaming exact
    ground-truth scans. ``n`` is rounded down to a multiple of ``chunk`` so
    every chunk compiles one program shape.
    """
    import jax
    import jax.numpy as jnp

    # shrink the chunk rather than round n UP: a debug-sized --n 1000 must
    # not silently become one full 125k chunk on the shared chip
    chunk = min(chunk, n)
    nchunks = max(1, n // chunk)
    n = nchunks * chunk

    kc, ku, kx = jax.random.split(key, 3)
    centers_z = jax.random.normal(kc, (n_centers, d_eff), jnp.float32)
    centers_z = centers_z / jnp.linalg.norm(centers_z, axis=1, keepdims=True)
    u = jax.random.normal(ku, (d_eff, d), jnp.float32) / (d ** 0.5)
    chunk_keys = jax.random.split(kx, nchunks)

    @jax.jit
    def gen_one(k2):
        ka, kn = jax.random.split(k2)
        a = jax.random.randint(ka, (chunk,), 0, n_centers)
        z = centers_z[a] + spread * jax.random.normal(
            kn, (chunk, d_eff), jnp.float32
        )
        x = z @ u
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    def chunks_fn():
        for i in range(nchunks):
            yield gen_one(chunk_keys[i])

    return chunks_fn, n

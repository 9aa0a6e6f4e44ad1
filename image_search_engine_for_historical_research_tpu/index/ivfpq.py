"""IVF-PQ index: coarse quantizer + per-list residual PQ codes.

Replaces the FAISS ``IndexIVFPQ`` used for large databases
(``/root/reference/src/utils/knn.py:43-54``: nlist=316, M books, nbits=8,
nprobe=64, trained on an N/5 sample; auto-selected at N >= 110k,
``diffusion.py:47``). FAISS semantics kept: codes are PQ codes of the *residual*
``x - coarse_center(x)``; queries probe the ``nprobe`` nearest lists.

TPU layout: inverted lists are sorted, padded to a common power-of-two length and
stored as dense ``(nlist, Lmax, M)`` uint8 codes + ``(nlist, Lmax)`` ids + valid
mask, so a query batch is: one small matmul for coarse scores, a static gather of
probed lists, LUT gather-accumulate, masked top-k — no host round-trips, no
dynamic shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans_fit
from ..ops.pq import PQCodebook, pq_encode, pq_train
from .base import normalize_rows, register


@partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivfpq_search(
    coarse_centers,  # (nlist, D)
    codewords,       # (M, Ks, ds)
    list_codes,      # (nlist, Lmax, M) int
    list_ids,        # (nlist, Lmax) int32, -1 padding
    queries,         # (Q, D)
    k: int,
    nprobe: int,
):
    Q, D = queries.shape
    nlist, Lmax, M = list_codes.shape
    Ks, ds = codewords.shape[1], codewords.shape[2]

    # coarse scores: nearest lists by L2
    dots = queries @ coarse_centers.T
    c2 = jnp.sum(coarse_centers**2, axis=1)
    coarse_d = c2[None, :] - 2.0 * dots  # (Q, nlist), missing ||q||^2 const
    _, probe = jax.lax.top_k(-coarse_d, nprobe)  # (Q, nprobe)

    cw2 = jnp.sum(codewords.astype(jnp.float32) ** 2, axis=2)       # (M, Ks)

    def per_query(inp):
        q, probe_q = inp
        # residual LUT per probed list: (nprobe, M, Ks)
        centers_q = coarse_centers[probe_q]            # (nprobe, D)
        resid = (q[None, :] - centers_q).reshape(nprobe, M, ds)
        dots = jnp.einsum(
            "pmd,mkd->pmk", resid, codewords, preferred_element_type=jnp.float32
        )
        r2 = jnp.sum(resid.astype(jnp.float32) ** 2, axis=2)        # (nprobe, M)
        lut = r2[:, :, None] - 2.0 * dots + cw2[None, :, :]         # (nprobe, M, Ks)

        codes_q = list_codes[probe_q]                               # (nprobe, Lmax, M) u8
        ids_q = list_ids[probe_q]                                   # (nprobe, Lmax)

        def add_m(m, acc):
            # lut[:, m, :]: (nprobe, Ks); codes of subspace m: (nprobe, Lmax)
            cm = jax.lax.dynamic_index_in_dim(codes_q, m, axis=2, keepdims=False)
            return acc + jnp.take_along_axis(
                jax.lax.dynamic_index_in_dim(lut, m, axis=1, keepdims=False),
                cm.astype(jnp.int32), axis=1,
            )

        d = jax.lax.fori_loop(0, M, add_m, jnp.zeros((nprobe, Lmax), jnp.float32))
        s = jnp.where(ids_q >= 0, -d, -jnp.inf).reshape(-1)
        top_s, sel = jax.lax.top_k(s, k)
        return top_s, ids_q.reshape(-1)[sel]

    # sequential over queries: the per-query probed-codes gather is
    # nprobe * Lmax * M bytes (tens of MB); vmapping it over the whole batch
    # would materialize gigabytes (OOM'd on hardware at 1M scale)
    return jax.lax.map(per_query, (queries, probe))


@register("ivfpq")
@dataclass
class IVFPQIndex:
    coarse_centers: jnp.ndarray   # (nlist, D)
    codewords: jnp.ndarray        # (M, Ks, ds)
    list_codes: jnp.ndarray       # (nlist, Lmax, M)
    list_ids: jnp.ndarray         # (nlist, Lmax), -1 = padding
    nprobe: int = 64
    normalized: bool = True

    @property
    def n(self) -> int:
        return int((np.asarray(self.list_ids) >= 0).sum())

    def search(self, queries, k: int, nprobe: int = None) -> Tuple:
        q = jnp.asarray(queries)
        if self.normalized:
            q = normalize_rows(q)
        return _ivfpq_search(
            self.coarse_centers, self.codewords, self.list_codes, self.list_ids,
            q, k, nprobe or self.nprobe,
        )

    def to_arrays(self):
        return (
            {"nprobe": self.nprobe, "normalized": self.normalized},
            {
                "coarse_centers": np.asarray(self.coarse_centers, np.float32),
                "codewords": np.asarray(self.codewords, np.float32),
                "list_codes": np.asarray(self.list_codes),
                "list_ids": np.asarray(self.list_ids, np.int32),
            },
        )

    @classmethod
    def from_arrays(cls, meta, arrays):
        return cls(
            coarse_centers=jnp.asarray(arrays["coarse_centers"]),
            codewords=jnp.asarray(arrays["codewords"]),
            list_codes=jnp.asarray(arrays["list_codes"]),
            list_ids=jnp.asarray(arrays["list_ids"]),
            nprobe=int(meta["nprobe"]),
            normalized=bool(meta.get("normalized", True)),
        )


def build_ivfpq(
    vecs,
    nlist: int = 316,
    M: int = 16,
    Ks: int = 256,
    nprobe: int = 64,
    iters: int = 20,
    seed: int = 42,
    train_fraction: float = 0.2,
    normalize: bool = True,
) -> IVFPQIndex:
    """Train coarse + residual-PQ quantizers and pack padded inverted lists.

    Reference ANN defaults (knn.py:44-53): nlist=316, nprobe=64, trained on a
    random N/5 sample.
    """
    v = jnp.asarray(vecs, jnp.float32)
    if normalize:
        v = normalize_rows(v)
    N, D = v.shape

    key = jax.random.PRNGKey(seed)
    n_train = max(min(N, 64), int(N * train_fraction))
    sample_idx = jax.random.choice(key, N, shape=(n_train,), replace=False)
    sample = v[sample_idx]

    nlist = min(nlist, N)
    coarse_centers, _ = kmeans_fit(sample, nlist, iters, key)

    # train the residual PQ on the sample only (faiss semantics)
    c2 = jnp.sum(coarse_centers**2, axis=1)
    s_assign = jnp.argmin(c2[None, :] - 2.0 * (sample @ coarse_centers.T), axis=1)
    cb = pq_train(sample - coarse_centers[s_assign], M=M, Ks=Ks, iters=iters, seed=seed)

    # assign + residual-encode the full database in row chunks: a full
    # (N, D) residual copy alone is 8 GB at 1M x 2048 (OOM next to the db)
    chunk_rows = 131072
    assign_h = np.empty((N,), np.int64)
    codes_h = np.empty((N, M), np.uint8 if Ks <= 256 else np.int32)
    for s in range(0, N, chunk_rows):
        part = v[s : s + chunk_rows]
        a = jnp.argmin(c2[None, :] - 2.0 * (part @ coarse_centers.T), axis=1)
        r = part - coarse_centers[a]
        assign_h[s : s + part.shape[0]] = np.asarray(a)
        codes_h[s : s + part.shape[0]] = np.asarray(pq_encode(cb, r))
    counts = np.bincount(assign_h, minlength=nlist)
    Lmax = max(int(counts.max()), 1)
    Lmax = 1 << (Lmax - 1).bit_length()  # pad to power of two for stable shapes
    list_codes = np.zeros((nlist, Lmax, M), codes_h.dtype)
    list_ids = np.full((nlist, Lmax), -1, np.int32)
    order = np.argsort(assign_h, kind="stable")
    offsets = np.zeros(nlist, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    for l in range(nlist):
        members = order[offsets[l] : offsets[l] + counts[l]]
        list_codes[l, : counts[l]] = codes_h[members]
        list_ids[l, : counts[l]] = members

    return IVFPQIndex(
        coarse_centers=coarse_centers,
        codewords=cb.codewords,
        list_codes=jnp.asarray(list_codes),
        list_ids=jnp.asarray(list_ids),
        nprobe=min(nprobe, nlist),
        normalized=normalize,
    )

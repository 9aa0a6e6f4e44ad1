"""Product quantization: codebook training, encoding, asymmetric-distance scan.

TPU-native replacement for the nanopq path of the reference
(``/root/reference/src/utils/nnsearch.py:828-901``): train M sub-codebooks with
k-means (20 iters, seeded), encode the database to (N, M) codes, and at query
time build a (M, Ks) distance LUT per query and accumulate code distances — the
``pq.dtable(query).adist(codes)`` contract, but batched over queries and streamed
in chunks with a running top-k instead of a per-query python loop + argsort.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans import kmeans_fit, kmeans_fit_batched, kmeans_fit_sharded


class PQCodebook(NamedTuple):
    """Codewords ``(M, Ks, ds)`` for M subspaces of width ds = D // M.

    ``rotation`` (optional, (D, D) orthogonal) makes this an OPQ codebook
    (Ge et al., "Optimized Product Quantization", CVPR'13 — beyond the
    reference, whose nanopq is plain PQ): vectors are rotated before
    sub-quantization so per-subspace variance is balanced. Distances are
    preserved (orthogonality), so encode/decode/dist-table apply/undo it
    transparently and every consumer works unchanged."""

    codewords: jnp.ndarray
    rotation: jnp.ndarray | None = None

    @property
    def M(self):
        return self.codewords.shape[0]

    @property
    def Ks(self):
        return self.codewords.shape[1]

    @property
    def ds(self):
        return self.codewords.shape[2]


LARGE_KS = 2048  # above this, default to bf16 assignment matmuls + subsampled fit


def train_indices(n_rows: int, n_sample: int, seed: int) -> np.ndarray:
    """The canonical fit-row sampling rule: sorted no-replacement choice.

    ONE source of truth shared by ``pq_train``/``opq_train`` and the
    streaming builders (``index/pq.py``, ``index/hnsw.py``): the
    streamed-vs-in-memory bit-identity guarantee (tests, BASELINE.md) rests
    on every site drawing the same indices for the same
    ``(n_rows, n_sample, seed)``."""
    return np.sort(
        np.random.RandomState(seed).choice(n_rows, n_sample, replace=False)
    )


def pq_train(
    vecs: jnp.ndarray,
    M: int = 16,
    Ks: int = 256,
    iters: int = 20,
    seed: int = 42,
    train_sample: int | None = None,
    matmul_dtype=None,
    mesh=None,
) -> PQCodebook:
    """Fit the M sub-codebooks (nnsearch.py:880-885 semantics).

    Subspaces are fit sequentially over column slices (one XLA compilation,
    O(N * ds) extra memory) rather than as one (M, N, ds) transposed copy —
    at 1M x 2048 f32 that copy alone is 8 GB.

    Large codebooks (the reference driver's operating point is Ks=2^13,
    offline.py:116) make full-data f32 Lloyd iterations the build bottleneck
    (each iteration is an N x Ks x ds matmul per subspace — ~34 TFLOP at
    1M x 2048, x20 iters). Above ``LARGE_KS`` the fit therefore defaults to
    (a) bf16 assignment matmuls (argmin ranking is robust to input rounding;
    centroid accumulation stays f32) and (b) a 32*Ks-row training subsample
    (faiss-style points-per-centroid budget). Both are overridable; the full
    database is always encoded exactly afterwards.
    """
    N, D = vecs.shape
    if D % M:
        raise ValueError(f"dim {D} not divisible by M={M}")
    ds = D // M
    init = "kmeans++"
    if matmul_dtype is None and Ks > LARGE_KS:
        matmul_dtype = jnp.bfloat16
    if Ks > LARGE_KS:
        if train_sample is None:
            train_sample = max(65536, 32 * Ks)
        init = "points"  # k-means++ is a sequential k-step scan: minutes at 2^13
    fit_vecs = vecs
    if train_sample is not None and train_sample < N:
        fit_vecs = vecs[jnp.asarray(train_indices(N, train_sample, seed))]
    keys = jax.random.split(jax.random.PRNGKey(seed), M)
    centers = []
    for m in range(M):
        sub = jax.lax.dynamic_slice_in_dim(fit_vecs, m * ds, ds, axis=1)
        if mesh is not None and fit_vecs.shape[0] % mesh.devices.size == 0:
            # mesh-sharded Lloyd (VERDICT r2 #2): rows sharded, one psum of
            # centroid sums/counts per iteration over ICI
            c, _ = kmeans_fit_sharded(
                sub, Ks, mesh, iters, keys[m], matmul_dtype=matmul_dtype,
                init=init,
            )
        else:
            c, _ = kmeans_fit(
                sub, Ks, iters, keys[m], matmul_dtype=matmul_dtype, init=init
            )
        centers.append(c)
    return PQCodebook(codewords=jnp.stack(centers))


def opq_train(
    vecs: jnp.ndarray,
    M: int = 16,
    Ks: int = 256,
    iters: int = 20,
    opq_iters: int = 10,
    seed: int = 42,
    train_sample: int | None = None,
    mesh=None,
) -> PQCodebook:
    """OPQ: alternate PQ fits with an orthogonal Procrustes rotation update
    (Ge et al., CVPR'13, the non-parametric solution). Beyond the reference
    (nanopq is plain PQ); improves every ADC consumer at the cost of one
    (D, D) rotation matmul per encode/query batch.

    Each round fits sub-codebooks on the rotated training rows, reconstructs
    them, and sets ``R = U V^T`` from the SVD of ``X^T X̂`` — the orthogonal
    transform minimizing ``||X R - X̂||_F``. Training runs on a row subsample
    (faiss-style points-per-centroid budget) with short inner Lloyd runs;
    the returned codebook carries the final full-``iters`` fit.
    """
    v = jnp.asarray(vecs, jnp.float32)
    N, D = v.shape
    if D % M:
        raise ValueError(f"dim {D} not divisible by M={M}")
    # rotation learning runs on a SMALLER sample than the codebook fit:
    # R has D^2 parameters — 8 points/centroid suffice — and each OPQ round
    # holds x, x@R and the reconstruction live; 32*Ks-row f32 copies at
    # Ks=2^13/D=2048 (2 GB each) next to a resident 1M gallery OOM'd the
    # 16 GB chip (measured)
    ts = train_sample if train_sample is not None else min(
        N, max(16384, 8 * Ks)
    )
    if mesh is not None:
        # sharded Lloyd needs row counts divisible by the mesh axis
        d = mesh.devices.size
        ts = max(d, (ts // d) * d)
    if ts < N:
        x = v[jnp.asarray(train_indices(N, ts, seed))]
    else:
        x = v
    R = jnp.eye(D, dtype=jnp.float32)
    inner = max(4, iters // 3)
    for _ in range(opq_iters):
        xr = x @ R
        cb = pq_train(xr, M=M, Ks=Ks, iters=inner, seed=seed, mesh=mesh)
        xhat = pq_decode(cb, pq_encode(cb, xr))         # rotated space
        del xr
        u, _, vt = jnp.linalg.svd(x.T @ xhat, full_matrices=False)
        del xhat
        R = u @ vt
    # final codebook on a reduced points-per-centroid budget (16/centroid:
    # half the plain-PQ default — the OPQ phase must leave headroom for the
    # caller's resident gallery + the downstream graph build on 16 GB; the
    # rotation already concentrated per-subspace variance so the fit
    # converges with fewer points), rotated chunk-by-chunk with each piece
    # freed deterministically
    fs = train_sample if train_sample is not None else min(
        N, max(16384, 16 * Ks)
    )
    if mesh is not None:
        d = mesh.devices.size
        fs = max(d, (fs // d) * d)
    if fs <= ts:
        xr = x @ R
        del x
    else:
        del x
        fidx = train_indices(N, fs, seed + 7)
        step = 65536
        parts = []
        for s in range(0, fs, step):
            chunk = v[jnp.asarray(fidx[s : s + step])] @ R
            chunk.block_until_ready()
            parts.append(chunk)
        xr = jnp.concatenate(parts, axis=0)
        del parts
    cb = pq_train(xr, M=M, Ks=Ks, iters=iters, seed=seed, mesh=mesh)
    return PQCodebook(codewords=cb.codewords, rotation=R)


@partial(jax.jit, static_argnames=("chunk", "matmul_dtype"))
def pq_encode(
    codebook: PQCodebook,
    vecs: jnp.ndarray,
    chunk: int = 131072,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Encode rows to (N, M) nearest-codeword ids (uint8/uint16 by Ks).

    Streams over row chunks: the (N, M, Ks) distance tensor is never
    materialized (16 GB at 1M x 16 x 256); the chunk auto-shrinks with
    M * Ks so the per-chunk block stays bounded at large codebooks
    (Ks=2^13: 2048-row chunks)."""
    N, D = vecs.shape
    M, Ks, ds = codebook.codewords.shape
    if matmul_dtype is None and Ks > LARGE_KS:
        matmul_dtype = jnp.bfloat16
    dtype = (
        jnp.uint8 if Ks <= 256 else jnp.uint16 if Ks <= 65536 else jnp.int32
    )
    c2 = jnp.sum(codebook.codewords.astype(jnp.float32) ** 2, axis=2)  # (M, Ks)
    cw = codebook.codewords
    if matmul_dtype is not None:
        cw = cw.astype(matmul_dtype)

    chunk = min(chunk, max(128, (1 << 28) // (M * Ks)))
    chunk = min(chunk, ((N + 127) // 128) * 128)
    pad = (-N) % chunk
    v = jnp.concatenate([vecs, jnp.zeros((pad, D), vecs.dtype)], 0) if pad else vecs
    vc = v.reshape(-1, chunk, D)

    def one(xcb):
        if codebook.rotation is not None:
            xcb = jnp.einsum(
                "nd,de->ne", xcb.astype(jnp.float32), codebook.rotation,
                preferred_element_type=jnp.float32,
            )
        sub = xcb.reshape(chunk, M, ds)
        if matmul_dtype is not None:
            sub = sub.astype(matmul_dtype)
        dots = jnp.einsum(
            "nmd,mkd->nmk", sub, cw,
            preferred_element_type=jnp.float32,
        )
        return jnp.argmin(c2[None, :, :] - 2.0 * dots, axis=2).astype(dtype)

    codes = jax.lax.map(one, vc)  # (C, chunk, M)
    return codes.reshape(-1, M)[:N]


@jax.jit
def pq_decode(codebook: PQCodebook, codes: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct (N, D) vectors from codes (nanopq ``decode``).

    OPQ codebooks un-rotate, so output is always in the original space."""
    M, Ks, ds = codebook.codewords.shape
    out = jax.vmap(
        lambda c, ids: c[ids], in_axes=(0, 1), out_axes=1
    )(codebook.codewords, codes.astype(jnp.int32))        # (N, M, ds)
    out = out.reshape(codes.shape[0], M * ds)
    if codebook.rotation is not None:
        out = jnp.einsum(
            "nd,ed->ne", out, codebook.rotation,
            preferred_element_type=jnp.float32,
        )
    return out


@jax.jit
def pq_dist_table(codebook: PQCodebook, queries: jnp.ndarray) -> jnp.ndarray:
    """Per-query asymmetric LUT: (Q, M, Ks) squared distances to codewords.

    The reference builds this per query on the host (HNSW.construct_dist_table,
    nnsearch.py:101-111); here the whole batch is three einsums.
    """
    Q, D = queries.shape
    M, Ks, ds = codebook.codewords.shape
    if codebook.rotation is not None:
        queries = jnp.einsum(
            "qd,de->qe", queries.astype(jnp.float32), codebook.rotation,
            preferred_element_type=jnp.float32,
        )
    qs = queries.reshape(Q, M, ds)
    dots = jnp.einsum(
        "qmd,mkd->qmk", qs, codebook.codewords, preferred_element_type=jnp.float32
    )
    c2 = jnp.sum(codebook.codewords.astype(jnp.float32) ** 2, axis=2)  # (M, Ks)
    q2 = jnp.sum(qs.astype(jnp.float32) ** 2, axis=2)                  # (Q, M)
    return q2[:, :, None] - 2.0 * dots + c2[None, :, :]


@partial(jax.jit, static_argnames=("k",))
def pq_refine_rerank(
    cb: PQCodebook,
    coarse_codes: jnp.ndarray,   # (Nc, M) rows indexed by cand_code_rows
    rcb: PQCodebook,
    refine_codes: jnp.ndarray,   # (N, Mr) rows indexed by cand_ids
    q: jnp.ndarray,              # (Q, D)
    cand_code_rows: jnp.ndarray,  # (Q, E) rows into coarse_codes
    cand_ids: jnp.ndarray,        # (Q, E) image ids (into refine_codes)
    valid: jnp.ndarray,           # (Q, E) bool
    k: int,
):
    """Codes-only re-rank: reconstruct candidates as
    ``decode(coarse) + decode(residual)`` and order by exact distance to q.

    Two-level source-coding re-rank (Jegou et al., "Searching in one billion
    vectors: re-rank with source coding", ICASSP'11) — shared by the flat
    PQ-R route (faiss IndexPQR; coarse rows ARE image rows) and PQ_HNSW's
    ``*+refine`` methods (coarse rows are unique-code rows, nnsearch.py:
    669-680 re-sorts by ADC alone). All arrays are jit *arguments* (CLAUDE.md
    tunnel rule); the (Q*E, D) reconstruction is the working set."""
    Q, E = cand_ids.shape
    cc = jnp.take(
        coarse_codes.astype(jnp.int32), cand_code_rows.reshape(-1), axis=0
    )
    rc = jnp.take(
        refine_codes.astype(jnp.int32), cand_ids.reshape(-1), axis=0
    )
    recon = pq_decode(cb, cc) + pq_decode(rcb, rc)        # (Q*E, D) f32
    # (pq_decode un-rotates OPQ codebooks: both terms are original-space)
    recon = recon.reshape(Q, E, -1)
    qf = q.astype(jnp.float32)
    # -||q - recon||^2 up to the per-query constant ||q||^2: larger = better
    s = 2.0 * jnp.einsum("qd,qed->qe", qf, recon) - jnp.sum(
        recon * recon, axis=-1
    )
    s = jnp.where(valid, s, -jnp.inf)
    top_s, top_j = jax.lax.top_k(s, k)
    top_i = jnp.take_along_axis(cand_ids, top_j, axis=1)
    return top_s, top_i


@jax.jit
def pq_ip_table(codebook: PQCodebook, queries: jnp.ndarray) -> jnp.ndarray:
    """Per-query INNER-PRODUCT LUT: (Q, M, Ks) values of ``q_m . codeword``.

    Summing ``lut[m, code[m]]`` over m gives ``q . decode(code)`` exactly
    (orthogonal OPQ rotations preserve inner products: decode returns
    ``c_hat @ R^T`` and the LUT is built from the rotated query ``q @ R``).
    Unlike ``pq_dist_table`` this contains no per-code norm term, so two
    tables from independent codebooks (coarse + residual) ADD to the inner
    product against a two-level reconstruction — the centroid-walk distance
    ``||x_u||^2 - 2 q.x_u`` needs exactly that decomposition."""
    Q, D = queries.shape
    M, Ks, ds = codebook.codewords.shape
    if codebook.rotation is not None:
        queries = jnp.einsum(
            "qd,de->qe", queries.astype(jnp.float32), codebook.rotation,
            preferred_element_type=jnp.float32,
        )
    qs = queries.reshape(Q, M, ds)
    return jnp.einsum(
        "qmd,mkd->qmk", qs, codebook.codewords,
        preferred_element_type=jnp.float32,
    )


def pq_pack4(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack 4-bit codes (values < 16) two-per-byte: (N, M) -> (N, M/2) uint8.

    The Quick-ADC geometry (M subquantizers of Ks=16, arXiv:1704.07355) at
    half the HBM footprint — the full-scan ADC at >= 10M codes is bound by
    streaming the code matrix, so packing buys ~2x there. Unpacking happens
    on device inside ``pq_search(packed4=True)`` (two shifts per byte)."""
    codes = jnp.asarray(codes)
    if codes.shape[1] % 2:
        raise ValueError("M must be even to pack 4-bit codes")
    lo = codes[:, 0::2].astype(jnp.uint8)
    hi = codes[:, 1::2].astype(jnp.uint8)
    return lo | (hi << 4)


def pq_unpack4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``pq_pack4``: (N, M/2) uint8 -> (N, M) uint8."""
    lo = packed & 0xF
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=2).reshape(packed.shape[0], -1)


@partial(jax.jit, static_argnames=("k", "chunk", "method", "packed4"))
def pq_search(
    codebook: PQCodebook,
    codes: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    chunk: int = 65536,
    method: str = "auto",
    packed4: bool = False,
):
    """ADC top-k over the code matrix, streamed in chunks.

    Replaces the reference's per-query ``adist + argsort`` loop
    (nnsearch.py:893-898). Scores returned are negated squared distances
    (larger = better), matching the flat-search convention.

    ``method``:
    - ``"onehot"``: per subspace, ``one_hot(codes) @ lut_m`` — the LUT lookup
      becomes an MXU matmul (the standard TPU embedding trick). Measured ~15x
      faster than gathers at Ks=256 (1M x 16 books): TPU gathers run on the
      scalar unit, matmuls on the systolic array.
    - ``"gather"``: row-gather from the (Ks, Q) LUT (each gather fetches one
      contiguous Q-row). The one-hot matmul's FLOPs scale linearly with Ks
      while the gather count does not, so at the reference driver's Ks=2^13
      (offline.py:116) gathers win despite the scalar unit.
    - ``"auto"`` (default): onehot for Ks <= LARGE_KS, else gather — the
      measured crossover (BASELINE.md).
    """
    N = codes.shape[0]
    M = codebook.codewords.shape[0]
    Q = queries.shape[0]
    Ks = codebook.codewords.shape[1]
    if packed4:
        if Ks > 16:
            raise ValueError("packed4 requires Ks <= 16 (4-bit codes)")
        if codes.shape[1] != M // 2:
            raise ValueError(
                f"packed codes must be (N, {M // 2}), got {codes.shape}"
            )
    elif codes.shape[1] != M:
        raise ValueError(f"codes must be (N, {M}), got {codes.shape}")
    width = codes.shape[1]
    k = min(k, N)
    if method == "auto":
        method = "onehot" if Ks <= LARGE_KS else "gather"
    dt = pq_dist_table(codebook, queries)  # (Q, M, Ks)

    chunk = max(128, min(chunk, ((N + 127) // 128) * 128))
    pad = (-N) % chunk
    codes_p = jnp.concatenate(
        [codes, jnp.zeros((pad, width), codes.dtype)], axis=0
    ) if pad else codes
    nchunks = codes_p.shape[0] // chunk
    codes_c = codes_p.reshape(nchunks, chunk, width)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    k_local = min(k, chunk)
    # lut layout for matmuls: (M, Ks, Q)
    dt_t = jnp.transpose(dt, (1, 2, 0)).astype(jnp.float32)

    def one_chunk(inp):
        code_tile, cidx = inp  # (chunk, M) — or (chunk, M/2) packed
        if packed4:
            code_tile = pq_unpack4(code_tile)

        def add_m(m, acc):
            cm = jax.lax.dynamic_index_in_dim(code_tile, m, 1, keepdims=False)
            lut_m = jax.lax.dynamic_index_in_dim(dt_t, m, 0, keepdims=False)
            if method == "onehot":
                # f32 one-hot keeps the lookup exact (rows are exact 0/1)
                oh = jax.nn.one_hot(cm, Ks, dtype=jnp.float32)    # (chunk, Ks)
                return acc + jax.lax.dot_general(
                    oh, lut_m,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (chunk, Q)
            # row-gather: each index fetches one contiguous (Q,) LUT row
            return acc + jnp.take(lut_m, cm.astype(jnp.int32), axis=0)

        d = jax.lax.fori_loop(
            0, M, add_m, jnp.zeros((chunk, Q), jnp.float32)
        ).T  # (Q, chunk)

        s = -d
        gidx = row_iota + cidx * chunk
        s = jnp.where(gidx < N, s, -jnp.inf)
        top_s, sel = jax.lax.top_k(s, k_local)
        return top_s, sel + cidx * chunk

    top_s, top_i = jax.lax.map(
        one_chunk, (codes_c, jnp.arange(nchunks, dtype=jnp.int32))
    )  # (nchunks, Q, k_local)

    cand_s = jnp.transpose(top_s, (1, 0, 2)).reshape(Q, nchunks * k_local)
    cand_i = jnp.transpose(top_i, (1, 0, 2)).reshape(Q, nchunks * k_local)
    final_s, sel = jax.lax.top_k(cand_s, k)
    final_i = jnp.take_along_axis(cand_i, sel, axis=1)
    return final_s, final_i

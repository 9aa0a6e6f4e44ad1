"""Streaming (beyond-HBM / beyond-host-RAM) build helpers.

The reference's index builders all require the full descriptor matrix in
RAM (``/root/reference/src/utils/nnsearch.py:880-885`` fits nanopq on the
whole array; ``knn.py:43-54`` hands faiss a resident matrix). Our builders
additionally accept a CALLABLE chunk source — ``vecs()`` yields ``(c, D)``
row chunks (numpy or device arrays) — plus the total row count ``n=``, so a
database larger than both HBM and host RAM (10M x 2048 f32 = 80 GB) is
indexed without ever materializing it: training samples are gathered
chunk-by-chunk here, and the encode passes re-stream the source.

Device chunks gather ON device and the sampled rows stay there — pulling a
200k x 2048 sample to host is 1.6 GB through the MB/s axon tunnel, while it
fits HBM trivially. Host (numpy) chunks gather with numpy and upload once.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def stream_gather_rows(chunks_fn, n, idx_sets, normalize=False):
    """Gather rows at global indices from a chunk source, in ONE pass.

    ``idx_sets``: one int index array, or a list of them (each any order,
    no duplicates). Returns the gathered rows per set — a single ``(len(idx),
    D)`` f32 array or a list of them — with rows in the ORDER OF each index
    array (a stable argsort/searchsorted window per chunk, then a scatter
    restoring the caller's permutation; the round-trip is exact, so fits on
    the gathered rows are bit-identical to in-memory gathers — asserted in
    tests/test_index.py).

    ``normalize`` L2-normalizes the gathered rows (row-local, so identical
    to normalizing the full matrix first).
    """
    single = not isinstance(idx_sets, (list, tuple))
    sets = [idx_sets] if single else list(idx_sets)
    orders, sorted_sets = [], []
    for idx in sets:
        idx_h = np.asarray(idx)
        order = np.argsort(idx_h, kind="stable")
        orders.append(order)
        sorted_sets.append(idx_h[order])

    rows = [[] for _ in sets]
    on_device = [False] * len(sets)
    off = 0
    for chunk in chunks_fn():
        c_rows = int(chunk.shape[0])
        for si, sorted_idx in enumerate(sorted_sets):
            lo = np.searchsorted(sorted_idx, off)
            hi = np.searchsorted(sorted_idx, off + c_rows)
            if hi > lo:
                local = sorted_idx[lo:hi] - off
                if isinstance(chunk, np.ndarray):
                    rows[si].append(chunk[local].astype(np.float32))
                else:
                    on_device[si] = True
                    rows[si].append(jnp.take(
                        chunk, jnp.asarray(local, jnp.int32), axis=0
                    ).astype(jnp.float32))
        off += c_rows
    if off != n:
        raise ValueError(f"chunk source yielded {off} rows, n={n}")

    out = []
    for si in range(len(sets)):
        if on_device[si]:
            gathered = jnp.concatenate([jnp.asarray(r) for r in rows[si]])
            sample = jnp.zeros_like(gathered).at[
                jnp.asarray(orders[si], jnp.int32)
            ].set(gathered)
        else:
            gathered = np.concatenate(rows[si])
            sample_h = np.empty_like(gathered)
            sample_h[orders[si]] = gathered
            sample = jnp.asarray(sample_h)
            del sample_h
        del gathered
        rows[si] = None
        if normalize:
            from .base import normalize_rows

            sample = normalize_rows(sample)
        out.append(sample)
    return out[0] if single else out


def stream_encode_pieces(chunks_fn, n, chunk_rows, normalize=False):
    """Yield ``(start_row, device_piece)`` with pieces <= ``chunk_rows``.

    Re-slices whatever chunk granularity the source yields into the
    builder's encode grid; each piece uploads (or re-slices on device) one
    at a time, so peak HBM is one piece + the encode program's temporaries.
    Uniform source chunk sizes are recommended: each distinct piece shape
    compiles its own encode program.
    """
    off = 0
    for chunk in chunks_fn():
        for s in range(0, int(chunk.shape[0]), chunk_rows):
            piece = jnp.asarray(chunk[s : s + chunk_rows], jnp.float32)
            if normalize:
                from .base import normalize_rows

                piece = normalize_rows(piece)
            yield off + s, piece
        off += int(chunk.shape[0])
    if off != n:
        raise ValueError(f"chunk source yielded {off} rows, n={n}")

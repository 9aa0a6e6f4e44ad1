"""Descriptor extraction: single-scale, multi-scale, batched and sharded.

TPU-native counterpart of the reference extraction drivers
(``/root/reference/src/networks/imageretrievalnet.py:356-479``). The reference
runs a DataLoader at batch size 1 and loops scales per image on the GPU; here the
multi-scale forward is one jitted program per input shape (scales unrolled at
trace time — static shapes for XLA) and batches of padded images run with a
validity mask, so the MXU sees large batched convolutions.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.normalization import l2n

DEFAULT_SCALES = (1.0, 2 ** 0.5, 0.5 ** 0.5)  # reference ms default, offline.py:86


def _resize_images(images: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Bilinear resize by ``scale`` (floor-sized, like F.interpolate)."""
    B, H, W, C = images.shape
    nh, nw = int(H * scale), int(W * scale)
    return jax.image.resize(images, (B, nh, nw, C), method="bilinear")


def _resize_mask(mask: jnp.ndarray, scale: float) -> jnp.ndarray:
    B, H, W = mask.shape
    nh, nw = int(H * scale), int(W * scale)
    return (
        jax.image.resize(mask.astype(jnp.float32), (B, nh, nw), method="nearest")
        > 0.5
    )


def multiscale_descriptor(
    module,
    variables,
    images: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scales: Sequence[float] = DEFAULT_SCALES,
    msp: float = 1.0,
    compute_dtype=None,
):
    """Multi-scale descriptor (extract_ms, imageretrievalnet.py:464-479).

    ``v = (mean_s net(resize(x, s))^msp)^(1/msp)``, L2-normalized. With a single
    scale of 1.0 this reduces to ``extract_ss`` (:461-462). Scales are unrolled at
    trace time: each scale is a static-shape forward.

    ``compute_dtype`` casts the per-scale network input *after* the resize:
    bilinear resize in bf16 is the slow path (measured 72 -> 47 img/s for the
    3-scale forward when images were pre-cast).
    """
    acc = None
    for s in scales:
        xs = images if s == 1.0 else _resize_images(images, s)
        if compute_dtype is not None:
            xs = xs.astype(compute_dtype)
        ms = None
        if mask is not None:
            ms = mask if s == 1.0 else _resize_mask(mask, s)
        v = module.apply(variables, xs, ms)  # (B, D), already l2n'd
        v = v.astype(jnp.float32)            # accumulate scales in f32
        v = jnp.power(v, msp) if msp != 1.0 else v
        acc = v if acc is None else acc + v
    acc = acc / len(scales)
    if msp != 1.0:
        acc = jnp.power(acc, 1.0 / msp)
    return l2n(acc, eps=0.0)  # reference divides by exact norm (:477)


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda p: p.astype(dtype)
        if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating) else p,
        tree,
    )


def make_extract_fn(
    module,
    scales: Sequence[float] = DEFAULT_SCALES,
    msp: float = 1.0,
    compute_dtype=None,
):
    """Jitted ``(variables, images, mask) -> (B, D)`` extraction function.

    One compilation per distinct padded input shape; callers bucket images into a
    small set of canvas shapes (see ``data.images.bucket_batches``).

    ``compute_dtype=jnp.bfloat16`` runs the conv/attention stack on the MXU
    bf16 fast path (params and images cast at the jit boundary, descriptor
    cast back to f32). Descriptor agreement vs f32 is ~1e-3 cosine
    (tests/test_models.py); extraction is the reference's dominant compute
    sink (extract_1m.py: "days" at 1M), so the ~2x matmul throughput matters.
    """

    @jax.jit
    def fn(variables, images, mask=None):
        if compute_dtype is not None:
            variables = _cast_floats(variables, compute_dtype)
        v = multiscale_descriptor(
            module, variables, images, mask, scales=tuple(scales), msp=msp,
            compute_dtype=compute_dtype,
        )
        return v.astype(jnp.float32)

    return fn


def make_sharded_extract_fn(
    module,
    mesh,
    scales: Sequence[float] = DEFAULT_SCALES,
    msp: float = 1.0,
    axis: str = "data",
    compute_dtype=None,
):
    """Batch-sharded extraction over a device mesh.

    Replaces the reference's ``nn.DataParallel`` replication
    (``main_train.py:472``, ``traindataset.py:420``): parameters are replicated,
    the batch dimension is sharded over ``axis``, and XLA inserts the collectives.
    Batch size must be divisible by the mesh axis size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(axis))

    @partial(
        jax.jit,
        in_shardings=(replicated, batch_sharded, batch_sharded),
        out_shardings=batch_sharded,
    )
    def fn(variables, images, mask):
        if compute_dtype is not None:
            variables = _cast_floats(variables, compute_dtype)
        v = multiscale_descriptor(
            module, variables, images, mask, scales=tuple(scales), msp=msp,
            compute_dtype=compute_dtype,
        )
        return v.astype(jnp.float32)

    return fn


def extract_vectors(
    model,
    paths,
    image_size: int = 1024,
    bbxs=None,
    scales: Sequence[float] = (1.0,),
    msp: float = 1.0,
    batch_size: int = 16,
    extract_fn=None,
    pad_batches: bool = False,
    loader: str = "pil",
):
    """Host driver: paths -> (N, D) descriptors (imageretrievalnet.py:356-386).

    Loads/preprocesses images (test mode: bbx crop + thumbnail), buckets them
    into padded canvas batches with masks, and runs the jitted multiscale
    extraction per batch — the batched TPU replacement for the reference's
    bs=1 DataLoader loop. ``model`` is a ``retrieval.RetrievalModel``.

    ``pad_batches`` pads partial batches up to ``batch_size`` with fully-masked
    zero canvases (required by mesh-sharded extraction, which needs the batch
    dimension divisible by the device count).

    ``loader="native"`` decodes each path chunk through the threaded libjpeg
    loader (``native/image_loader.cpp``) instead of per-image PIL — the
    device-feeding host pipeline for gallery-scale extraction (extract_1m.py
    regime). bbx query crops always go through PIL (the bbx crop needs the
    full-resolution image).
    """
    import numpy as np

    from ..data.images import bucket_batches, iter_test_images

    if loader == "native" and bbxs is None:
        from ..data.images import load_test_images_native

        def gen():
            chunk = 4 * batch_size
            for start in range(0, len(paths), chunk):
                sub = paths[start : start + chunk]
                for j, arr in enumerate(
                    load_test_images_native(sub, image_size)
                ):
                    yield start + j, arr

        source = gen()
    else:
        source = iter_test_images(paths, imsize=image_size, bbxs=bbxs)

    fn = extract_fn or make_extract_fn(model.module, scales=scales, msp=msp)
    out = np.zeros((len(paths), model.outputdim), np.float32)
    for batch in bucket_batches(source, batch_size):
        images, mask = batch.images, batch.mask
        n_real = images.shape[0]
        if pad_batches and n_real < batch_size:
            pad = batch_size - n_real
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
            )
            mask = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:], bool)])
        vecs = fn(model.params, jnp.asarray(images), jnp.asarray(mask))
        out[batch.indices] = np.asarray(vecs)[:n_real]
    return out


def extract_vectors_single(
    model,
    image_path: str,
    image_size: int = 1024,
    bbx=None,
    scales: Sequence[float] = (1.0,),
    msp: float = 1.0,
    extract_fn=None,
):
    """One-query extraction (imageretrievalnet.py:388-409); (D,) output."""
    return extract_vectors(
        model, [image_path], image_size, [bbx] if bbx is not None else None,
        scales, msp, batch_size=1, extract_fn=extract_fn,
    )[0]

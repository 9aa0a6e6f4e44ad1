"""Image loading, resizing, and TPU batch assembly.

Counterpart of ``/root/reference/src/datasets/genericdataset.py`` and
``datahelpers.py``: truncated-file-tolerant PIL loading, test-mode bbx-crop +
thumbnail-to-max-side and train-mode resize + random square crop, ImageNet
normalization.

TPU addition: ``bucket_batches`` groups variable-aspect images into a small set
of padded canvas shapes (dims rounded up to multiples of 32, the backbone's
total stride) with validity masks — the batched replacement for the reference's
batch-size-1 DataLoader (``imageretrievalnet.py:363-366``), bounding the number
of XLA compilations while keeping aspect ratios exact.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
STRIDE = 32  # backbone total stride: canvas dims are rounded up to this


def pil_loader(path: str):
    """Truncated-image-tolerant RGB loader (datahelpers.py:28-34)."""
    from PIL import Image, ImageFile

    ImageFile.LOAD_TRUNCATED_IMAGES = True
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


def imthumbnail(img, imsize: float):
    """In-place thumbnail to max side <= imsize (datahelpers.py:56-58)."""
    from PIL import Image

    resample = getattr(Image, "LANCZOS", None) or Image.Resampling.LANCZOS
    img.thumbnail((int(imsize), int(imsize)), resample)
    return img


def imresize(img, imsize: int):
    """Resize so the *short* side == imsize (torchvision Resize semantics,
    datahelpers.py:60-62)."""
    from PIL import Image

    w, h = img.size
    if w < h:
        nw, nh = imsize, int(round(imsize * h / w))
    else:
        nw, nh = int(round(imsize * w / h)), imsize
    resample = getattr(Image, "BILINEAR", None) or Image.Resampling.BILINEAR
    return img.resize((int(nw), int(nh)), resample)


def load_test_image(
    path: str,
    imsize: Optional[int] = 1024,
    bbx: Optional[Sequence[float]] = None,
    raw: bool = False,
) -> np.ndarray:
    """Test-mode image pipeline (genericdataset.py:67-79): optional bbx crop,
    thumbnail (bbx mode scales relative to the *full* image size), normalize.
    Returns float32 HWC — or uint8 HWC with ``raw=True`` (pre-normalization
    pixels, for serving paths that normalize ON DEVICE: a uint8 canvas is 4x
    less host->device traffic, which dominates batched serving on slow
    links)."""
    img = pil_loader(path)
    imfullsize = max(img.size)
    if bbx is not None:
        img = img.crop(tuple(bbx))
    if imsize is not None:
        if bbx is not None:
            imthumbnail(img, imsize * max(img.size) / imfullsize)
        else:
            imthumbnail(img, imsize)
    if raw:
        return np.asarray(img, np.uint8)
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def load_test_images_native(
    paths: Sequence[str],
    imsize: Optional[int] = 1024,
    threads: int = 8,
    raw: bool = False,
) -> list:
    """Batch test-mode loading through the native threaded JPEG decoder
    (``native/image_loader.cpp``): libjpeg with DCT prescaling + box-filter
    thumbnail, one thread pool for the whole batch — the replacement for the
    reference's DataLoader worker processes (imageretrievalnet.py:363-366).

    Semantics match ``load_test_image(path, imsize)`` (no bbx mode): only-
    shrink thumbnail to max side ``imsize``, ImageNet-normalized float32 HWC.
    Pixel values differ from PIL at the resampling-filter level only (box vs
    bicubic; descriptor cosine > 0.99, tests/test_native_loader.py). Images
    the decoder rejects (non-JPEG, truncated) fall back to PIL per image."""
    import ctypes

    from ..native import load

    n = len(paths)
    if n == 0:
        return []
    if imsize is None:
        # the native path needs a fixed canvas side; full-resolution loading
        # (imsize=None) keeps PIL semantics exactly, per image
        return [load_test_image(p, None, raw=raw) for p in paths]
    lib = load("image_loader")
    s = int(imsize)
    # np.empty: decode_thumbnail_batch memsets the whole canvas itself
    out = np.empty((n, s, s, 3), np.float32)
    hw = np.zeros((n, 2), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.decode_thumbnail_batch(
        arr, ctypes.c_int(n), ctypes.c_int(s),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(threads),
    )
    images = []
    for i in range(n):
        h, w = int(hw[i, 0]), int(hw[i, 1])
        if h == 0 or w == 0:  # decoder rejected it -> PIL fallback
            images.append(load_test_image(paths[i], imsize, raw=raw))
            continue
        img = out[i, :h, :w]
        if raw:
            # the decoder wrote px/255: restore the original uint8 pixels
            # (round-trip exact for the decoded values; the box-filter's
            # fractional averages quantize by <= 0.5/255)
            images.append((img * 255.0 + 0.5).astype(np.uint8))
            continue
        images.append((img - IMAGENET_MEAN) / IMAGENET_STD)
    return images


def load_train_image(
    path: str,
    imsize: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Train-mode pipeline (genericdataset.py:55-66): short-side resize to
    imsize then random imsize x imsize crop, normalize."""
    img = imresize(pil_loader(path), imsize)
    w, h = img.size
    x0 = int(rng.integers(0, max(w - imsize, 0) + 1))
    y0 = int(rng.integers(0, max(h - imsize, 0) + 1))
    img = img.crop((x0, y0, x0 + imsize, y0 + imsize))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def _canvas_shape(h: int, w: int) -> Tuple[int, int]:
    rh = ((h + STRIDE - 1) // STRIDE) * STRIDE
    rw = ((w + STRIDE - 1) // STRIDE) * STRIDE
    return rh, rw


@dataclass
class Batch:
    """A padded canvas batch: images (B, H, W, 3), mask (B, H, W), source ids."""

    images: np.ndarray
    mask: np.ndarray
    indices: np.ndarray  # positions in the original list


def bucket_batches(
    arrays: Iterable[Tuple[int, np.ndarray]],
    batch_size: int = 16,
) -> Iterator[Batch]:
    """Group (index, HWC image) pairs by rounded canvas shape into batches.

    Images whose rounded (H/32, W/32) shapes match share one compilation; each
    batch is zero-padded onto the canvas with a validity mask.
    """
    buckets = {}
    for idx, arr in arrays:
        shape = _canvas_shape(arr.shape[0], arr.shape[1])
        buckets.setdefault(shape, []).append((idx, arr))
        if len(buckets[shape]) >= batch_size:
            yield _pack(buckets.pop(shape), shape)
    for shape, items in buckets.items():
        yield _pack(items, shape)


def _pack(items, shape) -> Batch:
    H, W = shape
    B = len(items)
    images = np.zeros((B, H, W, 3), np.float32)
    mask = np.zeros((B, H, W), bool)
    indices = np.empty((B,), np.int64)
    for b, (idx, arr) in enumerate(items):
        h, w = arr.shape[:2]
        images[b, :h, :w] = arr
        mask[b, :h, :w] = True
        indices[b] = idx
    return Batch(images=images, mask=mask, indices=indices)


def iter_test_images(
    paths: Sequence[str],
    imsize: Optional[int] = 1024,
    bbxs: Optional[Sequence] = None,
) -> Iterator[Tuple[int, np.ndarray]]:
    for i, p in enumerate(paths):
        bbx = bbxs[i] if bbxs is not None else None
        yield i, load_test_image(p, imsize, bbx)


def path_all_jpg(directory: str, start: Optional[str] = None):
    """Recursive jpg listing + relative paths (general.py:59-65)."""
    paths = []
    for dirpath, _, filenames in os.walk(directory):
        paths += [os.path.join(dirpath, f) for f in filenames if f.endswith(".jpg")]
    paths.sort()
    rel = [os.path.relpath(p, start or directory) for p in paths]
    return paths, rel


def cid2filename(cid: str, prefix: str) -> str:
    """SfM120k CID -> 3-level hashed path (datahelpers.py:13-26)."""
    return os.path.join(prefix, cid[-2:], cid[-4:-2], cid[-6:-4], cid)


def unnormalize(rgb: np.ndarray) -> np.ndarray:
    """Reverse ImageNet normalization to [0, 1] (datahelpers.py:76-86);
    NHWC layout."""
    out = rgb * IMAGENET_STD + IMAGENET_MEAN
    return np.clip(out, 0.0, 1.0)


def save_rank_montage(
    query_path: str,
    db_paths: Sequence[str],
    ranks_row: np.ndarray,
    out_path: str,
    k: int = 10,
    thumb: int = 128,
):
    """Write a horizontal query-plus-top-k contact sheet (the reference's
    test_custom rank visualisation, test_custom.py:37-44)."""
    from PIL import Image

    tiles = [query_path] + [db_paths[int(i)] for i in ranks_row[:k]]
    canvas = Image.new("RGB", (thumb * len(tiles), thumb), (30, 30, 30))
    for i, p in enumerate(tiles):
        im = pil_loader(p)
        im.thumbnail((thumb, thumb))
        canvas.paste(im, (i * thumb + (thumb - im.size[0]) // 2,
                          (thumb - im.size[1]) // 2))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    canvas.save(out_path)
    return out_path

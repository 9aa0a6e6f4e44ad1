"""Native threaded JPEG loader (native/image_loader.cpp) vs the PIL path.

The loader must reproduce load_test_image's test-mode semantics (only-shrink
thumbnail to max side imsize, ImageNet normalization) — bit-exact when no
resampling happens, and within resampling-filter tolerance (box vs bicubic)
when it does. Non-JPEG inputs fall back to PIL per image.
"""

import os

import numpy as np
import pytest
from PIL import Image
from scipy import ndimage

from image_search_engine_for_historical_research_tpu.data.images import (
    IMAGENET_STD,
    load_test_image,
    load_test_images_native,
)


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    td = tmp_path_factory.mktemp("jpgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (1200, 900), (64, 64), (300, 200)]):
        a = ndimage.zoom(rng.uniform(0, 255, (max(h // 10, 2), max(w // 10, 2))),
                         10, order=1)[:h, :w]
        arr = np.stack([a, np.roll(a, 5, 0), np.roll(a, 9, 1)], -1)
        p = str(td / f"im{i}.jpg")
        Image.fromarray(arr.astype(np.uint8)).save(p, quality=92)
        paths.append(p)
    png = str(td / "x.png")
    Image.fromarray(
        rng.uniform(0, 255, (120, 180, 3)).astype(np.uint8)
    ).save(png)
    return paths, png


def test_matches_pil_path(jpgs):
    paths, _ = jpgs
    nat = load_test_images_native(paths, 1024, threads=2)
    for p, a in zip(paths, nat):
        b = load_test_image(p, 1024)
        assert a.shape == b.shape
        diff = np.abs((a - b) * IMAGENET_STD).mean()  # de-normalized pixels
        assert diff < 0.01, (p, diff)


def test_shrink_only_thumbnail(jpgs):
    paths, _ = jpgs
    nat = load_test_images_native(paths, 256, threads=2)
    # big images land at max side 256; the small one is untouched
    assert max(nat[0].shape[:2]) == 256
    with Image.open(paths[2]) as im:
        assert nat[2].shape[:2] == (im.height, im.width)
    # bit-exact in the no-resample case
    np.testing.assert_allclose(
        nat[2], load_test_image(paths[2], 256), atol=1e-6
    )


def test_non_jpeg_falls_back_to_pil(jpgs):
    paths, png = jpgs
    out = load_test_images_native([paths[0], png], 512, threads=2)
    ref = load_test_image(png, 512)
    assert out[1].shape == ref.shape
    np.testing.assert_allclose(out[1], ref, atol=1e-6)


def test_missing_file_falls_back_and_raises(jpgs, tmp_path):
    with pytest.raises(FileNotFoundError):
        load_test_images_native([str(tmp_path / "nope.jpg")], 256)


def test_empty_batch(jpgs):
    assert load_test_images_native([], 256) == []


def test_extraction_descriptor_parity(jpgs):
    """extract_vectors(loader='native') descriptors match the PIL path
    (decode-level differences only: cosine > 0.999)."""
    from image_search_engine_for_historical_research_tpu.cli import common
    from image_search_engine_for_historical_research_tpu.models.extract import (
        extract_vectors,
    )

    paths, _ = jpgs
    model = common.load_network(None, "resnet50")
    v_pil = extract_vectors(model, paths, 96, scales=(1.0,), batch_size=2)
    v_nat = extract_vectors(
        model, paths, 96, scales=(1.0,), batch_size=2, loader="native"
    )
    cos = np.sum(v_pil * v_nat, axis=1)
    assert (cos > 0.999).all(), cos

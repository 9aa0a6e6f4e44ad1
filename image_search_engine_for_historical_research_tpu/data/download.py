"""Dataset downloaders: revisited Oxford/Paris, 1M distractors, SfM120k.

Counterpart of ``/root/reference/src/utils/download.py`` (and its windows
variant): fetch test datasets (images + gnd pickle) into
``<data_root>/test/<dataset>/jpg`` and the revisitop1m distractors (100 tar
chunks), plus the SfM120k training db. Downloads shell out to ``wget`` like the
reference; every step is idempotent and resumable (skips finished files).

This build environment has no egress — the functions raise a clear error on
network failure rather than half-writing state.
"""

from __future__ import annotations

import os
import subprocess
import tarfile
from typing import List

SRC_OXFORD = "https://www.robots.ox.ac.uk/~vgg/data/oxbuildings"
SRC_PARIS = "https://www.robots.ox.ac.uk/~vgg/data/parisbuildings"
SRC_REVISITOP = "http://cmp.felk.cvut.cz/revisitop/data"
SRC_CNNIR = "http://cmp.felk.cvut.cz/cnnimageretrieval/data"

TEST_IMAGE_ARCHIVES = {
    "oxford5k": [f"{SRC_OXFORD}/oxbuild_images.tgz"],
    "paris6k": [f"{SRC_PARIS}/paris_1.tgz", f"{SRC_PARIS}/paris_2.tgz"],
    # the revisited datasets reuse the original images
    "roxford5k": [f"{SRC_OXFORD}/oxbuild_images.tgz"],
    "rparis6k": [f"{SRC_PARIS}/paris_1.tgz", f"{SRC_PARIS}/paris_2.tgz"],
}

GND_FILES = {
    "roxford5k": f"{SRC_REVISITOP}/datasets/roxford5k/gnd_roxford5k.pkl",
    "rparis6k": f"{SRC_REVISITOP}/datasets/rparis6k/gnd_rparis6k.pkl",
}


def _wget(url: str, dst: str):
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.exists(dst):
        return dst
    tmp = dst + ".part"
    try:
        subprocess.run(
            ["wget", "-q", "-c", "-O", tmp, url], check=True, timeout=3600
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise RuntimeError(f"download failed for {url}: {e}") from e
    os.rename(tmp, dst)
    return dst


def _untar(archive: str, dst_dir: str):
    os.makedirs(dst_dir, exist_ok=True)
    with tarfile.open(archive) as tf:
        tf.extractall(dst_dir, filter="data")


def download_test(data_root: str, datasets=("roxford5k", "rparis6k")) -> None:
    """Images + gnd pickles into <data_root>/test (download.py:5-99)."""
    for ds in datasets:
        dst = os.path.join(data_root, "test", ds)
        jpg = os.path.join(dst, "jpg")
        if not os.path.isdir(jpg) or not os.listdir(jpg):
            for url in TEST_IMAGE_ARCHIVES[ds]:
                arch = _wget(url, os.path.join(dst, os.path.basename(url)))
                _untar(arch, jpg)
        if ds in GND_FILES:
            _wget(GND_FILES[ds], os.path.join(dst, f"gnd_{ds}.pkl"))


def download_distractors(data_root: str, n_chunks: int = 100) -> None:
    """revisitop1m distractors: 100 tar chunks + imlist (download.py:~100-154)."""
    dst = os.path.join(data_root, "test", "revisitop1m")
    jpg = os.path.join(dst, "jpg")
    _wget(
        f"{SRC_REVISITOP}/datasets/revisitop1m/revisitop1m.txt",
        os.path.join(dst, "revisitop1m.txt"),
    )
    for i in range(1, n_chunks + 1):
        name = f"revisitop1m.{i}.tar.gz"
        done_marker = os.path.join(dst, f".done_{i}")
        if os.path.exists(done_marker):
            continue
        arch = _wget(
            f"{SRC_REVISITOP}/datasets/revisitop1m/jpg/{name}",
            os.path.join(dst, name),
        )
        _untar(arch, jpg)
        os.remove(arch)
        open(done_marker, "w").close()


def download_train(data_root: str) -> None:
    """SfM120k training images + db pickle (download.py download_train)."""
    dst = os.path.join(data_root, "train", "retrieval-SfM-120k")
    _wget(
        f"{SRC_CNNIR}/train/retrieval-SfM-120k/retrieval-SfM-120k.pkl",
        os.path.join(dst, "retrieval-SfM-120k.pkl"),
    )
    _wget(
        f"{SRC_CNNIR}/train/retrieval-SfM-120k/ims.tar.gz",
        os.path.join(dst, "ims.tar.gz"),
    )
    _untar(os.path.join(dst, "ims.tar.gz"), os.path.join(dst, "ims"))

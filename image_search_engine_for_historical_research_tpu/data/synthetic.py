"""Synthetic image datasets for tests and end-to-end drives.

The reference has no fixtures at all (SURVEY.md section 4); these generate tiny
on-disk datasets in the same layout its loaders expect: class-structured jpg
folders (the ``custom``/folder-label protocol of ``test_custom.py``) and a
revisited-protocol gnd pickle (easy/hard/junk/bbx) so the full offline -> online
-> evaluate pipeline runs hermetically.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Tuple

import numpy as np


def _class_image(rng, cls_color, size, jitter=40):
    """A small 'photo': class-colored blocks + noise, so same-class images are
    visually similar to a CNN but not identical."""
    h, w = size
    base = np.ones((h, w, 3), np.float32) * np.asarray(cls_color, np.float32)
    # class-specific pattern: a grid of rectangles at class-dependent offsets
    base += rng.normal(0, jitter, (h, w, 3))
    return np.clip(base, 0, 255).astype(np.uint8)


def make_folder_dataset(
    root: str,
    n_classes: int = 4,
    per_class: int = 6,
    n_queries_per_class: int = 1,
    size: Tuple[int, int] = (96, 128),
    seed: int = 0,
):
    """Folder-labelled dataset: root/db/<class>/*.jpg + root/q/<class>/*.jpg.

    Returns (db_paths, query_paths) with the folder name as the label, matching
    the ``mAP_custom`` protocol (evaluate.py:157-174).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    colors = rng.integers(30, 225, (n_classes, 3))
    db_paths, q_paths = [], []
    for c in range(n_classes):
        cls = f"class{c}"
        for split, count, out in (
            ("db", per_class, db_paths),
            ("q", n_queries_per_class, q_paths),
        ):
            d = os.path.join(root, split, cls)
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                # vary sizes a little to exercise canvas bucketing
                h = size[0] + 16 * int(rng.integers(0, 2))
                w = size[1] + 16 * int(rng.integers(0, 2))
                arr = _class_image(rng, colors[c], (h, w))
                p = os.path.join(d, f"im{i}.jpg")
                Image.fromarray(arr).save(p, quality=90)
                out.append(p)
    return db_paths, q_paths


def make_revisited_dataset(
    root: str,
    dataset: str = "rsynthetic",
    n_classes: int = 4,
    per_class: int = 6,
    size: Tuple[int, int] = (96, 128),
    seed: int = 0,
) -> Dict:
    """Write a revisited-protocol directory: <root>/<dataset>/jpg/*.jpg +
    gnd_<dataset>.pkl with imlist/qimlist/gnd (easy/hard/junk/bbx)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    colors = rng.integers(30, 225, (n_classes, 3))
    jpg_dir = os.path.join(root, dataset, "jpg")
    os.makedirs(jpg_dir, exist_ok=True)

    imlist, labels = [], []
    for c in range(n_classes):
        for i in range(per_class):
            name = f"db_c{c}_{i}"
            Image.fromarray(_class_image(rng, colors[c], size)).save(
                os.path.join(jpg_dir, name + ".jpg"), quality=90
            )
            imlist.append(name)
            labels.append(c)
    qimlist, gnd = [], []
    labels = np.asarray(labels)
    for c in range(n_classes):
        name = f"q_c{c}"
        Image.fromarray(_class_image(rng, colors[c], size)).save(
            os.path.join(jpg_dir, name + ".jpg"), quality=90
        )
        qimlist.append(name)
        members = np.where(labels == c)[0]
        half = len(members) // 2
        gnd.append(
            {
                "easy": members[:half],
                "hard": members[half:],
                "junk": np.array([], np.int64),
                "bbx": [0, 0, size[1], size[0]],
            }
        )

    cfg = {"imlist": imlist, "qimlist": qimlist, "gnd": gnd}
    with open(os.path.join(root, dataset, f"gnd_{dataset}.pkl"), "wb") as f:
        pickle.dump(cfg, f)
    return cfg


def make_sfm_db_dataset(
    root: str,
    n_clusters: int = 4,
    per_cluster: int = 5,
    size: Tuple[int, int] = (64, 64),
    seed: int = 0,
    name: str = "retrieval-SfM-tiny",
):
    """Write an SfM120k-format training db: hashed image dirs + db pickle.

    Layout mirrors the reference's training data (traindataset.py:47-63):
    ``<root>/<name>/ims/<hash dirs>/<cid>`` images and ``<root>/<name>/<name>.pkl``
    holding ``{"train": {...}, "val": {...}}`` with cids/cluster/qidxs/pidxs.
    Returns the pickle path.
    """
    from PIL import Image

    from .images import cid2filename

    rng = np.random.default_rng(seed)
    colors = rng.integers(30, 225, (n_clusters, 3))
    db_root = os.path.join(root, name)
    ims_root = os.path.join(db_root, "ims")

    def one_split(tag, clusters_range):
        cids, cluster, qidxs, pidxs = [], [], [], []
        for c in clusters_range:
            members = []
            for i in range(per_cluster):
                # 16-hex-char cid like the real SfM120k ids
                cid = f"{tag}{c:02d}{i:02d}".ljust(16, "a")
                path = cid2filename(cid, ims_root)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                Image.fromarray(_class_image(rng, colors[c], size)).save(
                    path, format="JPEG", quality=90
                )
                members.append(len(cids))
                cids.append(cid)
                cluster.append(c)
            for i in range(len(members) - 1):  # consecutive pairs as q/p
                qidxs.append(members[i])
                pidxs.append(members[i + 1])
        return {
            "cids": cids,
            "cluster": cluster,
            "qidxs": qidxs,
            "pidxs": pidxs,
        }

    db = {
        "train": one_split("t", range(n_clusters)),
        "val": one_split("v", range(n_clusters)),
    }
    pkl = os.path.join(db_root, f"{name}.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(db, f)
    return pkl

"""AdaLAM parity against the vendored torch implementation.

Oracle: ``/root/reference/src/utils/adalam/`` (runnable on CPU torch). We build
synthetic scenes — keypoints under a known affine map plus outliers — and
require (a) near-identical surviving match sets and (b) rank agreement of
per-pair inlier counts across a candidate list, per the round-1 review's
acceptance criterion.
"""

import numpy as np
import pytest
import torch

from image_search_engine_for_historical_research_tpu.rerank.adalam import (
    AdalamFilter,
    _first_k_couples,
)

from reference_oracle import load_reference_retrieval_module

load_reference_retrieval_module()  # puts /root/reference on sys.path

from src.utils.adalam.adalam import AdalamFilter as TorchAdalamFilter  # noqa: E402
from src.utils.adalam.utils import draw_first_k_couples  # noqa: E402


def _torch_config(**over):
    cfg = {"device": torch.device("cpu")}
    cfg.update(over)
    return cfg


def _scene(seed=0, n_in=220, n_out=80, imsize=1000.0, noise=1.0):
    """Inliers follow a global affine + noise; outliers are random pairs.

    Returns dicts of keypoints/orientations/scales/descriptors for two images
    where descriptor distances make the true correspondence the NN.
    """
    rng = np.random.default_rng(seed)
    n = n_in + n_out
    k1 = rng.uniform(40, imsize - 40, (n, 2)).astype(np.float32)

    theta = 0.2
    A = np.asarray(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
        np.float32,
    ) * 1.1
    t = np.asarray([25.0, -12.0], np.float32)
    k2 = np.empty_like(k1)
    k2[:n_in] = k1[:n_in] @ A.T + t + rng.normal(0, noise, (n_in, 2))
    k2[n_in:] = rng.uniform(40, imsize - 40, (n_out, 2))
    k2 = np.clip(k2, 0, imsize).astype(np.float32)

    # descriptors: matched points share a (noisy) random code
    d = rng.standard_normal((n, 64)).astype(np.float32)
    d1 = d + 0.05 * rng.standard_normal((n, 64)).astype(np.float32)
    d2 = d + 0.05 * rng.standard_normal((n, 64)).astype(np.float32)

    o1 = rng.uniform(0, 360, n).astype(np.float32)
    o2 = np.empty_like(o1)
    o2[:n_in] = (o1[:n_in] + np.degrees(theta) + rng.normal(0, 3, n_in)) % 360
    o2[n_in:] = rng.uniform(0, 360, n_out)
    s1 = rng.uniform(2, 6, n).astype(np.float32)
    s2 = np.empty_like(s1)
    s2[:n_in] = s1[:n_in] * 1.1 * rng.uniform(0.95, 1.05, n_in)
    s2[n_in:] = rng.uniform(2, 6, n_out)
    return dict(k1=k1, k2=k2, d1=d1, d2=d2, o1=o1, o2=o2, s1=s1, s2=s2,
                shape=(imsize, imsize), n_in=n_in)


def _run_both(scene, **config_over):
    ours = AdalamFilter(dict(config_over))
    keep, matches = ours.match_and_filter(
        scene["k1"], scene["k2"], scene["d1"], scene["d2"],
        im1shape=scene["shape"], im2shape=scene["shape"],
        o1=scene["o1"], o2=scene["o2"], s1=scene["s1"], s2=scene["s2"],
    )
    theirs = TorchAdalamFilter(_torch_config(**config_over))
    tm = theirs.match_and_filter(
        k1=scene["k1"], k2=scene["k2"], d1=scene["d1"], d2=scene["d2"],
        im1shape=scene["shape"], im2shape=scene["shape"],
        o1=scene["o1"], o2=scene["o2"], s1=scene["s1"], s2=scene["s2"],
    ).numpy()
    return set(map(tuple, matches.tolist())), set(map(tuple, tm.tolist()))


def test_sampling_schedule_matches_reference():
    got = _first_k_couples(128)
    ref = draw_first_k_couples(
        128, torch.ones(3, dtype=torch.long) * 10**9, torch.device("cpu")
    )[:, :, 0].numpy()
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("seed", [0, 1])
def test_match_set_agreement(seed):
    scene = _scene(seed=seed)
    got, ref = _run_both(scene)
    assert len(ref) > 50, "oracle found too few matches; scene too hard"
    inter = len(got & ref)
    union = len(got | ref)
    iou = inter / union
    assert iou > 0.9, (len(got), len(ref), iou)
    # the surviving matches should overwhelmingly be true inliers
    true_in = sum(1 for i, j in got if i == j and i < scene["n_in"])
    assert true_in / max(len(got), 1) > 0.95


def test_outlier_only_scene_rejected():
    scene = _scene(seed=3, n_in=0, n_out=250)
    got, ref = _run_both(scene)
    # neither should verify more than a handful of random matches
    assert len(got) <= max(10, 2 * len(ref) + 5), (len(got), len(ref))


def test_no_refit_agreement():
    scene = _scene(seed=4)
    got, ref = _run_both(scene, refit=False)
    iou = len(got & ref) / max(len(got | ref), 1)
    assert iou > 0.85, (len(got), len(ref), iou)


def test_inlier_count_rank_agreement():
    """Counts across candidate pairs must rank-correlate with the oracle
    (the quantity SAHA sorts by, Reranking.py:47-53)."""
    from scipy.stats import spearmanr

    ours_counts, ref_counts = [], []
    for seed in range(6):
        # vary inlier fraction -> a spread of verification strengths
        n_in = [0, 30, 60, 120, 180, 240][seed]
        scene = _scene(seed=10 + seed, n_in=n_in, n_out=250 - n_in)
        got, ref = _run_both(scene)
        ours_counts.append(len(got))
        ref_counts.append(len(ref))
    rho = spearmanr(ours_counts, ref_counts).statistic
    assert rho > 0.9, (ours_counts, ref_counts, rho)


def test_padded_invalid_keypoints_ignored():
    scene = _scene(seed=6, n_in=120, n_out=40)
    n = scene["k1"].shape[0]
    pad = 64
    ours = AdalamFilter()
    k1p = np.concatenate([scene["k1"], np.zeros((pad, 2), np.float32)])
    d1p = np.concatenate([scene["d1"], np.zeros((pad, 64), np.float32)])
    o1p = np.concatenate([scene["o1"], np.zeros(pad, np.float32)])
    s1p = np.concatenate([scene["s1"], np.ones(pad, np.float32)])
    valid = np.arange(n + pad) < n
    keep_p, matches_p = ours.match_and_filter(
        k1p, scene["k2"], d1p, scene["d2"],
        im1shape=scene["shape"], im2shape=scene["shape"],
        o1=o1p, o2=scene["o2"], s1=s1p, s2=scene["s2"], valid1=valid,
    )
    keep, matches = ours.match_and_filter(
        scene["k1"], scene["k2"], scene["d1"], scene["d2"],
        im1shape=scene["shape"], im2shape=scene["shape"],
        o1=scene["o1"], o2=scene["o2"], s1=scene["s1"], s2=scene["s2"],
    )
    assert not keep_p[n:].any()
    got_p = set(map(tuple, matches_p.tolist()))
    got = set(map(tuple, matches.tolist()))
    iou = len(got & got_p) / max(len(got | got_p), 1)
    assert iou > 0.9, (len(got), len(got_p), iou)

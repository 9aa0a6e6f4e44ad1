import numpy as np
import pytest

from image_search_engine_for_historical_research_tpu.evaluation import (
    cal_map_labels,
    compute_ap,
    compute_map,
    compute_map_revisited,
    map_custom,
)


def ap_oracle(ranked_hits):
    """Standard AP from a boolean hit list (junk already removed)."""
    hits = np.asarray(ranked_hits, bool)
    n_pos = hits.sum()
    precisions = np.cumsum(hits) / (np.arange(len(hits)) + 1)
    return float((precisions * hits).sum() / n_pos) if n_pos else 0.0


class TestComputeAP:
    def test_perfect_ranking(self):
        # positives at ranks 0..3 of 4 -> AP 1.0
        assert compute_ap(np.arange(4), 4) == pytest.approx(1.0)

    def test_single_positive_at_rank_r(self):
        # trapezoidal AP for one positive at 0-based rank r:
        # 0.5*(j/r + (j+1)/(r+1)) with j=0 -> 0.5*(0 + 1/(r+1)) for r>0
        assert compute_ap(np.array([0]), 1) == pytest.approx(1.0)
        assert compute_ap(np.array([4]), 1) == pytest.approx(0.5 * (0 + 1 / 5))

    def test_partial_recall(self):
        # 2 of 4 positives retrieved at ranks 0,1
        ap = compute_ap(np.array([0, 1]), 4)
        assert ap == pytest.approx(0.5)


class TestComputeMap:
    def test_no_junk_matches_standard_ap_up_to_trapezoid(self):
        # with positives exactly at the first ranks, trapezoid == standard AP
        ranks = np.array([[0, 1, 2, 3, 4]])
        gnd = [{"ok": np.array([0, 1]), "junk": np.empty(0)}]
        m, aps, _, _ = compute_map(ranks, gnd)
        assert m == pytest.approx(1.0)

    def test_junk_removal_shifts_positions(self):
        # db item 9 is junk and sits between the two positives
        ranks = np.array([[5, 9, 7, 1, 2]])
        gnd = [{"ok": np.array([5, 7]), "junk": np.array([9])}]
        m, _, _, _ = compute_map(ranks, gnd)
        # after junk removal the ranking is [5, 7, 1, 2]: positives at 0,1
        assert m == pytest.approx(1.0)

    def test_empty_query_excluded(self):
        ranks = np.array([[0, 1], [1, 0]])
        gnd = [
            {"ok": np.array([0]), "junk": np.empty(0)},
            {"ok": np.empty(0), "junk": np.empty(0)},
        ]
        m, aps, _, _ = compute_map(ranks, gnd)
        assert m == pytest.approx(1.0)
        assert np.isnan(aps[1])

    def test_precision_at_k(self):
        ranks = np.array([[3, 0, 1, 2, 4]])
        gnd = [{"ok": np.array([3, 1]), "junk": np.empty(0)}]
        _, _, pr, _ = compute_map(ranks, gnd, kappas=[1, 5])
        # pos (1-based) = [1, 3]; P@1: kq=min(3,1)=1 -> 1/1; P@5: kq=min(3,5)=3 -> 2/3
        np.testing.assert_allclose(pr, [1.0, 2 / 3])

    def test_no_retrieved_positive_does_not_crash(self):
        # reference evaluate.py:105 crashes here; evaluate_custom guards it
        ranks = np.array([[4, 5]])
        gnd = [{"ok": np.array([0]), "junk": np.empty(0)}]
        m, _, pr, _ = compute_map(ranks, gnd, kappas=[1])
        assert m == pytest.approx(0.0)
        assert pr[0] == 0.0

    def test_random_against_oracle_no_junk(self):
        rng = np.random.default_rng(0)
        N, nq = 60, 8
        ranks = np.stack([rng.permutation(N) for _ in range(nq)])
        gnd = [
            {"ok": rng.choice(N, size=6, replace=False), "junk": np.empty(0)}
            for _ in range(nq)
        ]
        m, aps, _, _ = compute_map(ranks, gnd)
        # trapezoidal AP <= standard AP (precision_0 <= precision_1 termwise)
        # and within a small gap at full recall
        for i in range(nq):
            hits = np.isin(ranks[i], gnd[i]["ok"])
            std = ap_oracle(hits)
            assert aps[i] <= std + 1e-9
            assert std - aps[i] < 0.15

    def test_junk_equivalence_to_filtered_ranking(self):
        """Junk-shift must equal deleting junk entries from the ranking."""
        rng = np.random.default_rng(1)
        N = 50
        for trial in range(10):
            ranks = np.stack([rng.permutation(N)])
            ok = rng.choice(N, size=5, replace=False)
            junk = rng.choice(np.setdiff1d(np.arange(N), ok), size=7, replace=False)
            m, _, _, _ = compute_map(ranks, [{"ok": ok, "junk": junk}])
            filtered = ranks[0][~np.isin(ranks[0], junk)]
            m_ref, _, _, _ = compute_map(
                filtered[None, :], [{"ok": ok, "junk": np.empty(0)}]
            )
            assert m == pytest.approx(m_ref)


class TestRevisited:
    def test_split_construction(self):
        # one query; easy at rank 0, hard at rank 1, junk at rank 2
        ranks = np.array([[0, 1, 2, 3]])
        gnd = [
            {
                "easy": np.array([0]),
                "hard": np.array([1]),
                "junk": np.array([2]),
                "bbx": None,
            }
        ]
        res = compute_map_revisited(ranks, gnd, "test")
        assert res.mapE == pytest.approx(1.0)  # easy: ok=[0] at rank 0
        assert res.mapM == pytest.approx(1.0)  # medium: ok=[0,1] at ranks 0,1
        # hard: ok=[1], junk=[2, easy 0] -> after removal rank 0 -> AP 1
        assert res.mapH == pytest.approx(1.0)
        assert "mAP E" in res.summary()

    def test_hard_split_junks_easy(self):
        # easy ranked first should NOT hurt the hard split
        ranks = np.array([[0, 5, 1, 3]])
        gnd = [{"easy": np.array([0]), "hard": np.array([1]), "junk": np.array([])}]
        res = compute_map_revisited(ranks, gnd, "t")
        # hard: ranking with easy-0 junked = [5, 1, 3], positive 1 at rank 1
        assert res.mapH == pytest.approx(compute_ap(np.array([1]), 1))


def test_map_custom_folder_protocol():
    paths_d = [f"/d/{label}/im{i}.jpg" for i, label in enumerate("aabbb")]
    paths_q = ["/q/a/q0.jpg", "/q/b/q1.jpg"]
    # query 0 retrieves [0(a), 2(b), 1(a)]: hits at 1 and 3 of K=3, 2 positives
    idx = np.array([[0, 2, 1], [2, 3, 4]])
    m = map_custom(3, idx, paths_q, paths_d)
    ap0 = (1 / 1 + 2 / 3) / 2
    ap1 = (1 / 1 + 2 / 2 + 3 / 3) / 3
    assert m == pytest.approx((ap0 + ap1) / 2)


def test_cal_map_labels():
    idx = np.array([[0, 1], [1, 0]])
    m = cal_map_labels(idx, labels_train=[1, 2], labels_test=[1, 2])
    # per reference formula: AP = sum(matched/(rank)/K); q0: 1/1/2; q1: 1/1/2
    assert m == pytest.approx(0.5)

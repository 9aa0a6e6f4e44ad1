"""Import the reference's *pipeline* modules as cross-stack oracles.

The reference search/re-rank/eval pipeline (``/root/reference/src/utils/``:
``nnsearch.py``, ``Reranking.py``, ``diffusion.py``, ``evaluate*.py``) is pure
numpy/scipy/torch logic wrapped in imports of native-backed libraries that are
not installed here (faiss, nanopq, annoy, progressbar, kornia). This module
installs *faithful minimal stubs* for those libraries — exact numpy flat search
for faiss, the public nanopq algorithm over scipy ``kmeans2``/``vq`` (the same
backend real nanopq wraps), no-op progress bars — so the reference's own code
runs unmodified on shared synthetic inputs.

The stubs implement the public contracts of the stubbed libraries; they contain
NO reference code. Stub fidelity notes:

- ``faiss.IndexFlatL2`` returns **squared** L2 distances (faiss convention);
  ``IndexFlatIP`` returns inner products, both top-k descending-quality order.
- ``nanopq.PQ`` follows the documented nanopq algorithm
  (https://nanopq.readthedocs.io): per-subspace ``scipy.cluster.vq.kmeans2``
  with ``minit='points'``, encode via ``vq``, ``dtable(q).adist(codes)``
  asymmetric distances. Real nanopq calls the same scipy kmeans2.
- Index types the tests never exercise (IVFPQ/LSH/HNSWFlat, AnnoyIndex) raise
  on use so accidental reliance is loud.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

from reference_oracle import _install_loftr_stubs, _install_torchvision_stub


# ---------------------------------------------------------------------------
# faiss stub: exact flat indexes with the faiss return contract
# ---------------------------------------------------------------------------


class _FlatIndexBase:
    def __init__(self, d):
        self.d = d
        self._chunks = []

    def add(self, x):
        self._chunks.append(np.ascontiguousarray(x, dtype=np.float32))

    @property
    def _db(self):
        return (
            np.concatenate(self._chunks, axis=0)
            if self._chunks
            else np.zeros((0, self.d), np.float32)
        )

    def search(self, q, k):
        q = np.ascontiguousarray(q, dtype=np.float32)
        scores = self._scores(q, self._db)          # larger = better
        k = min(k, scores.shape[1])
        ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        best = np.take_along_axis(scores, ids, axis=1)
        return self._to_faiss_metric(best), ids.astype(np.int64)


class _IndexFlatIP(_FlatIndexBase):
    def _scores(self, q, db):
        return q @ db.T

    def _to_faiss_metric(self, best):
        return best  # inner product, descending


class _IndexFlatL2(_FlatIndexBase):
    def _scores(self, q, db):
        # negative squared L2 so larger = better
        qq = np.sum(q * q, axis=1, keepdims=True)
        dd = np.sum(db * db, axis=1)[None, :]
        return -(qq - 2.0 * (q @ db.T) + dd)

    def _to_faiss_metric(self, best):
        return -best  # faiss returns squared L2, ascending


def _unavailable(name):
    class _Raise:
        def __init__(self, *a, **k):
            raise RuntimeError(f"{name} stub: not implemented in this environment")

    return _Raise


def _install_faiss_stub():
    if "faiss" in sys.modules:
        return
    try:
        import faiss  # noqa: F401

        return
    except ImportError:
        pass
    m = types.ModuleType("faiss")
    m.IndexFlatIP = _IndexFlatIP
    m.IndexFlatL2 = _IndexFlatL2
    for name in ("IndexIVFPQ", "IndexLSH", "IndexPQ", "IndexHNSWFlat", "IndexHNSWPQ"):
        setattr(m, name, _unavailable(f"faiss.{name}"))
    sys.modules["faiss"] = m


# ---------------------------------------------------------------------------
# nanopq stub: the documented nanopq PQ algorithm over scipy kmeans2/vq
# ---------------------------------------------------------------------------


class _DistanceTable:
    def __init__(self, dtable):
        self.dtable = dtable  # (M, Ks) squared L2 per subspace

    def adist(self, codes):
        M = self.dtable.shape[0]
        return np.sum(self.dtable[np.arange(M)[None, :], codes], axis=1)


class _NanoPQ:
    def __init__(self, M, Ks=256, verbose=False):
        self.M, self.Ks, self.verbose = M, Ks, verbose
        self.codewords = None
        self.Ds = None
        self.code_dtype = (
            np.uint8 if Ks <= 2**8 else (np.uint16 if Ks <= 2**16 else np.uint32)
        )

    def fit(self, vecs, iter=20, seed=123, minit="points"):
        from scipy.cluster.vq import kmeans2

        N, D = vecs.shape
        assert D % self.M == 0
        self.Ds = D // self.M
        np.random.seed(seed)
        self.codewords = np.zeros((self.M, self.Ks, self.Ds), np.float32)
        for m in range(self.M):
            sub = vecs[:, m * self.Ds : (m + 1) * self.Ds]
            self.codewords[m], _ = kmeans2(sub, self.Ks, iter=iter, minit=minit)
        return self

    def encode(self, vecs):
        from scipy.cluster.vq import vq

        N = vecs.shape[0]
        codes = np.empty((N, self.M), dtype=self.code_dtype)
        for m in range(self.M):
            sub = vecs[:, m * self.Ds : (m + 1) * self.Ds]
            codes[:, m], _ = vq(sub, self.codewords[m])
        return codes

    def decode(self, codes):
        N = codes.shape[0]
        out = np.empty((N, self.Ds * self.M), np.float32)
        for m in range(self.M):
            out[:, m * self.Ds : (m + 1) * self.Ds] = self.codewords[m][codes[:, m]]
        return out

    def dtable(self, query):
        dt = np.empty((self.M, self.Ks), np.float32)
        for m in range(self.M):
            qs = query[m * self.Ds : (m + 1) * self.Ds]
            diff = self.codewords[m] - qs[None, :]
            dt[m] = np.sum(diff * diff, axis=1)
        return _DistanceTable(dt)


def _install_nanopq_stub():
    if "nanopq" in sys.modules:
        return
    try:
        import nanopq  # noqa: F401

        return
    except ImportError:
        pass
    m = types.ModuleType("nanopq")
    m.PQ = _NanoPQ
    m.OPQ = _unavailable("nanopq.OPQ")
    sys.modules["nanopq"] = m


# ---------------------------------------------------------------------------
# progressbar / annoy / kornia.feature / kornia_moons stubs
# ---------------------------------------------------------------------------


class _NoOpBar:
    def __init__(self, *a, **k):
        pass

    def start(self):
        return self

    def update(self, *a):
        pass

    def finish(self):
        pass


def _install_progressbar_stub():
    if "progressbar" in sys.modules:
        return
    try:
        import progressbar  # noqa: F401

        return
    except ImportError:
        pass
    m = types.ModuleType("progressbar")
    m.ProgressBar = _NoOpBar
    for w in ("Percentage", "Bar", "Timer", "ETA", "SimpleProgress"):
        setattr(m, w, lambda *a, **k: "")
    # the reference's nnsearch.py reaches `os` through `from progressbar
    # import *` (real progressbar2 re-exports it; SURVEY.md fidelity note)
    m.os = os
    sys.modules["progressbar"] = m


def _install_annoy_stub():
    if "annoy" in sys.modules:
        return
    try:
        import annoy  # noqa: F401

        return
    except ImportError:
        pass
    m = types.ModuleType("annoy")
    m.AnnoyIndex = _unavailable("annoy.AnnoyIndex")
    sys.modules["annoy"] = m


def _install_kornia_feature_stubs():
    """Reranking.py imports kornia.feature and star-imports kornia_moons."""
    _install_loftr_stubs()  # installs base kornia modules
    import importlib

    kornia = sys.modules.get("kornia")
    if kornia is not None and not hasattr(kornia, "feature"):
        feat = types.ModuleType("kornia.feature")
        kornia.feature = feat
        sys.modules["kornia.feature"] = feat
    if "kornia_moons" not in sys.modules:
        try:
            importlib.import_module("kornia_moons")
        except ImportError:
            km = types.ModuleType("kornia_moons")
            kmf = types.ModuleType("kornia_moons.feature")
            kmf.__all__ = []
            km.feature = kmf
            sys.modules["kornia_moons"] = km
            sys.modules["kornia_moons.feature"] = kmf


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------


def _ref_on_path():
    os.environ.setdefault("MPLBACKEND", "Agg")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def load_reference_nnsearch():
    """``src.utils.nnsearch``: matching_L2 / matching_Nano_PQ / HNSW class."""
    _ref_on_path()
    _install_torchvision_stub()
    _install_faiss_stub()
    _install_nanopq_stub()
    _install_annoy_stub()
    _install_progressbar_stub()
    # torchvision stub needs a CIFAR10 attribute (nnsearch.py imports it)
    tvd = sys.modules.get("torchvision.datasets")
    if tvd is not None and not hasattr(tvd, "CIFAR10"):
        tvd.CIFAR10 = _unavailable("torchvision.datasets.CIFAR10")
    import src.utils.nnsearch as nnsearch

    return nnsearch


def load_reference_evaluate():
    """``evaluate`` + ``evaluate2`` + ``evaluate_custom`` (pure numpy)."""
    _ref_on_path()
    import src.utils.evaluate as evaluate
    import src.utils.evaluate2 as evaluate2
    import src.utils.evaluate_custom as evaluate_custom

    return evaluate, evaluate2, evaluate_custom


def load_reference_diffusion():
    """``src.utils.diffusion.Diffusion`` with the exact-KNN faiss stub."""
    _ref_on_path()
    _install_faiss_stub()
    import src.utils.diffusion as diffusion

    return diffusion


def load_reference_reranking():
    """``src.utils.Reranking``: qge1 / QGE / AQE / DBA / kr_reranking."""
    load_reference_nnsearch()
    _install_kornia_feature_stubs()
    import src.utils.Reranking as Reranking

    return Reranking

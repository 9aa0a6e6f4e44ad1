"""Search backends with a uniform build/search/save/load contract."""

from .base import load_index, normalize_rows, save_index
from .flat import FlatIndex, Int8FlatIndex, build_flat, build_flat_i8
from .pq import PQIndex, build_pq
from .ivfpq import IVFPQIndex, build_ivfpq
from .hnsw import HNSWIndex, HNSWPQIndex, build_hnsw, build_hnsw_pq
from .rpforest import RPForestIndex, build_rpforest
from .graph_build import build_hnsw_tpu

__all__ = [
    "load_index", "normalize_rows", "save_index",
    "FlatIndex", "Int8FlatIndex", "build_flat", "build_flat_i8",
    "PQIndex", "build_pq",
    "IVFPQIndex", "build_ivfpq",
    "HNSWIndex", "HNSWPQIndex", "build_hnsw", "build_hnsw_pq",
    "RPForestIndex", "build_rpforest",
    "build_hnsw_tpu",
]

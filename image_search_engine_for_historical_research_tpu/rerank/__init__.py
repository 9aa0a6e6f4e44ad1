"""Re-ranking: query expansion, kNN-graph diffusion, k-reciprocal."""

from .qe import (
    average_query_expansion,
    database_augmentation,
    feature_enhancement,
    qge1,
)
from .diffusion import (
    DiffusionOffline,
    build_diffusion_offline,
    diffusion_online_scores,
    diffusion_rerank,
)
from .kr import kr_rerank, kr_rerank_scores
from .geometric import (
    LocalFeatures,
    loftr_rerank,
    make_verifier,
    rerank_by_inliers,
    sift_extract,
    sift_offline,
    sift_rerank,
)

__all__ = [
    "average_query_expansion", "database_augmentation", "feature_enhancement", "qge1",
    "DiffusionOffline", "build_diffusion_offline", "diffusion_online_scores",
    "diffusion_rerank",
    "kr_rerank", "kr_rerank_scores",
    "LocalFeatures", "loftr_rerank", "make_verifier", "rerank_by_inliers",
    "sift_extract", "sift_offline", "sift_rerank",
]

"""Numeric kernels: pooling, normalization, losses, whitening, top-k search."""

from .normalization import l2n, powerlaw
from .pooling import gem, mac, rmac, roipool, spoc
from .losses import contrastive_loss, sos_loss, triplet_loss
from .whiten import pcawhitenlearn, whitenapply, whitenlearn
from .int8 import int8_topk, int8_topk_rerank, quantize_rows_int8
from .topk import exact_ranks, exact_scores, exact_topk, streaming_exact_topk
from .sift import make_sharded_sift_fn, sift_extract_batch, sift_program

__all__ = [
    "l2n", "powerlaw",
    "gem", "mac", "rmac", "roipool", "spoc",
    "contrastive_loss", "sos_loss", "triplet_loss",
    "pcawhitenlearn", "whitenapply", "whitenlearn",
    "exact_ranks", "exact_scores", "exact_topk", "streaming_exact_topk",
    "int8_topk", "int8_topk_rerank", "quantize_rows_int8",
    "make_sharded_sift_fn", "sift_extract_batch", "sift_program",
]

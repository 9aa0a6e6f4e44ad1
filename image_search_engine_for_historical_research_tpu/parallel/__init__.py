"""Device-mesh parallelism: mesh helpers and sharded search collectives."""

from .mesh import data_mesh, replicate, shard_batch
from .topk import sharded_exact_topk

__all__ = ["data_mesh", "replicate", "shard_batch", "sharded_exact_topk"]

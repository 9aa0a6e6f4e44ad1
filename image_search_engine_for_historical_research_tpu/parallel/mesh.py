"""Mesh construction and sharding helpers.

The TPU-native replacement for the reference's parallelism (SURVEY.md section 2.5):
``nn.DataParallel`` replication (main_train.py:472) and detectron2-style NCCL
comm (src/utils/src/utils/comm.py) become a ``jax.sharding.Mesh`` over ICI with
``NamedSharding`` annotations; XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    Axis type is pinned to Auto (classic GSPMD): this codebase shards with
    jit in/out_shardings + with_sharding_constraint, and newer jax's
    Explicit default would stamp mesh-typed avals onto build outputs,
    breaking their use in later single-device jits (e.g. the diffusion
    artifact consumed by ``diffusion_online_scores``)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    try:
        from jax.sharding import AxisType

        return jax.make_mesh(
            (n,), (axis,), devices=devs[:n], axis_types=(AxisType.Auto,)
        )
    except (ImportError, TypeError):
        return jax.make_mesh((n,), (axis,), devices=devs[:n])


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place ``x`` with its leading dim sharded over ``axis``."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    """Place ``x`` fully replicated on ``mesh``."""
    return jax.device_put(x, NamedSharding(mesh, P()))

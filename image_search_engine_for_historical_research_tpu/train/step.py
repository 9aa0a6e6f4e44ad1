"""Jitted training step over retrieval tuples.

TPU-native counterpart of the reference's inner training loop
(``/root/reference/src/main_train.py:478-529``): the reference iterates tuples
one at a time under ``nn.DataParallel`` and accumulates grads with
``--update-every``; here a whole batch of tuples is one jitted, mesh-sharded
step — images sharded over the batch axis, parameters replicated, XLA inserting
the gradient ``psum`` (the collective the reference gets from DataParallel's
gather + backward).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.losses import contrastive_loss, sos_loss, triplet_loss


class TrainState(NamedTuple):
    params: Any      # full variables dict {'params', 'batch_stats'}
    opt_state: Any
    step: jnp.ndarray


def make_loss_fn(
    module,
    S: int,
    loss: str = "contrastive",
    margin: float = 0.7,
    lambda_sos: float = 0.0,
):
    """Loss over a flat tuple batch (B*S images, labels -1/1/0).

    ``--loss contrastive --sos`` in the reference adds ``lambda * sos_loss``
    (main_train.py:241-251).
    """

    def loss_fn(variables, images, labels, mask=None):
        vecs = module.apply(variables, images, mask)  # (B*S, D)
        if loss == "contrastive":
            value = contrastive_loss(vecs, labels, margin=margin, S=S)
        elif loss == "triplet":
            value = triplet_loss(vecs, labels, margin=margin, S=S)
        else:
            raise ValueError(f"unknown loss: {loss}")
        if lambda_sos:
            value = value + lambda_sos * sos_loss(vecs, labels, S=S)
        return value

    return loss_fn


def make_train_step(
    module,
    tx: optax.GradientTransformation,
    S: int,
    loss: str = "contrastive",
    margin: float = 0.7,
    lambda_sos: float = 0.0,
    mesh=None,
    batch_axis: str = "data",
):
    """Build ``step(state, images, labels, mask) -> (state, loss)``.

    With ``mesh``, inputs are batch-sharded and parameters replicated (the
    sharded-extraction layout from ``models.extract.make_sharded_extract_fn``);
    without, a plain single-device jit.
    """
    loss_fn = make_loss_fn(module, S, loss=loss, margin=margin, lambda_sos=lambda_sos)

    def _step(state: TrainState, images, labels, mask=None):
        def compute(variables):
            return loss_fn(variables, images, labels, mask)

        value, grads = jax.value_and_grad(compute)(state.params)
        # optimizer only updates the 'params' collection
        updates, new_opt = tx.update(
            grads["params"], state.opt_state, state.params["params"]
        )
        new_params = dict(state.params)
        new_params["params"] = optax.apply_updates(state.params["params"], updates)
        return TrainState(new_params, new_opt, state.step + 1), value

    if mesh is None:
        return jax.jit(_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(batch_axis))
    state_sh = TrainState(params=repl, opt_state=repl, step=repl)
    return jax.jit(
        _step,
        in_shardings=(state_sh, batch, batch, batch),
        out_shardings=(state_sh, repl),
    )


def init_train_state(variables, tx) -> TrainState:
    return TrainState(
        params=variables,
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

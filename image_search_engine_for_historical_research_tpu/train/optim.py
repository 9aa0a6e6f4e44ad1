"""Optimizer construction with the reference's parameter-group policy.

TPU-native counterpart of the param-group logic in
``/root/reference/src/main_train.py:253-305``:

- when SOA training is on, conv1..conv4 (and their BNs) are frozen — the
  reference wraps them in ``no_grad`` (networks.py:194-198) and excludes them
  from param groups; here they get a ``zero`` transform via ``multi_transform``;
- the GeM exponent ``p`` trains at ``100 x lr`` with no weight decay
  (main_train.py:279-284);
- Adam (or SGD) with exponential LR decay ``exp(-decay * epoch)``
  (main_train.py:297-305).
"""

from __future__ import annotations

from typing import Any

import jax
import optax

FROZEN_PREFIXES = ("conv1", "bn1", "layer1", "layer2", "layer3")
# layer3 == reference conv4_x; everything before soa4/conv5_x is frozen


def param_labels(params: Any, freeze_backbone: bool = True) -> Any:
    """Label tree: 'frozen' (conv1-4), 'gem_p', or 'train'."""

    def label(path, _):
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any(k == "gem_p" for k in keys):
            return "gem_p"
        if freeze_backbone and "features" in keys:
            # only the module directly under 'features' decides the group
            # (block-internal conv1/bn1 keys must not match the stem prefixes)
            child = keys[keys.index("features") + 1]
            if any(child.startswith(pref) for pref in FROZEN_PREFIXES):
                return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    params: Any,
    lr: float = 1e-6,
    weight_decay: float = 1e-6,
    exp_decay: float = 0.01,
    epochs_per_step: float = 0.0,
    freeze_backbone: bool = True,
    optimizer: str = "adam",
    gem_p_lr_mult: float = 100.0,
):
    """Build the multi-group optax transform (main_train.py:253-305).

    ``exp_decay`` applies per *epoch* in the reference; pass ``epochs_per_step``
    (1/steps_per_epoch) to map it onto optimizer steps, or 0 for constant LR.
    """

    def schedule(base):
        if epochs_per_step <= 0 or exp_decay <= 0:
            return base
        return lambda step: base * jax.numpy.exp(-exp_decay * step * epochs_per_step)

    def base_tx(base_lr, wd):
        if optimizer == "adam":
            tx = optax.adamw(schedule(base_lr), weight_decay=wd) if wd else optax.adam(schedule(base_lr))
        elif optimizer == "sgd":
            tx = optax.sgd(schedule(base_lr), momentum=0.9)
            if wd:
                tx = optax.chain(optax.add_decayed_weights(wd), tx)
        else:
            raise ValueError(f"unknown optimizer: {optimizer}")
        return tx

    labels = param_labels(params, freeze_backbone)
    tx = optax.multi_transform(
        {
            "train": base_tx(lr, weight_decay),
            "gem_p": base_tx(lr * gem_p_lr_mult, 0.0),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, labels

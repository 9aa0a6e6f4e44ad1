"""Torch-checkpoint -> Flax parameter conversion.

The reference distributes pretrained weights as torch ``state_dict`` checkpoints
(``data/networks/resnet101-solar-best.pth``; loader at
``/root/reference/src/utils/networks.py:7-30``). This module converts that exact
key layout into our Flax variable tree so the same weights drive the TPU model.

Key layout in the SOLAR checkpoint (module tree of ``SOLAR_Global_Retrieval`` +
``ResNetSOAs``, networks.py:149-183):

- ``features.conv1.0/1``                      -> stem conv + BN
- ``features.conv2_x.2.<i>.*``                -> layer1 block i (children [relu, maxpool, layer1])
- ``features.conv3_x.<i>.*``                  -> layer2 block i
- ``features.conv4_x.<i>.*``                  -> layer3 block i
- ``features.conv5_x.<i>.*``                  -> layer4 block i
- ``features.soa4/soa5.{f,g}.{0,1}``, ``.h``, ``.v`` -> SOA projections
- ``whiten.weight/bias``                      -> final whitening Dense
- ``pool.p``                                  -> GeM exponent

Transposes: torch conv ``(O, I, kh, kw)`` -> flax ``(kh, kw, I, O)``; torch linear
``(O, I)`` -> flax ``(I, O)``.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _as_numpy(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _convert_bn(sd, prefix, out_params, out_stats, path):
    _set(out_params, path + ("scale",), _as_numpy(sd[prefix + ".weight"]))
    _set(out_params, path + ("bias",), _as_numpy(sd[prefix + ".bias"]))
    _set(out_stats, path + ("mean",), _as_numpy(sd[prefix + ".running_mean"]))
    _set(out_stats, path + ("var",), _as_numpy(sd[prefix + ".running_var"]))


def _convert_conv(sd, prefix, out_params, path, bias: bool):
    _set(out_params, path + ("kernel",), _conv_kernel(_as_numpy(sd[prefix + ".weight"])))
    if bias:
        _set(out_params, path + ("bias",), _as_numpy(sd[prefix + ".bias"]))


def _convert_bottleneck(sd, prefix, out_params, out_stats, path):
    for i in (1, 2, 3):
        _convert_conv(sd, f"{prefix}.conv{i}", out_params, path + (f"conv{i}",), False)
        _convert_bn(sd, f"{prefix}.bn{i}", out_params, out_stats, path + (f"bn{i}",))
    if f"{prefix}.downsample.0.weight" in sd:
        _convert_conv(sd, f"{prefix}.downsample.0", out_params, path + ("downsample_conv",), False)
        _convert_bn(sd, f"{prefix}.downsample.1", out_params, out_stats, path + ("downsample_bn",))


def _convert_soa(sd, prefix, out_params, out_stats, path):
    for proj in ("f", "g"):
        _convert_conv(sd, f"{prefix}.{proj}.0", out_params, path + (f"{proj}_conv",), True)
        _convert_bn(sd, f"{prefix}.{proj}.1", out_params, out_stats, path + (f"{proj}_bn",))
    _convert_conv(sd, f"{prefix}.h", out_params, path + ("h_conv",), True)
    _convert_conv(sd, f"{prefix}.v", out_params, path + ("v_conv",), True)


# stage name in checkpoint -> (our layer index, key prefix inside the stage)
_STAGES = {
    "conv2_x": (1, "conv2_x.2"),  # Sequential(relu, maxpool, layer1)
    "conv3_x": (2, "conv3_x"),
    "conv4_x": (3, "conv4_x"),
    "conv5_x": (4, "conv5_x"),
}


def convert_solar_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a SOLAR torch state_dict into a Flax variables dict.

    Returns ``{"params": ..., "batch_stats": ...}`` matching ``SolarRetrieval``.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    feat = ("features",)

    _convert_conv(sd, "features.conv1.0", params, feat + ("conv1",), False)
    _convert_bn(sd, "features.conv1.1", params, stats, feat + ("bn1",))

    for stage_name, (layer_idx, key_prefix) in _STAGES.items():
        blocks = set()
        probe = f"features.{key_prefix}."
        for k in sd:
            if k.startswith(probe):
                blocks.add(int(k[len(probe):].split(".")[0]))
        for b in sorted(blocks):
            _convert_bottleneck(
                sd, f"features.{key_prefix}.{b}", params, stats,
                feat + (f"layer{layer_idx}_block{b}",),
            )

    for soa in ("soa4", "soa5"):
        if f"features.{soa}.h.weight" in sd:
            _convert_soa(sd, f"features.{soa}", params, stats, feat + (soa,))

    if "whiten.weight" in sd:
        _set(params, ("whiten", "kernel"), _as_numpy(sd["whiten.weight"]).T)
        _set(params, ("whiten", "bias"), _as_numpy(sd["whiten.bias"]))
    if "lwhiten.weight" in sd:
        _set(params, ("lwhiten", "kernel"), _as_numpy(sd["lwhiten.weight"]).T)
        _set(params, ("lwhiten", "bias"), _as_numpy(sd["lwhiten.bias"]))
    if "pool.p" in sd:
        _set(params, ("gem_p",), _as_numpy(sd["pool.p"]).reshape(()))
    # regional nets: pool is Rpool(rpool=GeM, whiten=Linear) — the GeM p
    # lives at pool.rpool.p and the per-region whitening at pool.whiten
    # (imageretrievalnet.py:295-312, layers/pooling.py:77-113)
    if "pool.rpool.p" in sd:
        _set(params, ("gem_p",), _as_numpy(sd["pool.rpool.p"]).reshape(()))
    if "pool.whiten.weight" in sd:
        _set(params, ("rwhiten", "kernel"), _as_numpy(sd["pool.whiten.weight"]).T)
        _set(params, ("rwhiten", "bias"), _as_numpy(sd["pool.whiten.bias"]))

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str):
    """Load a reference checkpoint file (utils/networks.py:7-30 layout).

    Accepts either a bare state_dict or the training-checkpoint dict with
    ``meta``/``state_dict`` entries; returns ``(variables, meta_or_None)``.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    meta = None
    sd = ckpt
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        meta = ckpt.get("meta")
        sd = ckpt["state_dict"]
    return convert_solar_state_dict(sd), meta


def assert_tree_shapes_match(converted, initialized):
    """Raise with a readable diff when converted params mismatch the module."""
    import jax

    c_flat = jax.tree_util.tree_leaves_with_path(converted)
    i_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(initialized)
    }
    problems = []
    for p, v in c_flat:
        key = jax.tree_util.keystr(p)
        if key not in i_paths:
            problems.append(f"unexpected key {key}")
        elif tuple(i_paths[key]) != tuple(v.shape):
            problems.append(f"shape mismatch {key}: ckpt {v.shape} vs model {i_paths[key]}")
    missing = set(i_paths) - {jax.tree_util.keystr(p) for p, _ in c_flat}
    for key in sorted(missing):
        problems.append(f"missing key {key}")
    if problems:
        raise ValueError("checkpoint/model mismatch:\n" + "\n".join(problems))

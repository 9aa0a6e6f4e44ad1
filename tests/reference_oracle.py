"""Import the reference torch model as a numerical oracle.

The environment ships torch but not torchvision, and the reference model code
(``/root/reference/src/networks/networks.py:149-211``) builds its backbone via
``vars(torchvision.models)[architecture](pretrained=True)``. To run the real
reference module as an oracle without egress, we inject a minimal ``torchvision``
stub whose ResNet factories reproduce torchvision's architecture exactly
(v1.5 bottleneck: stride on the 3x3 conv; children order conv1,bn1,relu,maxpool,
layer1-4,avgpool,fc) with random init — the reference code then runs unmodified.

This file contains NO reference code: it is a from-scratch torch ResNet written
to the public torchvision layout (which the reference checkpoint key schema also
fixes: conv1/bn1/.../downsample.0/downsample.1).
"""

from __future__ import annotations

import os
import sys
import types

import torch
import torch.nn as nn


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNet(nn.Module):
    def __init__(self, blocks_per_stage):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, blocks_per_stage[0], 1)
        self.layer2 = self._make_layer(128, blocks_per_stage[1], 2)
        self.layer3 = self._make_layer(256, blocks_per_stage[2], 2)
        self.layer4 = self._make_layer(512, blocks_per_stage[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * 4, 1000)

    def _make_layer(self, planes, n_blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, n_blocks):
            layers.append(_Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):  # unused by the reference retrieval path
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


_ARCHS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


def _factory(blocks):
    def make(pretrained=False, **kwargs):  # pretrained flag ignored: random init
        return _ResNet(blocks)

    return make


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    try:
        import torchvision  # noqa: F401

        return  # real torchvision present
    except ImportError:
        pass
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    for name, blocks in _ARCHS.items():
        setattr(models, name, _factory(blocks))
    tv.models = models
    tv.transforms = types.ModuleType("torchvision.transforms")
    tv.datasets = types.ModuleType("torchvision.datasets")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = tv.transforms
    sys.modules["torchvision.datasets"] = tv.datasets


def _install_loftr_stubs():
    """Stub kornia (two small functions) and yacs so the vendored torch LoFTR
    imports; neither package is installed here."""
    if "kornia" not in sys.modules:
        try:
            import kornia  # noqa: F401
        except ImportError:
            kornia = types.ModuleType("kornia")
            geometry = types.ModuleType("kornia.geometry")
            subpix = types.ModuleType("kornia.geometry.subpix")
            dsnt = types.ModuleType("kornia.geometry.subpix.dsnt")
            utils = types.ModuleType("kornia.utils")
            grid_mod = types.ModuleType("kornia.utils.grid")

            def create_meshgrid(height, width, normalized_coordinates=True,
                                device=None, dtype=None):
                if normalized_coordinates:
                    xs = torch.linspace(-1.0, 1.0, width)
                    ys = torch.linspace(-1.0, 1.0, height)
                else:
                    xs = torch.arange(width, dtype=torch.float32)
                    ys = torch.arange(height, dtype=torch.float32)
                gy, gx = torch.meshgrid(ys, xs, indexing="ij")
                return torch.stack([gx, gy], dim=-1)[None]  # (1, H, W, 2) x,y

            def spatial_expectation2d(heatmap, normalized_coordinates=True):
                B, N, H, W = heatmap.shape
                grid = create_meshgrid(H, W, normalized_coordinates).reshape(1, 1, H * W, 2)
                return torch.sum(
                    heatmap.reshape(B, N, H * W, 1) * grid, dim=2
                )  # (B, N, 2)

            dsnt.spatial_expectation2d = spatial_expectation2d
            grid_mod.create_meshgrid = create_meshgrid
            utils.create_meshgrid = create_meshgrid
            utils.grid = grid_mod
            geometry.subpix = subpix
            subpix.dsnt = dsnt
            kornia.geometry = geometry
            kornia.utils = utils
            for name, mod in [
                ("kornia", kornia), ("kornia.geometry", geometry),
                ("kornia.geometry.subpix", subpix),
                ("kornia.geometry.subpix.dsnt", dsnt),
                ("kornia.utils", utils), ("kornia.utils.grid", grid_mod),
            ]:
                sys.modules[name] = mod

    if "yacs" not in sys.modules:
        try:
            import yacs  # noqa: F401
        except ImportError:
            yacs_mod = types.ModuleType("yacs")
            config_mod = types.ModuleType("yacs.config")

            class CfgNode(dict):
                def __getattr__(self, k):
                    try:
                        return self[k]
                    except KeyError as e:
                        raise AttributeError(k) from e

                def __setattr__(self, k, v):
                    self[k] = v

                def clone(self):
                    import copy

                    return copy.deepcopy(self)

            config_mod.CfgNode = CfgNode
            yacs_mod.config = config_mod
            sys.modules["yacs"] = yacs_mod
            sys.modules["yacs.config"] = config_mod


def load_reference_loftr():
    """Import the vendored torch LoFTR (``src/utils/src/loftr``) with stubs."""
    os.environ.setdefault("MPLBACKEND", "Agg")
    _install_loftr_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.utils.src.loftr import LoFTR, default_cfg

    return LoFTR, default_cfg


def load_reference_retrieval_module():
    """Import ``src.networks.imageretrievalnet`` from /root/reference (read-only)."""
    os.environ.setdefault("MPLBACKEND", "Agg")
    _install_torchvision_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import src.networks.imageretrievalnet as iret

    return iret


def randomize_solar_(net: torch.nn.Module, seed: int = 0) -> None:
    """Make every parity-relevant tensor non-trivial, in place.

    Torch's fresh init leaves BN as an identity transform (scale 1, bias 0,
    mean 0, var 1) and zero-inits the SOA ``v`` conv (networks.py:121), which
    would mask conversion bugs in exactly those tensors. Perturb them (and GeM p)
    with bounded magnitudes so activations stay finite through 100+ layers.
    """
    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for key, t in sd.items():
        if not t.dtype.is_floating_point:
            continue
        if key.endswith("running_var"):
            t.copy_(0.5 + torch.rand(t.shape, generator=g))
        elif key.endswith("running_mean"):
            t.copy_(0.2 * torch.randn(t.shape, generator=g))
        elif (
            ".bn" in key
            or "downsample.1" in key
            or "conv1.1." in key  # stem BN (features.conv1.1)
            or ".f.1." in key
            or ".g.1." in key  # SOA projection BNs
        ):
            if key.endswith("weight"):
                t.copy_(0.5 + torch.rand(t.shape, generator=g))
            elif key.endswith("bias"):
                t.copy_(0.2 * torch.randn(t.shape, generator=g))
        elif key.endswith("pool.p"):
            t.fill_(2.8)
        elif ".v." in key:  # zero-initialized SOA value conv: make it live
            t.copy_(0.05 * torch.randn(t.shape, generator=g))

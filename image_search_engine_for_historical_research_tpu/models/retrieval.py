"""The SOLAR global-retrieval descriptor model.

TPU-native counterpart of ``SOLAR_Global_Retrieval`` and ``init_network``
(``/root/reference/src/networks/imageretrievalnet.py:156-354``): ResNet+SOA
features -> (optional per-position local whitening) -> pooling (GeM default,
learnable p) -> L2N -> (optional whitening Linear D->D) -> L2N. Returns row-major
``(B, D)`` descriptors (the reference returns un-transposed for DataParallel
gather; row-major is our global convention).

Also carries the reference's ``meta`` dict contract (imageretrievalnet.py:338-349)
so checkpoints are self-describing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import normalization, pooling
from .resnet import ResNetSOA, STAGE_BLOCKS

OUTPUT_DIM = {  # imageretrievalnet.py:81-98 (resnet family only; others N/A here)
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)  # imageretrievalnet.py:228-229
IMAGENET_STD = (0.229, 0.224, 0.225)


class SolarRetrieval(nn.Module):
    """features -> pool -> l2n -> whiten -> l2n (imageretrievalnet.py:168-194)."""

    architecture: str = "resnet101"
    pooling: str = "gem"
    soa_layers: str = "45"
    whitening: bool = True
    local_whitening: bool = False
    p_init: float = 3.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        feats, fmask = ResNetSOA(
            architecture=self.architecture, soa_layers=self.soa_layers,
            name="features",
        )(x, mask)

        if self.local_whitening:
            feats = nn.Dense(feats.shape[-1], name="lwhiten")(feats)

        if self.pooling == "gem":
            p = self.param("gem_p", nn.initializers.constant(self.p_init), ())
            v = pooling.gem(feats, p, mask=fmask)
        elif self.pooling == "gemmp":
            p = self.param(
                "gem_p", nn.initializers.constant(self.p_init), (feats.shape[-1],)
            )
            v = pooling.gem(feats, p, mask=fmask)
        elif self.pooling == "mac":
            v = pooling.mac(feats, mask=fmask)
        elif self.pooling == "spoc":
            v = pooling.spoc(feats, mask=fmask)
        elif self.pooling == "rmac":
            v = pooling.rmac(feats)  # rmac grid assumes full-extent maps
        else:
            raise ValueError(f"unknown pooling: {self.pooling}")

        v = normalization.l2n(v)
        if self.whitening:
            v = nn.Dense(v.shape[-1], name="whiten")(v)
            v = normalization.l2n(v)
        return v


@dataclass
class RetrievalModel:
    """Bundled module + params + meta (the reference's net.meta contract)."""

    module: SolarRetrieval
    params: Any
    meta: Dict[str, Any] = field(default_factory=dict)

    def apply(self, images: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        return self.module.apply(self.params, images, mask)

    @property
    def outputdim(self) -> int:
        return self.meta["outputdim"]


def init_network(params: Optional[Dict[str, Any]] = None, rng=None) -> RetrievalModel:
    """Factory mirroring the reference ``init_network`` (imageretrievalnet.py:219-354).

    ``params`` keys (all optional, reference defaults): architecture, pooling, p,
    whitening, local_whitening, soa, soa_layers, mean, std, pretrained_type, mode.
    Weights are randomly initialized; converted torch checkpoints are loaded via
    ``models.weights.load_torch_checkpoint``.
    """
    params = dict(params or {})
    architecture = params.get("architecture", "resnet101")
    pooling_name = params.get("pooling", "gem")
    p = params.get("p", 3.0)
    whitening = params.get("whitening", True)
    local_whitening = params.get("local_whitening", False)
    soa = params.get("soa", True)
    soa_layers = params.get("soa_layers", "45") if soa else ""
    mean = params.get("mean", list(IMAGENET_MEAN))
    std = params.get("std", list(IMAGENET_STD))

    if architecture not in STAGE_BLOCKS:
        raise ValueError(f"unsupported architecture: {architecture}")

    module = SolarRetrieval(
        architecture=architecture,
        pooling=pooling_name,
        soa_layers=soa_layers,
        whitening=whitening,
        local_whitening=local_whitening,
        p_init=float(p),
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(rng, dummy)

    meta = {
        "architecture": architecture,
        "local_whitening": local_whitening,
        "pooling": pooling_name,
        "regional": False,
        "whitening": whitening,
        "mean": mean,
        "std": std,
        "outputdim": OUTPUT_DIM[architecture],
        "soa": soa,
        "soa_layers": soa_layers,
    }
    return RetrievalModel(module=module, params=variables, meta=meta)

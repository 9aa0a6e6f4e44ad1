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
    """features -> pool -> l2n -> whiten -> l2n (imageretrievalnet.py:168-194).

    ``regional=True`` swaps the pooling stage for the reference's ``Rpool``
    (``/root/reference/src/layers/pooling.py:77-113``, built by
    ``init_network`` at imageretrievalnet.py:295-312): the base pooler runs
    over the full map plus every R-MAC grid region (``ops.pooling.roipool``),
    each region vector is L2-normalized, whitened by a shared Linear(D, D)
    (``rwhiten``), re-normalized, and the regions are sum-aggregated into one
    vector, normalized again. GeM's learnable ``p`` is shared between the
    full-image and region pools exactly as Rpool shares ``self.rpool``."""

    architecture: str = "resnet101"
    pooling: str = "gem"
    soa_layers: str = "45"
    whitening: bool = True
    local_whitening: bool = False
    regional: bool = False
    p_init: float = 3.0
    # stop gradients after this backbone stage (3 = the reference's
    # conv1-4 no_grad freeze, networks.py:194-198); 0 trains everything.
    # Static module attr: the trainer clones the module with
    # frozen_stages=3 when freeze_backbone is on — parameters are
    # structurally identical either way, only the backward graph changes.
    frozen_stages: int = 0
    # training-throughput knobs (VERDICT r3 #6): bf16 backbone compute with
    # an f32 head/loss, and per-bottleneck rematerialization. Parameters are
    # f32 in both collections either way — checkpoints are unaffected.
    compute_dtype: Optional[Any] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        feats, fmask = ResNetSOA(
            architecture=self.architecture, soa_layers=self.soa_layers,
            frozen_stages=self.frozen_stages,
            compute_dtype=self.compute_dtype, remat=self.remat,
            name="features",
        )(x, mask)
        # the head (pooling norms, whitening, loss) always runs f32: GeM's
        # clamp/power and the L2 norms are precision-sensitive, and the
        # backbone is where the FLOPs/activations are
        feats = feats.astype(jnp.float32)

        if self.local_whitening:
            feats = nn.Dense(feats.shape[-1], name="lwhiten")(feats)

        if self.regional:
            # Rpool consumes full-extent maps (the reference extracts one
            # image at a time; regional grids over a padded canvas would
            # pool padding into region vectors)
            if fmask is not None:
                raise ValueError(
                    "regional pooling does not support masked (padded) "
                    "batches; extract same-size batches instead"
                )
            if self.pooling == "gem":
                p = self.param("gem_p", nn.initializers.constant(self.p_init), ())
                rp = lambda z: pooling.gem(z, p)  # noqa: E731
            elif self.pooling == "gemmp":
                p = self.param(
                    "gem_p", nn.initializers.constant(self.p_init),
                    (feats.shape[-1],),
                )
                rp = lambda z: pooling.gem(z, p)  # noqa: E731
            elif self.pooling == "mac":
                rp = pooling.mac
            elif self.pooling == "spoc":
                rp = pooling.spoc
            else:
                raise ValueError(
                    f"unsupported regional base pooling: {self.pooling}"
                )
            o = pooling.roipool(feats, rp)             # (B, R, D)
            o = normalization.l2n(o)                   # per-region norm
            o = nn.Dense(o.shape[-1], name="rwhiten")(o)
            o = normalization.l2n(o)
            v = normalization.l2n(jnp.sum(o, axis=1))  # sum-aggregate + norm
        elif self.pooling == "gem":
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
    regional = params.get("regional", False)
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
        regional=regional,
        p_init=float(p),
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(rng, dummy)

    meta = {
        "architecture": architecture,
        "local_whitening": local_whitening,
        "pooling": pooling_name,
        "regional": regional,
        "whitening": whitening,
        "mean": mean,
        "std": std,
        "outputdim": OUTPUT_DIM[architecture],
        "soa": soa,
        "soa_layers": soa_layers,
    }
    return RetrievalModel(module=module, params=variables, meta=meta)

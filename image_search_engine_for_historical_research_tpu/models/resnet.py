"""Flax ResNet backbone with second-order attention (SOLAR) blocks.

TPU-native counterpart of the reference backbone
(``/root/reference/src/networks/networks.py``): torchvision-style ResNet-50/101/152
(v1.5: stride on the 3x3 conv) split into conv1..conv5_x stages, with ``SOABlock``
second-order attention inserted after conv4_x (k=4) and conv5_x (k=2)
(networks.py:149-211). Differences by design:

- NHWC layout, ``jnp.einsum`` attention (MXU-friendly) instead of torch ``bmm``.
- BatchNorm always runs in inference mode with stored statistics: the reference
  freezes BN during training too (``main_train.py:748-761``) and runs conv1-4
  under ``no_grad`` (networks.py:194-198); gradient stopping is handled by the
  optimizer mask in our trainer instead of control flow here.
- Optional **spatial validity mask** threaded through the stages so batches of
  padded variable-aspect images pool/attend only over real pixels (the reference
  avoids the problem by extracting at batch size 1, nnsearch DataLoader bs=1 —
  a TPU anti-pattern).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# stage depths per architecture (torchvision table)
STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored running statistics.

    Matches the reference's effective behavior: BN modules are set to eval even
    in training (main_train.py:748-761). Stats live in the ``batch_stats``
    collection so torch checkpoints convert 1:1.
    """

    features: int
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.features,)
        ).value
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.features,)
        ).value
        dtype = self.dtype or x.dtype
        inv = (scale / jnp.sqrt(var + self.eps)).astype(dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(dtype)


class Bottleneck(nn.Module):
    """torchvision v1.5 bottleneck: 1x1 -> 3x3 (stride) -> 1x1 (4x) + shortcut.

    ``dtype`` casts the conv compute (params stay f32 in the checkpoint):
    bf16 halves activation memory for training (VERDICT r3 #6)."""

    width: int
    strides: int = 1
    use_projection: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBatchNorm(self.width, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.width, (3, 3), strides=self.strides, padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = FrozenBatchNorm(self.width, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.width * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBatchNorm(self.width * 4, name="bn3")(y)
        if self.use_projection:
            residual = nn.Conv(
                self.width * 4, (1, 1), strides=self.strides,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(self.width * 4, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class SOABlock(nn.Module):
    """Second-order attention over feature-map positions (networks.py:94-146).

    ``attn = softmax(mid^-0.5 * f(x)^T g(x))`` over all H*W key positions;
    output ``v(attn @ h(x)) + x`` with ``v`` zero-initialized so a fresh block is
    the identity. ``mask`` (B, H, W) restricts keys to valid (non-padded) pixels.
    """

    mid_ch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, H, W, C = x.shape
        N = H * W

        def proj_bn_relu(name):
            def f(z):
                z = nn.Conv(self.mid_ch, (1, 1), dtype=self.dtype,
                            name=f"{name}_conv")(z)
                z = FrozenBatchNorm(self.mid_ch, name=f"{name}_bn")(z)
                return nn.relu(z)
            return f

        f_x = proj_bn_relu("f")(x).reshape(B, N, self.mid_ch)
        g_x = proj_bn_relu("g")(x).reshape(B, N, self.mid_ch)
        h_x = nn.Conv(self.mid_ch, (1, 1), dtype=self.dtype,
                      name="h_conv")(x).reshape(B, N, self.mid_ch)

        scale = self.mid_ch ** (-0.5)
        logits = scale * jnp.einsum(
            "bnc,bmc->bnm", f_x, g_x, preferred_element_type=jnp.float32
        )
        if mask is not None:
            # reshape keeping dim 0 intact (sharding-friendly), then broadcast
            key_mask = mask.reshape(B, N)[:, None, :]
            logits = jnp.where(key_mask, logits, -1e30)
        attn = nn.softmax(logits, axis=-1)
        z = jnp.einsum(
            "bnm,bmc->bnc", attn.astype(h_x.dtype), h_x,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        z = z.reshape(B, H, W, self.mid_ch)
        z = nn.Conv(
            self.mid_ch * (C // self.mid_ch), (1, 1),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="v_conv",
        )(z)
        return z + x


def _downsample_mask(mask: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Subsample a (B, H, W) validity mask by ``factor`` (top-left alignment)."""
    return mask[:, ::factor, ::factor]


class ResNetSOA(nn.Module):
    """conv1..conv5_x backbone + SOA4/SOA5 (networks.py:149-211).

    Returns the final (B, H/32, W/32, 2048) feature map (post-ReLU, non-negative
    like the reference's features) and the matching validity mask (or None).

    ``frozen_stages``: stop gradients after this stage (0 = none). The
    reference runs conv1..conv4_x under ``torch.no_grad()`` even in training
    (networks.py:194-198) — ``frozen_stages=3`` (our layer3 == conv4_x) is
    that boundary: XLA dead-code-eliminates the whole backward through the
    stem + layers 1-3, which is the bulk of backbone FLOPs and activation
    memory at 362 px. The trainer's optimizer mask stays on as
    belt-and-suspenders (train/optim.py).
    """

    architecture: str = "resnet101"
    soa_layers: str = "45"
    frozen_stages: int = 0
    # training-throughput knobs (VERDICT r3 #6): ``compute_dtype=bfloat16``
    # runs the conv/attention compute in bf16 (params stay f32; the retrieval
    # head and loss stay f32), ``remat`` rematerializes each bottleneck in
    # the backward pass instead of keeping its activations.
    compute_dtype: Optional[jnp.dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        """``mask`` (B, H, W) marks valid pixels of a zero-padded canvas.

        Invalid positions are re-zeroed after every block, so each conv sees
        zeros beyond the valid extent — mathematically the same boundary
        condition torch zero-padding gives the unpadded image. Masked batches of
        mixed-size images therefore reproduce the reference's one-image-at-a-time
        extraction up to stride-alignment at the ragged edge.
        """
        blocks = STAGE_BLOCKS[self.architecture]
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        Block = nn.remat(Bottleneck) if self.remat else Bottleneck

        def apply_mask(z, m):
            return z if m is None else z * m[..., None].astype(z.dtype)

        stage_masks = [None] * 5
        if mask is not None:
            x = apply_mask(x, mask)
            for i, f in enumerate((4, 4, 8, 16, 32)):
                stage_masks[i] = _downsample_mask(mask, f)

        # conv1: 7x7/2 + BN + ReLU, then 3x3/2 maxpool
        y = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.compute_dtype, name="conv1")(x)
        y = FrozenBatchNorm(64, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        y = apply_mask(y, stage_masks[0])

        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        feats = y
        for stage, (n_blocks, w, s) in enumerate(zip(blocks, widths, strides), 1):
            for b in range(n_blocks):
                feats = Block(
                    width=w,
                    strides=s if b == 0 else 1,
                    use_projection=(b == 0),
                    dtype=self.compute_dtype,
                    name=f"layer{stage}_block{b}",
                )(feats)
                feats = apply_mask(feats, stage_masks[stage])
            if stage == self.frozen_stages:
                # one boundary suffices: every earlier param feeds only the
                # stopped subgraph, so its backward is DCE'd entirely
                feats = jax.lax.stop_gradient(feats)
            if stage == 3 and "4" in self.soa_layers:
                feats = SOABlock(mid_ch=feats.shape[-1] // 4,
                                 dtype=self.compute_dtype, name="soa4")(
                    feats, stage_masks[3]
                )
                feats = apply_mask(feats, stage_masks[3])
        if "5" in self.soa_layers:
            feats = SOABlock(mid_ch=feats.shape[-1] // 2,
                             dtype=self.compute_dtype, name="soa5")(
                feats, stage_masks[4]
            )
            feats = apply_mask(feats, stage_masks[4])

        return feats, stage_masks[4]

"""ViTamin vision trunks (timm 'vitamin_*' model names).

Three-stage hybrid per the ViTamin paper (arXiv:2404.02132), loaded by the
reference through TimmModel (src/open_clip/timm_model.py:29-172):

  stem (conv /2) -> stage1 MBConv-LN blocks (/4) -> stage2 MBConv-LN (/8)
  -> patchify conv (/16) -> stage3 ViT blocks with GeGLU FFN (mlp_ratio 2)
  -> final LayerNorm.

Dims (paper Table 1 / timm vitamin.py): channels double per conv stage and
the transformer width is the third entry; conv depths are (2, 4) for every
size.

  small : (64, 128) -> 384,  depth 14, heads 6
  base  : (128, 256) -> 768,  depth 14, heads 12
  large : (160, 320) -> 1024, depth 31, heads 16   (large2 = same trunk)
  xlarge: (192, 384) -> 1152, depth 32, heads 16

TPU-first: NHWC convs (XLA-native layout), LayerNorm in fp32 stats, GeGLU
fused by XLA. forward_features returns the [B, N, W] token sequence
(no cls token — ViTamin pools by GAP, timm_pool "" in the shipped configs).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, fused_attention, gelu_exact

Dtype = Any


class MbConvLN(nn.Module):
    """MBConv with LayerNorm pre-norm (ViTamin 'MBConv-LN'), expand ratio 4."""

    channels: int
    stride: int = 1
    expand: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        mid = self.channels * self.expand
        shortcut = x
        h = LayerNorm(name="norm")(x)
        h = nn.Conv(mid, (1, 1), name="conv_expand", dtype=self.dtype,
                    param_dtype=self.param_dtype)(h)
        h = gelu_exact(h)
        h = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                    feature_group_count=mid, name="conv_dw",
                    dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = gelu_exact(h)
        h = nn.Conv(self.channels, (1, 1), name="conv_project",
                    dtype=self.dtype, param_dtype=self.param_dtype)(h)
        if self.stride == 1 and c_in == self.channels:
            return shortcut + h
        return h


class GeGluBlock(nn.Module):
    """Standard pre-norm ViT block with a GeGLU FFN (mlp_ratio 2)."""

    width: int
    heads: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.width
        dense = lambda f, name: nn.Dense(f, name=name, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        h = LayerNorm(name="norm1")(x)
        qkv = dense(3 * d, "qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + dense(d, "proj")(fused_attention(q, k, v, self.heads))

        h = LayerNorm(name="norm2")(x)
        hidden = int(d * self.mlp_ratio)
        g = gelu_exact(dense(hidden, "fc1_g")(h))
        u = dense(hidden, "fc1_x")(h)
        return x + dense(d, "fc2")(g * u)


class ViTaminTrunk(nn.Module):
    """forward_features: [B, (H/16)*(W/16), width]."""

    conv_channels: Tuple[int, int] = (160, 320)
    conv_depths: Tuple[int, int] = (2, 4)
    width: int = 1024
    depth: int = 31
    heads: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        c1, c2 = self.conv_channels
        x = x.astype(self.dtype)
        # stem: /2
        x = nn.Conv(c1, (3, 3), strides=(2, 2), name="stem_conv1",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = gelu_exact(LayerNorm(name="stem_norm")(x))
        x = nn.Conv(c1, (3, 3), name="stem_conv2", dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        # stage 1: /4
        for i in range(self.conv_depths[0]):
            x = MbConvLN(channels=c1, stride=2 if i == 0 else 1,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"stage1_{i}")(x)
        # stage 2: /8
        for i in range(self.conv_depths[1]):
            x = MbConvLN(channels=c2, stride=2 if i == 0 else 1,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"stage2_{i}")(x)
        # patchify to /16 and flatten to tokens
        x = nn.Conv(self.width, (2, 2), strides=(2, 2), name="patch_conv",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (gh * gw, self.width), self.param_dtype)
        x = x + pos.astype(x.dtype)[None]
        for i in range(self.depth):
            x = GeGluBlock(width=self.width, heads=self.heads,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"blocks_{i}")(x)
        return LayerNorm(name="norm")(x)


VITAMIN_CONFIGS = {
    "vitamin_small": dict(conv_channels=(64, 128), width=384, depth=14,
                          heads=6),
    "vitamin_base": dict(conv_channels=(128, 256), width=768, depth=14,
                         heads=12),
    "vitamin_large": dict(conv_channels=(160, 320), width=1024, depth=31,
                          heads=16),
    "vitamin_large2": dict(conv_channels=(160, 320), width=1024, depth=31,
                           heads=16),
    "vitamin_xlarge": dict(conv_channels=(192, 384), width=1152, depth=32,
                           heads=16),
}


def vitamin_config(timm_name: str) -> dict:
    # names look like vitamin_large2_256 — strip the resolution suffix
    base = "_".join(timm_name.split("_")[:2])
    if base not in VITAMIN_CONFIGS:
        raise NotImplementedError(f"unknown ViTamin variant {timm_name!r}")
    return dict(VITAMIN_CONFIGS[base])

"""FastViT / MobileCLIP image trunks (timm 'fastvit_mci*' model names).

Train-time (un-reparameterized) FastViT per arXiv:2303.14189 and the
MobileCLIP MCi variants (arXiv:2311.17049), loaded by the reference through
TimmModel (src/open_clip/timm_model.py:29-172):

  conv stem (/4) -> stage1..3 RepMixer blocks (DW token mixing + ConvFFN)
  -> stage4 attention blocks -> final 2x conv expansion -> tokens.

  mci1: dims (64, 128, 256, 512),  depths (4, 12, 24, 4) -> features 1024
  mci2: dims (80, 160, 320, 640), depths (4, 12, 24, 4) -> features 1280

TPU-first: NHWC convs; BatchNorm carries batch_stats (same collection the
ModifiedResNet tower uses); stage-4 attention is batched token attention on
the MXU. At inference the RepMixer branches fold into single convs — we keep
the train form (XLA fuses the conv+BN chains anyway).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.layers import fused_attention, gelu_exact

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    feature_group_count=self.groups, use_bias=False,
                    name="conv", dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        x = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="bn", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        return gelu_exact(x) if self.act else x


class ConvFFN(nn.Module):
    channels: int
    ratio: float = 3.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.channels
        h = ConvBN(c, kernel=7, groups=c, name="dw", dtype=self.dtype,
                   param_dtype=self.param_dtype)(x, deterministic)
        h = nn.Conv(int(c * self.ratio), (1, 1), name="fc1",
                    dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = gelu_exact(h)
        return nn.Conv(c, (1, 1), name="fc2", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)


class RepMixerBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.channels
        # token mixing: residual depthwise conv (train form of RepMixer)
        x = x + ConvBN(c, kernel=3, groups=c, name="mixer", dtype=self.dtype,
                       param_dtype=self.param_dtype)(x, deterministic)
        return x + ConvFFN(channels=c, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="ffn")(x, deterministic)


class AttnBlock(nn.Module):
    channels: int
    head_dim: int = 32  # timm fastvit Attention: fixed head dim 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, h, w, c = x.shape
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                         name="norm", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        y = y.reshape(b, h * w, c)
        dense = lambda f, name: nn.Dense(f, name=name, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        qkv = dense(3 * c, "qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        y = dense(c, "proj")(
            fused_attention(q, k, v, max(1, c // self.head_dim)))
        x = x + y.reshape(b, h, w, c)
        return x + ConvFFN(channels=c, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="ffn")(x, deterministic)


class Downsample(nn.Module):
    """Patch embed between stages: DW 7x7 s2 + pointwise."""

    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        c_in = x.shape[-1]
        x = ConvBN(c_in, kernel=7, stride=2, groups=c_in, act=True,
                   name="dw", dtype=self.dtype,
                   param_dtype=self.param_dtype)(x, deterministic)
        return ConvBN(self.channels, kernel=1, act=True, name="pw",
                      dtype=self.dtype,
                      param_dtype=self.param_dtype)(x, deterministic)


class FastVitTrunk(nn.Module):
    """forward_features: [B, (H/32)*(W/32), 2*dims[-1]] tokens."""

    dims: Tuple[int, ...] = (64, 128, 256, 512)
    depths: Tuple[int, ...] = (4, 12, 24, 4)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        d0 = self.dims[0]
        x = x.astype(self.dtype)
        # stem /4: conv s2 + DW s2 + PW (MobileOne-style, train form)
        x = ConvBN(d0, kernel=3, stride=2, act=True, name="stem0",
                   dtype=self.dtype, param_dtype=self.param_dtype)(
                       x, deterministic)
        x = ConvBN(d0, kernel=3, stride=2, groups=d0, act=True, name="stem1",
                   dtype=self.dtype, param_dtype=self.param_dtype)(
                       x, deterministic)
        x = ConvBN(d0, kernel=1, act=True, name="stem2", dtype=self.dtype,
                   param_dtype=self.param_dtype)(x, deterministic)

        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if si > 0:
                x = Downsample(channels=dim, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name=f"downsample{si}")(x, deterministic)
            is_attn = si == len(self.dims) - 1
            if is_attn:
                # RepCPE conditional positional encoding (train form:
                # residual 7x7 depthwise conv) on the attention stage
                x = x + ConvBN(dim, kernel=7, groups=dim,
                               name=f"stage{si}_pos_emb", dtype=self.dtype,
                               param_dtype=self.param_dtype)(x, deterministic)
            block = AttnBlock if is_attn else RepMixerBlock
            for di in range(depth):
                x = block(channels=dim, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"stage{si}_block{di}")(x, deterministic)

        # final conv expansion (2x) before pooling
        x = ConvBN(2 * self.dims[-1], kernel=3, groups=self.dims[-1],
                   act=True, name="final_conv", dtype=self.dtype,
                   param_dtype=self.param_dtype)(x, deterministic)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


FASTVIT_CONFIGS = {
    "fastvit_mci1": dict(dims=(64, 128, 256, 512), depths=(4, 12, 24, 4)),
    "fastvit_mci2": dict(dims=(80, 160, 320, 640), depths=(4, 12, 24, 4)),
}

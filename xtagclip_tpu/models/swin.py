"""Swin Transformer vision trunk (timm 'swin_base_patch4_window7_224').

Standard Swin (arXiv:2103.14030), loaded by the reference through TimmModel
(src/open_clip/timm_model.py:29-172). Swin-B: patch 4, embed 128, depths
(2, 2, 18, 2), heads (4, 8, 16, 32), window 7, patch merging between stages,
final LayerNorm; feature dim 1024.

TPU-first: window partition is a static reshape/transpose; the cyclic shift
is jnp.roll (a static lax.rotate); the shifted-window attention mask is a
precomputed constant folded into the jit. All attention runs batched over
windows on the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, gelu_exact

Dtype = Any


def _rel_pos_index(window: int) -> np.ndarray:
    """[W*W, W*W] index into the (2W-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(hw: int, window: int, shift: int) -> np.ndarray:
    """Additive mask [num_windows, W*W, W*W] for shifted windows."""
    img = np.zeros((hw, hw), np.int32)
    cnt = 0
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    nw = hw // window
    wins = img.reshape(nw, window, nw, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, window * window)
    diff = wins[:, :, None] - wins[:, None, :]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: [B*nW, W*W, C]
        bnw, n, c = x.shape
        nh, dh = self.num_heads, self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv", dtype=self.dtype,
                       param_dtype=self.param_dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bnw, n, nh, dh).transpose(0, 2, 1, 3) * dh**-0.5
        k = k.reshape(bnw, n, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(bnw, n, nh, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)

        table = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * self.window - 1) ** 2, nh), self.param_dtype,
        )
        idx = jnp.asarray(_rel_pos_index(self.window))
        attn = attn + table[idx].transpose(2, 0, 1)[None].astype(jnp.float32)

        if mask is not None:  # [nW, n, n] — broadcast over batch and heads
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, nh, n, n)
            attn = attn + mask[None, :, None].astype(jnp.float32)
            attn = attn.reshape(bnw, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype,
                        param_dtype=self.param_dtype)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        b, h, w, c = x.shape
        win = min(self.window, h)
        shift = self.shift if win < h else 0
        shortcut = x
        y = LayerNorm(name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        nwh, nww = h // win, w // win
        y = y.reshape(b, nwh, win, nww, win, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b * nwh * nww, win * win, c)
        mask = (jnp.asarray(_shift_attn_mask(h, win, shift))
                if shift else None)
        y = WindowAttention(dim=c, num_heads=self.num_heads, window=win,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="attn")(y, mask=mask)
        y = y.reshape(b, nwh, nww, win, win, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, h, w, c)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y

        y = LayerNorm(name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="fc1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(y)
        y = gelu_exact(y)
        y = nn.Dense(c, name="fc2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(y)
        return x + y


class SwinTrunk(nn.Module):
    """forward_features: [B, (H/32)*(W/32), 8*embed] final-normed tokens."""

    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    heads: Tuple[int, ...] = (4, 8, 16, 32)
    window: int = 7
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        b = x.shape[0]
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    name="patch_embed", dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        x = LayerNorm(name="patch_norm")(x)

        for si, (depth, nh) in enumerate(zip(self.depths, self.heads)):
            if si > 0:  # patch merging: 2x2 concat -> LN -> linear halve
                bb, h, w, c = x.shape
                x = x.reshape(bb, h // 2, 2, w // 2, 2, c)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(bb, h // 2, w // 2,
                                                          4 * c)
                x = LayerNorm(name=f"merge{si}_norm")(x)
                x = nn.Dense(2 * c, use_bias=False, name=f"merge{si}_reduce",
                             dtype=self.dtype,
                             param_dtype=self.param_dtype)(x)
            for di in range(depth):
                x = SwinBlock(
                    dim=x.shape[-1], num_heads=nh, window=self.window,
                    shift=0 if di % 2 == 0 else self.window // 2,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"stage{si}_block{di}",
                )(x)

        bb, h, w, c = x.shape
        x = x.reshape(bb, h * w, c)
        return LayerNorm(name="norm")(x)

"""EVA / EVA-02 vision trunks (timm 'eva_*' / 'eva02_*' model names).

Structure follows timm's eva.py family (the reference loads these through
TimmModel, src/open_clip/timm_model.py:29-172) and the EVA-02 paper
(arXiv:2303.11331):

- EVA-01 giant: standard pre-norm ViT, fused qkv with bias, absolute
  pos-embed, plain GELU MLP (hidden 6144 @ width 1408, depth 40).
- EVA-02 B/L: separate q/k/v projections (k has NO bias), 2-D axial rotary
  position embedding on q/k patch tokens (cls excluded), SwiGLU MLP with an
  inner LayerNorm before the output projection ("sub-LN", scale_mlp), plus
  absolute pos-embed.
- EVA-02 enormous: EVA-01-style blocks (fused qkv, plain MLP) scaled to
  width 1792 / depth 64 (EVA-CLIP, arXiv:2303.15389).

TPU-first: rope tables are precomputed host-side constants folded into the
jit; attention uses the fused BLHD lowering. timm torch checkpoints convert
via convert/timm_convert.py key maps where available; this module is
structure-parity (widths/depths/ffn dims per the published configs).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, fused_attention, gelu_exact

Dtype = Any


def axial_rope_tables(grid_h: int, grid_w: int, head_dim: int,
                      theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """2-D axial rope: half the head dim rotates with the row index, half
    with the column index. Returns (cos, sin) of shape [H*W, head_dim//2]."""
    quarter = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(quarter, dtype=np.float64) / quarter))
    th = np.arange(grid_h, dtype=np.float64)[:, None] * freqs[None]  # [H,q]
    tw = np.arange(grid_w, dtype=np.float64)[:, None] * freqs[None]  # [W,q]
    # [H, W, 2q]: row angles then col angles
    ang = np.concatenate(
        [np.broadcast_to(th[:, None, :], (grid_h, grid_w, quarter)),
         np.broadcast_to(tw[None, :, :], (grid_h, grid_w, quarter))],
        axis=-1,
    ).reshape(grid_h * grid_w, 2 * quarter)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def apply_rope(x, cos, sin):
    """Rotate pairs: x is [B, L, H, D]; cos/sin are [L, D//2]."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


class EvaAttention(nn.Module):
    width: int
    num_heads: int
    qkv_fused: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope: Optional[Tuple] = None):
        d = self.width
        nh = self.num_heads
        dh = d // nh
        b, l, _ = x.shape
        if self.qkv_fused:
            qkv = nn.Dense(3 * d, name="qkv", dtype=self.dtype,
                           param_dtype=self.param_dtype)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            # EVA-02: k projection carries no bias
            q = nn.Dense(d, name="q_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
            k = nn.Dense(d, use_bias=False, name="k_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
            v = nn.Dense(d, name="v_proj", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        if rope is not None:
            cos, sin = rope
            qh = q.reshape(b, l, nh, dh)
            kh = k.reshape(b, l, nh, dh)
            # cls token (index 0) is not rotated
            q = jnp.concatenate(
                [qh[:, :1], apply_rope(qh[:, 1:], cos, sin)], axis=1
            ).reshape(b, l, d)
            k = jnp.concatenate(
                [kh[:, :1], apply_rope(kh[:, 1:], cos, sin)], axis=1
            ).reshape(b, l, d)
        ctx = fused_attention(q, k, v, nh)
        return nn.Dense(d, name="proj", dtype=self.dtype,
                        param_dtype=self.param_dtype)(ctx)


class EvaBlock(nn.Module):
    width: int
    num_heads: int
    mlp_hidden: int
    swiglu: bool = False
    scale_mlp: bool = False
    qkv_fused: bool = True
    post_norm: bool = False
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope=None):
        attn = EvaAttention(width=self.width, num_heads=self.num_heads,
                            qkv_fused=self.qkv_fused, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="attn")
        ln = lambda name: LayerNorm(eps=self.norm_eps, name=name)
        dense = lambda f, name, bias=True: nn.Dense(
            f, use_bias=bias, name=name, dtype=self.dtype,
            param_dtype=self.param_dtype)

        if self.post_norm:
            x = x + ln("norm1")(attn(x, rope=rope))
        else:
            x = x + attn(ln("norm1")(x), rope=rope)

        def mlp(h):
            if self.swiglu:
                g = dense(self.mlp_hidden, "fc1_g")(h)
                u = dense(self.mlp_hidden, "fc1_x")(h)
                h = nn.silu(g) * u
                if self.scale_mlp:
                    h = ln("mlp_norm")(h)
                return dense(self.width, "fc2")(h)
            h = gelu_exact(dense(self.mlp_hidden, "fc1")(h))
            if self.scale_mlp:
                h = ln("mlp_norm")(h)
            return dense(self.width, "fc2")(h)

        if self.post_norm:
            return x + ln("norm2")(mlp(x))
        return x + mlp(ln("norm2")(x))


class EvaTrunk(nn.Module):
    """forward_features: [B, 1+N, width], final-normed (timm Eva contract)."""

    patch_size: int
    width: int
    layers: int
    heads: int
    mlp_hidden: int
    swiglu: bool = False
    scale_mlp: bool = False
    qkv_fused: bool = True
    post_norm: bool = False
    use_rope: bool = False
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, hh, ww, c = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        x = x.astype(self.dtype)
        x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * c)
        x = nn.Dense(self.width, name="patch_embed", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.width), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, self.width)),
             x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (gh * gw + 1, self.width), self.param_dtype)
        x = x + pos.astype(x.dtype)[None]

        rope = None
        if self.use_rope:
            cos, sin = axial_rope_tables(gh, gw, self.width // self.heads)
            rope = (jnp.asarray(cos), jnp.asarray(sin))

        for i in range(self.layers):
            x = EvaBlock(
                width=self.width, num_heads=self.heads,
                mlp_hidden=self.mlp_hidden, swiglu=self.swiglu,
                scale_mlp=self.scale_mlp, qkv_fused=self.qkv_fused,
                post_norm=self.post_norm, norm_eps=self.norm_eps,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(x, rope=rope)
        return LayerNorm(eps=self.norm_eps, name="norm")(x)


# name -> trunk kwargs (published EVA/EVA-CLIP configs)
EVA_CONFIGS = {
    "eva_giant_patch14_224": dict(
        patch_size=14, width=1408, layers=40, heads=16, mlp_hidden=6144,
        qkv_fused=True,
    ),
    "eva02_base_patch16_clip_224": dict(
        patch_size=16, width=768, layers=12, heads=12,
        mlp_hidden=int(768 * 4 * 2 / 3), swiglu=True, scale_mlp=True,
        qkv_fused=False, use_rope=True,
    ),
    "eva02_large_patch14_clip_224": dict(
        patch_size=14, width=1024, layers=24, heads=16,
        mlp_hidden=int(1024 * 4 * 2 / 3), swiglu=True, scale_mlp=True,
        qkv_fused=False, use_rope=True,
    ),
    "eva02_large_patch14_clip_336": dict(
        patch_size=14, width=1024, layers=24, heads=16,
        mlp_hidden=int(1024 * 4 * 2 / 3), swiglu=True, scale_mlp=True,
        qkv_fused=False, use_rope=True,
    ),
    "eva02_enormous_patch14_clip_224": dict(
        patch_size=14, width=1792, layers=64, heads=16, mlp_hidden=15360,
        qkv_fused=True,
    ),
}

"""timm-style ViT trunk + TimmModel head (the BiomedCLIP image tower).

Mirrors timm vit_base_patch16_224 structure (patch-embed conv WITH bias,
cls token, pos-embed incl cls, pre-norm blocks with fused qkv bias, LN eps
1e-6, final norm) wrapped with the XTag-modified TimmModel head
(reference timm_model.py:29-172): pool (''/avg -> mean over all tokens,
'cls' -> first token) then linear/mlp projection applied to the pooled
feature AND every token; returns (projected, projected_tokens).

Weight conversion from timm torch checkpoints: convert/timm_convert.py.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, fused_attention, gelu_exact

Dtype = Any


class TimmBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = x.shape[-1]
        h = LayerNorm(eps=self.norm_eps, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ctx = fused_attention(q, k, v, self.num_heads)
        attn_out = nn.Dense(d, name="proj", dtype=self.dtype,
                            param_dtype=self.param_dtype)(ctx)
        x = x + attn_out

        h = LayerNorm(eps=self.norm_eps, name="norm2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), name="fc1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = gelu_exact(h)
        h = nn.Dense(d, name="fc2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        return x + h


class TimmViT(nn.Module):
    """timm ViT trunk: forward_features -> [B, 1+N, D] (incl cls), final-normed."""

    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
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
                     param_dtype=self.param_dtype)(x)  # timm has bias

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.width),
            self.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (b, 1, self.width)), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (gh * gw + 1, self.width), self.param_dtype,
        )
        x = x + pos.astype(x.dtype)[None]

        for i in range(self.layers):
            x = TimmBlock(
                num_heads=self.heads, mlp_ratio=self.mlp_ratio,
                norm_eps=self.norm_eps, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"blocks_{i}",
            )(x, deterministic=deterministic)
        return LayerNorm(eps=self.norm_eps, name="norm")(x)


class TimmModel(nn.Module):
    """timm trunk + pool + proj head, (pooled, tokens) contract."""

    embed_dim: int
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    pool: str = "avg"
    proj: str = "linear"
    proj_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tokens = TimmViT(
            patch_size=self.patch_size, width=self.width, layers=self.layers,
            heads=self.heads, dtype=self.dtype, param_dtype=self.param_dtype,
            name="trunk",
        )(x, deterministic=deterministic)

        if self.pool == "cls":
            pooled = tokens[:, 0]
        else:  # '', 'avg' -> mean over ALL tokens (timm_model.py:141-149)
            pooled = tokens.mean(axis=1)

        if self.proj == "linear":
            head = nn.Dense(self.embed_dim, use_bias=self.proj_bias,
                            name="head_proj", dtype=self.dtype,
                            param_dtype=self.param_dtype)
            return head(pooled), head(tokens)
        if self.proj == "mlp":
            fc1 = nn.Dense(2 * self.embed_dim, name="head_mlp_fc1",
                           dtype=self.dtype, param_dtype=self.param_dtype)
            fc2 = nn.Dense(self.embed_dim, use_bias=self.proj_bias,
                           name="head_mlp_fc2", dtype=self.dtype,
                           param_dtype=self.param_dtype)
            mlp = lambda t: fc2(gelu_exact(fc1(t)))
            return mlp(pooled), mlp(tokens)
        return pooled, tokens  # proj == 'none'


_TIMM_VIT_RE = re.compile(
    r"vit_(tiny|small|base|large|huge|so400m)_patch(\d+)(?:_\w+)*_(\d+)"
)
_VIT_DIMS = {
    "tiny": (192, 12, 3), "small": (384, 12, 6), "base": (768, 12, 12),
    "large": (1024, 24, 16), "huge": (1280, 32, 16),
    "so400m": (1152, 27, 16),
}


def build_timm_vision_tower(embed_dim: int, vision_cfg: dict, dtype,
                            param_dtype, remat: bool = False):
    name = vision_cfg["timm_model_name"]
    if name.startswith("convnext"):
        from xtagclip_tpu.models.convnext import build_convnext_tower

        return build_convnext_tower(embed_dim, vision_cfg, dtype, param_dtype)
    m = _TIMM_VIT_RE.match(name)
    if not m:
        raise NotImplementedError(
            f"timm model {name!r} not supported natively; "
            f"ViT and ConvNeXt trunks only"
        )
    size, patch, _res = m.group(1), int(m.group(2)), int(m.group(3))
    width, layers, heads = _VIT_DIMS[size]
    return TimmModel(
        embed_dim=embed_dim,
        patch_size=patch,
        width=width,
        layers=layers,
        heads=heads,
        pool=vision_cfg.get("timm_pool", "avg") or "avg",
        proj=vision_cfg.get("timm_proj", "linear"),
        proj_bias=vision_cfg.get("timm_proj_bias", False),
        dtype=dtype,
        param_dtype=param_dtype,
        name="visual",
    )

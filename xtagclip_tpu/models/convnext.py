"""ConvNeXt vision trunk (timm-style) — covers the convnext_* model configs.

Structure matches timm convnext (stem 4x4/4 conv + LN, stages of
[7x7 depthwise conv -> LN -> 4x pointwise MLP (gelu) -> layer-scale ->
residual] with LN+2x2/2 downsample between stages), wrapped with the
TimmModel-style pool + proj head returning (pooled, projected tokens).
Converter for timm checkpoints: convert_timm_convnext_state_dict.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, gelu_exact

Dtype = Any

# timm convnext variants: (depths, dims)
CONVNEXT_CFGS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    ls_init_value: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(
            self.dim, (7, 7), padding=[(3, 3)] * 2,
            feature_group_count=self.dim, name="conv_dw",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        x = LayerNorm(eps=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="mlp_fc1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        x = gelu_exact(x)
        x = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        gamma = self.param(
            "gamma",
            lambda key, shape, dtype: jnp.full(shape, self.ls_init_value, dtype),
            (self.dim,), self.param_dtype,
        )
        return shortcut + x * gamma.astype(x.dtype)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_conv",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = LayerNorm(eps=1e-6, name="stem_norm")(x)
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = LayerNorm(eps=1e-6, name=f"stage{si}_downsample_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2),
                            name=f"stage{si}_downsample_conv",
                            dtype=self.dtype, param_dtype=self.param_dtype)(x)
            for bi in range(depth):
                x = ConvNeXtBlock(dim=dim, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=f"stage{si}_block{bi}")(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)  # token sequence (no cls)


class ConvNeXtModel(nn.Module):
    """ConvNeXt trunk + TimmModel head contract (pooled, tokens)."""

    embed_dim: int
    depths: Sequence[int]
    dims: Sequence[int]
    pool: str = "avg"
    proj: str = "linear"
    proj_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        tokens = ConvNeXt(
            depths=tuple(self.depths), dims=tuple(self.dims),
            dtype=self.dtype, param_dtype=self.param_dtype, name="trunk",
        )(x, deterministic=deterministic)
        tokens = LayerNorm(eps=1e-6, name="head_norm")(tokens)
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
        return pooled, tokens


def build_convnext_tower(embed_dim: int, vision_cfg: dict, dtype, param_dtype):
    name = vision_cfg["timm_model_name"]
    base = re.sub(r"(_w|_d)?(_320|_384)?$", "", name)
    if base not in CONVNEXT_CFGS:
        raise NotImplementedError(f"convnext variant {name!r} not mapped")
    depths, dims = CONVNEXT_CFGS[base]
    return ConvNeXtModel(
        embed_dim=embed_dim, depths=depths, dims=dims,
        pool=vision_cfg.get("timm_pool", "avg") or "avg",
        proj=vision_cfg.get("timm_proj", "linear"),
        proj_bias=vision_cfg.get("timm_proj_bias", False),
        dtype=dtype, param_dtype=param_dtype, name="visual",
    )


def convert_timm_convnext_state_dict(sd, prefix: str = "visual.trunk."):
    """timm convnext torch keys -> ConvNeXt flax tree."""
    tree: dict = {}

    def put(path, key, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[key] = v

    def conv_w(v):  # [O, I, kh, kw] -> [kh, kw, I, O]
        return np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))

    blk = re.compile(re.escape(prefix) + r"stages\.(\d+)\.blocks\.(\d+)\.(.+)")
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        if rest == "stem.0.weight":
            put(("stem_conv",), "kernel", conv_w(v))
        elif rest == "stem.0.bias":
            put(("stem_conv",), "bias", v)
        elif rest.startswith("stem.1."):
            put(("stem_norm",),
                {"weight": "scale", "bias": "bias"}[rest.split(".")[2]], v)
        elif ".downsample." in rest:
            m = re.match(r"stages\.(\d+)\.downsample\.(\d+)\.(\w+)", rest)
            if not m:
                continue
            si, idx, key = int(m.group(1)), m.group(2), m.group(3)
            if idx == "0":
                put((f"stage{si}_downsample_norm",),
                    {"weight": "scale", "bias": "bias"}[key], v)
            else:
                put((f"stage{si}_downsample_conv",),
                    "kernel" if key == "weight" else "bias",
                    conv_w(v) if key == "weight" else v)
        else:
            m = blk.match(k)
            if not m:
                continue
            si, bi, brest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = (f"stage{si}_block{bi}",)
            parts = brest.split(".")
            if parts[0] == "conv_dw":
                put(base + ("conv_dw",),
                    "kernel" if parts[1] == "weight" else "bias",
                    conv_w(v) if parts[1] == "weight" else v)
            elif parts[0] == "norm":
                put(base + ("norm",),
                    {"weight": "scale", "bias": "bias"}[parts[1]], v)
            elif parts[0] == "mlp":
                put(base + (f"mlp_{parts[1]}",),
                    "kernel" if parts[2] == "weight" else "bias",
                    np.ascontiguousarray(v.T) if parts[2] == "weight" else v)
            elif parts[0] == "gamma":
                tree.setdefault(f"stage{si}_block{bi}", {})["gamma"] = v
    return tree

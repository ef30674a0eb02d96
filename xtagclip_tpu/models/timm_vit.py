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

import jax
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
    def __call__(self, x, attn_bias=None, deterministic=True):
        d = x.shape[-1]
        h = LayerNorm(eps=self.norm_eps, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        ctx = fused_attention(q, k, v, self.num_heads, mask=attn_bias)
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


class RelPosBias(nn.Module):
    """timm vit_relpos-style relative position bias with cls handling:
    a (2H-1)(2W-1)+3 table (cls->all / all->cls / cls->cls extras)."""

    grid: int
    num_heads: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        import numpy as np

        g = self.grid
        coords = np.stack(np.meshgrid(np.arange(g), np.arange(g),
                                      indexing="ij")).reshape(2, -1)
        rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
        rel = rel + (g - 1)
        idx = rel[..., 0] * (2 * g - 1) + rel[..., 1]
        n = g * g
        size = (2 * g - 1) ** 2
        full = np.zeros((n + 1, n + 1), np.int32)
        full[1:, 1:] = idx
        full[0, :] = size       # cls -> all
        full[:, 0] = size + 1   # all -> cls
        full[0, 0] = size + 2   # cls -> cls
        table = self.param("table", nn.initializers.normal(0.02),
                           (size + 3, self.num_heads), self.param_dtype)
        return table[jnp.asarray(full)].transpose(2, 0, 1)[None]


class TimmViT(nn.Module):
    """timm ViT trunk: forward_features -> [B, (1+)N, D], final-normed.

    Variants: use_cls_token=False + fc_norm covers the '*_gap_*' models
    (no class token, final norm applied after pooling in the head);
    relpos adds per-model relative-position attention bias and drops the
    absolute pos-embed ('vit_relpos_*'); conv_stem replaces patchify with
    a 3-conv stem ('vit_base_mci_224', MobileCLIP-B).
    """

    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    use_cls_token: bool = True
    use_abs_pos: bool = True
    final_norm: bool = True
    relpos: bool = False
    conv_stem: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        b, hh, ww, c = x.shape
        p = self.patch_size
        gh, gw = hh // p, ww // p
        x = x.astype(self.dtype)
        if self.conv_stem:
            # 3-conv stem, strides (4, 2, 2) -> /16 patch grid
            for i, (f, s) in enumerate([(self.width // 6, 4),
                                        (self.width // 3, 2),
                                        (self.width, 2)]):
                x = nn.Conv(f, (3, 3), strides=(s, s), name=f"stem_{i}",
                            dtype=self.dtype,
                            param_dtype=self.param_dtype)(x)
                if i < 2:
                    x = gelu_exact(x)
            x = x.reshape(b, gh * gw, self.width)
        else:
            # valid-padding patchify: drop the remainder when the image size
            # is not a patch multiple (SigLIP SO400M/14 @ 384 drops 6 px)
            x = x[:, : gh * p, : gw * p]
            x = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, gh * gw, p * p * c)
            x = nn.Dense(self.width, name="patch_embed", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)  # timm has bias

        n_prefix = 0
        if self.use_cls_token:
            cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.width),
                self.param_dtype,
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_token.astype(x.dtype),
                                  (b, 1, self.width)), x],
                axis=1,
            )
            n_prefix = 1
        if self.use_abs_pos:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (gh * gw + n_prefix, self.width), self.param_dtype,
            )
            x = x + pos.astype(x.dtype)[None]

        attn_bias = None
        if self.relpos:
            attn_bias = RelPosBias(grid=gh, num_heads=self.heads,
                                   param_dtype=self.param_dtype,
                                   name="relpos")()

        for i in range(self.layers):
            x = TimmBlock(
                num_heads=self.heads, mlp_ratio=self.mlp_ratio,
                norm_eps=self.norm_eps, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"blocks_{i}",
            )(x, attn_bias=attn_bias, deterministic=deterministic)
        if self.final_norm:
            return LayerNorm(eps=self.norm_eps, name="norm")(x)
        return x


class MapPool(nn.Module):
    """timm AttentionPoolLatent — the SigLIP 'map' pool: one learnable
    latent query attends over the tokens, then proj + LN + residual MLP,
    returning the latent position."""

    width: int
    num_heads: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        b, _, w = tokens.shape
        assert w == self.width
        latent = self.param(
            "latent", nn.initializers.normal(self.width ** -0.5),
            (1, 1, self.width), self.param_dtype,
        )
        dense = lambda f, name: nn.Dense(f, name=name, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        q = dense(w, "q")(jnp.broadcast_to(latent.astype(tokens.dtype),
                                           (b, 1, w)))
        kv = dense(2 * w, "kv")(tokens)
        k, v = jnp.split(kv, 2, axis=-1)
        nh, dh = self.num_heads, w // self.num_heads
        qh = q.reshape(b, 1, nh, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(b, -1, nh, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(b, -1, nh, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32,
        ) * dh ** -0.5
        probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32,
        ).astype(tokens.dtype)
        x = dense(w, "proj")(ctx.transpose(0, 2, 1, 3).reshape(b, 1, w))
        y = LayerNorm(eps=self.norm_eps, name="norm")(x)
        h = dense(int(w * self.mlp_ratio), "mlp_fc1")(y)
        h = gelu_exact(h)
        h = dense(w, "mlp_fc2")(h)
        return (x + h)[:, 0]


class TimmModel(nn.Module):
    """timm trunk + pool + proj head, (pooled, tokens) contract.

    `trunk` may be any module mapping images -> [B, N, D] tokens (EVA,
    ViTamin, Swin, FastViT, ...); when None a TimmViT is built from the
    shape fields. Pool 'cls'/'token' takes token 0, otherwise mean over all
    tokens (reference timm_model.py:141-149). `fc_norm` applies a LayerNorm
    after pooling (timm '*_gap_*' head semantics). When proj is none but
    embed_dim differs from the trunk width, the trunk's own classifier head
    (a biased linear, as timm's clip variants ship) maps to embed_dim.
    """

    embed_dim: int
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    pool: str = "avg"
    proj: str = "linear"
    proj_bias: bool = False
    trunk: Any = None
    fc_norm: bool = False
    map_mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        trunk = self.trunk
        if trunk is None:
            trunk = TimmViT(
                patch_size=self.patch_size, width=self.width,
                layers=self.layers, heads=self.heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name="trunk",
            )
        tokens = trunk(x, deterministic=deterministic)

        if self.pool in ("cls", "token"):
            pooled = tokens[:, 0]
        elif self.pool == "map":
            # SigLIP MAP head (timm AttentionPoolLatent)
            pooled = MapPool(
                width=tokens.shape[-1], num_heads=self.heads,
                mlp_ratio=self.map_mlp_ratio, dtype=self.dtype,
                param_dtype=self.param_dtype, name="attn_pool",
            )(tokens)
        else:  # '', 'avg' -> mean over ALL tokens (timm_model.py:141-149)
            pooled = tokens.mean(axis=1)
        if self.fc_norm:
            fcn = LayerNorm(eps=1e-6, name="fc_norm")
            pooled = fcn(pooled)
            tokens = fcn(tokens)

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
        # proj in (None, 'none', ''): timm clip trunks carry their own head
        if tokens.shape[-1] != self.embed_dim:
            head = nn.Dense(self.embed_dim, name="trunk_head",
                            dtype=self.dtype, param_dtype=self.param_dtype)
            return head(pooled), head(tokens)
        return pooled, tokens


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
    pool = vision_cfg.get("timm_pool", "avg")
    proj = vision_cfg.get("timm_proj", "linear")
    proj_bias = vision_cfg.get("timm_proj_bias", False)

    def wrap(trunk, width, **kw):
        return TimmModel(
            embed_dim=embed_dim, width=width, pool=pool if pool is not None
            else "avg", proj=proj, proj_bias=proj_bias, trunk=trunk,
            dtype=dtype, param_dtype=param_dtype, name="visual", **kw,
        )

    if name.startswith("convnext"):
        from xtagclip_tpu.models.convnext import build_convnext_tower

        return build_convnext_tower(embed_dim, vision_cfg, dtype, param_dtype)

    if name.startswith(("eva_", "eva02_")):
        from xtagclip_tpu.models.eva import EVA_CONFIGS, EvaTrunk

        if name not in EVA_CONFIGS:
            raise NotImplementedError(f"unknown EVA variant {name!r}")
        cfg = EVA_CONFIGS[name]
        trunk = EvaTrunk(dtype=dtype, param_dtype=param_dtype, name="trunk",
                         **cfg)
        return wrap(trunk, cfg["width"])

    if name.startswith("vitamin_"):
        from xtagclip_tpu.models.vitamin import ViTaminTrunk, vitamin_config

        cfg = vitamin_config(name)
        trunk = ViTaminTrunk(dtype=dtype, param_dtype=param_dtype,
                             name="trunk", **cfg)
        return wrap(trunk, cfg["width"])

    if name.startswith("swin_"):
        from xtagclip_tpu.models.swin import SwinTrunk

        # swin_base_patch4_window7_224 is the only registry config
        trunk = SwinTrunk(dtype=dtype, param_dtype=param_dtype, name="trunk")
        return wrap(trunk, 8 * 128)

    if name.startswith("fastvit_"):
        from xtagclip_tpu.models.fastvit import FASTVIT_CONFIGS, FastVitTrunk

        if name not in FASTVIT_CONFIGS:
            raise NotImplementedError(f"unknown FastViT variant {name!r}")
        cfg = FASTVIT_CONFIGS[name]
        trunk = FastVitTrunk(dtype=dtype, param_dtype=param_dtype,
                             name="trunk", **cfg)
        return wrap(trunk, 2 * cfg["dims"][-1])

    if name == "vit_base_mci_224":  # MobileCLIP-B image tower
        trunk = TimmViT(patch_size=16, width=768, layers=12, heads=12,
                        conv_stem=True, dtype=dtype, param_dtype=param_dtype,
                        name="trunk")
        return wrap(trunk, 768)

    if name == "vit_medium_patch16_gap_256":
        trunk = TimmViT(patch_size=16, width=512, layers=12, heads=8,
                        use_cls_token=False, final_norm=False, dtype=dtype,
                        param_dtype=param_dtype, name="trunk")
        return wrap(trunk, 512, fc_norm=True)

    if name == "vit_relpos_medium_patch16_cls_224":
        trunk = TimmViT(patch_size=16, width=512, layers=12, heads=8,
                        use_abs_pos=False, relpos=True, dtype=dtype,
                        param_dtype=param_dtype, name="trunk")
        return wrap(trunk, 512)

    m = _TIMM_VIT_RE.match(name)
    if not m:
        raise NotImplementedError(
            f"timm model {name!r} not supported natively"
        )
    size, patch, _res = m.group(1), int(m.group(2)), int(m.group(3))
    width, layers, heads = _VIT_DIMS[size]
    if "_siglip" in name:
        # timm SigLIP ViTs: no class token, MAP (attention-pool-latent) head,
        # and so400m's non-integer mlp_ratio (hidden 4304 @ width 1152)
        # 3.7362 (not 4304/1152 exactly): int(1152 * ratio) must floor to
        # 4304, and the float quotient can round down to 4303.999...
        ratio = 3.7362 if size == "so400m" else 4.0
        trunk = TimmViT(
            patch_size=patch, width=width, layers=layers, heads=heads,
            mlp_ratio=ratio, use_cls_token=False, dtype=dtype,
            param_dtype=param_dtype, name="trunk",
        )
        return TimmModel(
            embed_dim=embed_dim, width=width, heads=heads,
            pool=pool or "map", proj=proj, proj_bias=proj_bias, trunk=trunk,
            map_mlp_ratio=ratio, dtype=dtype, param_dtype=param_dtype,
            name="visual",
        )
    return TimmModel(
        embed_dim=embed_dim,
        patch_size=patch,
        width=width,
        layers=layers,
        heads=heads,
        pool=pool or "avg",
        proj=proj,
        proj_bias=proj_bias,
        dtype=dtype,
        param_dtype=param_dtype,
        name="visual",
    )

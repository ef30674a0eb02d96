"""Vision Transformer tower.

Mirrors the XTag-modified reference VisionTransformer
(/root/reference/src/open_clip/transformer.py:515-882): patchify -> +cls ->
+pos -> ln_pre -> blocks -> pooled = pool(tokens); ln_post + proj applied to
the pooled feature AND (when output_tokens) to every token, so the tag head
cross-attends in embed_dim space.

TPU-first choices: patchify is an explicit reshape + one big matmul (guaranteed
MXU mapping, no conv lowering), images arrive NHWC, all heavy math runs in the
module compute dtype (bf16 in production) with fp32 accumulation.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.layers import (
    AttentionalPooler,
    LayerNorm,
    Transformer,
    feature_take_indices,
    gelu_exact,
    patch_dropout,
)
from xtagclip_tpu.models.pos_embed import get_2d_sincos_pos_embed
from xtagclip_tpu.ops import fused_attn_block

Dtype = Any


def _to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class VisionTransformer(nn.Module):
    image_size: Any = 224
    patch_size: Any = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    attentional_pool: bool = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    output_dim: int = 512
    patch_dropout: float = 0.0
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"
    pool_type: str = "tok"
    # TPU performance option (off by default; changes numerics vs the
    # reference, so never used for pretrained parity): drop the class token
    # entirely. The [L, L] attention matmuls then have a 128-multiple lane
    # dimension (256 for /14@224 instead of 257) that XLA tiles cleanly —
    # measured +13% on the bare ViT-L stack (PERF.md round 3). Only valid
    # with pool_type='avg' (GAP); from-scratch CLIPA-GAP recipes qualify.
    no_class_token: bool = False
    final_ln_after_pool: bool = False
    act: Callable = gelu_exact
    norm_eps: float = 1e-5
    output_tokens: bool = True
    remat: bool = False
    scan_layers: bool = False
    # learnable prompt-token injection (legacy others/transformer.py:549-558,
    # :642-644 — the --add-learnable-tokens capability): n extra learned
    # tokens spliced into the sequence at insert_position.
    n_learnable_tokens: int = 0
    insert_position: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def grid_size(self) -> Tuple[int, int]:
        ih, iw = _to_2tuple(self.image_size)
        ph, pw = _to_2tuple(self.patch_size)
        return ih // ph, iw // pw

    def patchify(self, x):
        """NHWC image -> [B, gh*gw, ph*pw*C] patches (row-major within patch)."""
        b, h, w, c = x.shape
        ph, pw = _to_2tuple(self.patch_size)
        gh, gw = h // ph, w // pw
        x = x.reshape(b, gh, ph, gw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, C]
        return x.reshape(b, gh * gw, ph * pw * c)

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 intermediates_cfg=None):
        """intermediates_cfg activates the forward_intermediates contract
        (reference transformer.py:743-808): a dict with optional keys
        {indices, normalize_intermediates, intermediates_only, output_fmt
        ('NCHW'|'NLC'), output_extra_tokens} returning the reference's output
        dict instead of (pooled, tokens)."""
        scale = self.width**-0.5
        gh, gw = self.grid_size
        if self.no_class_token and self.pool_type != "avg":
            raise ValueError(
                "no_class_token requires pool_type='avg' (GAP); "
                f"got pool_type={self.pool_type!r}")
        n_tok = gh * gw + (0 if self.no_class_token else 1)

        patches = self.patchify(x.astype(self.dtype))
        x = nn.Dense(
            self.width, use_bias=False, name="conv1", dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(patches)

        if not self.no_class_token:
            class_embedding = self.param(
                "class_embedding", nn.initializers.normal(scale),
                (self.width,), self.param_dtype,
            )
            cls = jnp.broadcast_to(
                class_embedding.astype(x.dtype)[None, None],
                (x.shape[0], 1, self.width)
            )
            x = jnp.concatenate([cls, x], axis=1)

        if self.pos_embed_type == "learnable":
            pos = self.param(
                "positional_embedding", nn.initializers.normal(scale),
                (n_tok, self.width), self.param_dtype,
            )
        elif self.pos_embed_type == "sin_cos_2d":
            assert gh == gw, "sin_cos_2d requires square grids"
            pos = self.param(
                "positional_embedding",
                lambda key, shape, dtype: jnp.asarray(
                    get_2d_sincos_pos_embed(
                        self.width, gh, cls_token=not self.no_class_token),
                    dtype,
                ),
                (n_tok, self.width), self.param_dtype,
            )
        else:
            raise ValueError(self.pos_embed_type)
        x = x + pos.astype(x.dtype)

        if self.n_learnable_tokens > 0:
            extra = self.param(
                "learnable_tokens", nn.initializers.normal(scale),
                (self.n_learnable_tokens, self.width), self.param_dtype,
            )
            extra = jnp.broadcast_to(
                extra.astype(x.dtype)[None],
                (x.shape[0], self.n_learnable_tokens, self.width),
            )
            pos_i = self.insert_position
            x = jnp.concatenate([x[:, :pos_i], extra, x[:, pos_i:]], axis=1)

        if self.patch_dropout > 0.0 and not deterministic:
            x = patch_dropout(x, self.make_rng("patch_dropout"), self.patch_dropout)

        if not self.no_ln_pre:
            x = LayerNorm(eps=self.norm_eps, name="ln_pre")(x)

        # dh==80 alignment pad (ops/fused_attn_block.alignment_pad): the
        # ViT-H GAP lengths crash the fused kernel's compiler at aligned L;
        # appending masked tokens moves the shape into the verified set with
        # EXACTLY the unpadded numerics (pad keys additively masked, pad
        # rows sliced off below)
        fused_pad = 0
        attn_mask = None
        if (deterministic and intermediates_cfg is None
                and not self.attentional_pool
                and self.dtype == jnp.bfloat16
                and fused_attn_block.enabled()):
            fused_pad = fused_attn_block.alignment_pad(
                x.shape[1], self.width, self.heads)
        if fused_pad:
            pad_tok = jnp.mean(x, axis=1, keepdims=True)
            x = jnp.concatenate(
                [x, jnp.repeat(pad_tok, fused_pad, axis=1)], axis=1)
            attn_mask = fused_attn_block.alignment_mask(
                x.shape[1] - fused_pad, fused_pad)

        transformer = Transformer(
            width=self.width, layers=self.layers, heads=self.heads,
            mlp_ratio=self.mlp_ratio, ls_init_value=self.ls_init_value,
            act=self.act, norm_eps=self.norm_eps, remat=self.remat,
            scan_layers=self.scan_layers,
            dtype=self.dtype, param_dtype=self.param_dtype, name="transformer",
        )
        inters = None
        if intermediates_cfg is not None:
            if self.scan_layers:
                raise NotImplementedError(
                    "forward_intermediates requires unrolled layers "
                    "(scan_layers=False)")
            if self.attentional_pool:
                raise NotImplementedError(
                    "forward_intermediates is not supported with "
                    "attentional_pool towers")
            x, inters = transformer(x, deterministic=deterministic,
                                    return_intermediates=True)
        else:
            x = transformer(x, attn_mask=attn_mask,
                            deterministic=deterministic)
        if fused_pad:
            x = x[:, :x.shape[1] - fused_pad]

        tokens = x
        if self.attentional_pool:
            # upstream bool-attentional_pool path: attn_pool -> ln_post ->
            # tok-pool -> proj; tokens = remaining (ln_post'd) query outputs
            pooled_ctx = AttentionalPooler(
                d_model=self.output_dim, context_dim=self.width,
                n_head=self.attn_pooler_heads, n_queries=self.attn_pooler_queries,
                dtype=self.dtype, param_dtype=self.param_dtype, name="attn_pool",
            )(x, deterministic=deterministic)
            normed = LayerNorm(eps=self.norm_eps, name="ln_post")(pooled_ctx)
            pooled, tokens = normed[:, 0], normed[:, 1:]
            proj = self.param(
                "proj", nn.initializers.normal(scale),
                (self.output_dim, self.output_dim), self.param_dtype,
            )
            return pooled @ proj.astype(pooled.dtype), tokens

        if self.pool_type == "avg":
            # with a class token present the reference pools the spatial
            # tokens only (transformer.py:885-902 semantics)
            pooled = (tokens.mean(axis=1) if self.no_class_token
                      else tokens[:, 1:].mean(axis=1))
        elif self.pool_type == "tok":
            pooled = tokens[:, 0]
        else:
            pooled = tokens

        ln_post = LayerNorm(eps=self.norm_eps, name="ln_post")
        pooled = ln_post(pooled)
        proj = self.param(
            "proj", nn.initializers.normal(scale), (self.width, self.output_dim),
            self.param_dtype,
        )
        pooled = jnp.matmul(
            pooled, proj.astype(pooled.dtype), preferred_element_type=jnp.float32
        ).astype(pooled.dtype)

        if intermediates_cfg is not None:
            cfg = dict(intermediates_cfg)
            fmt = cfg.get("output_fmt", "NCHW")
            assert fmt in ("NCHW", "NLC"), fmt
            take, _ = feature_take_indices(self.layers, cfg.get("indices"))
            sel = [inters[i] for i in take]
            if cfg.get("normalize_intermediates"):
                sel = [ln_post(t) for t in sel]
            ncls = 0 if self.no_class_token else 1
            prefix = [t[:, :ncls] for t in sel]
            spatial = [t[:, ncls:] for t in sel]
            if fmt == "NCHW":
                assert self.n_learnable_tokens == 0, (
                    "NCHW output requires a pure spatial token grid")
                spatial = [
                    t.reshape(t.shape[0], gh, gw, -1).transpose(0, 3, 1, 2)
                    for t in spatial
                ]
            out = {"image_intermediates": spatial}
            if cfg.get("output_extra_tokens"):
                out["image_intermediates_prefix"] = prefix
            if cfg.get("intermediates_only"):
                return out
            out["image_features"] = pooled
            return out

        if self.output_tokens:
            # XTag edit (reference transformer.py:860-876): project every token
            # into embed_dim space for the tag head.
            tokens = ln_post(tokens)
            tokens = jnp.matmul(
                tokens, proj.astype(tokens.dtype),
                preferred_element_type=jnp.float32,
            ).astype(tokens.dtype)
            return pooled, tokens

        return pooled

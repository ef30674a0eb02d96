"""Text transformer tower.

Mirrors reference TextTransformer (/root/reference/src/open_clip/transformer.py:904-1178)
with the XTag return contract: __call__ returns (projected_feature, token_seq)
where token_seq is the ln_final'd (unprojected) sequence (model.py:315-335).

The argmax-EOT pooling is a static take_along_axis — no dynamic shapes under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.layers import (
    LayerNorm,
    Transformer,
    feature_take_indices,
    gelu_exact,
)

Dtype = Any


def text_global_pool(x, text=None, pool_type: str = "argmax"):
    """Pool a [B, L, D] sequence (reference transformer.py:885-902)."""
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    if pool_type == "argmax":
        assert text is not None
        eot_idx = jnp.argmax(text, axis=-1)
        return jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
    return x


def build_causal_mask(length: int) -> jnp.ndarray:
    """Additive causal mask, upper triangle = -inf (reference builds the same)."""
    mask = jnp.full((length, length), -jnp.inf, dtype=jnp.float32)
    return jnp.triu(mask, k=1)


class TextTransformer(nn.Module):
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: Optional[int] = 512
    embed_cls: bool = False
    no_causal_mask: bool = False
    pad_id: int = 0
    pool_type: str = "argmax"
    proj_type: str = "linear"
    proj_bias: bool = False
    act: Callable = gelu_exact
    norm_eps: float = 1e-5
    remat: bool = False
    scan_layers: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text, deterministic: bool = True,
                 intermediates_cfg=None):
        """intermediates_cfg activates the forward_intermediates contract
        (reference transformer.py:1067-1136): dict with optional keys
        {indices, normalize_intermediates, intermediates_only,
        output_extra_tokens} returning the reference's output dict instead
        of (projected, seq)."""
        num_pos = self.context_length + (1 if self.embed_cls else 0)

        token_embedding = nn.Embed(
            self.vocab_size, self.width, name="token_embedding",
            dtype=self.dtype, param_dtype=self.param_dtype,
            embedding_init=nn.initializers.normal(0.02),
        )
        x = token_embedding(text)

        seq_len = text.shape[1] + (1 if self.embed_cls else 0)
        attn_mask = None if self.no_causal_mask else (
            build_causal_mask(num_pos)[:seq_len, :seq_len]
        )

        if self.embed_cls:
            cls_emb = self.param(
                "cls_emb", nn.initializers.normal(0.01), (self.width,),
                self.param_dtype,
            )
            cls_tok = jnp.broadcast_to(
                cls_emb.astype(x.dtype)[None, None], (x.shape[0], 1, self.width)
            )
            x = jnp.concatenate([x, cls_tok], axis=1)
            if attn_mask is not None:
                # cls token may attend everywhere; padded positions masked out
                # per-sample (reference transformer.py:1040-1063).
                pad_mask = (text == self.pad_id)  # [B, L]
                pad_mask = jnp.pad(pad_mask, ((0, 0), (0, 1)))
                add_mask = jnp.where(pad_mask, -jnp.inf, 0.0)[:, None, None, :]
                attn_mask = attn_mask[None, None] + add_mask

        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (num_pos, self.width), self.param_dtype,
        )
        x = x + pos.astype(x.dtype)[: x.shape[1]]

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
            x, inters = transformer(x, attn_mask=attn_mask,
                                    deterministic=deterministic,
                                    return_intermediates=True)
        else:
            x = transformer(x, attn_mask=attn_mask,
                            deterministic=deterministic)

        ln_final = LayerNorm(eps=self.norm_eps, name="ln_final")
        if self.embed_cls:
            # cls token appended at the end; pooled = cls, tokens = rest
            pooled, tokens = x[:, -1], x[:, :-1]
            pooled = ln_final(pooled)
            seq_out = tokens
        else:
            x = ln_final(x)
            pooled = text_global_pool(x, text, self.pool_type)
            seq_out = x

        if self.proj_type == "none" or not self.output_dim:
            projected = pooled
        elif self.proj_bias:
            projected = nn.Dense(
                self.output_dim, name="text_projection", dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(pooled)
        else:
            w = self.param(
                "text_projection", nn.initializers.normal(self.width**-0.5),
                (self.width, self.output_dim), self.param_dtype,
            )
            projected = jnp.matmul(
                pooled, w.astype(pooled.dtype), preferred_element_type=jnp.float32
            ).astype(pooled.dtype)

        if intermediates_cfg is not None:
            cfg = dict(intermediates_cfg)
            take, _ = feature_take_indices(self.layers, cfg.get("indices"))
            sel = [inters[i] for i in take]
            if cfg.get("normalize_intermediates"):
                sel = [ln_final(t) for t in sel]
            out = {}
            if self.embed_cls:
                if cfg.get("output_extra_tokens"):
                    out["text_intermediates_suffix"] = [t[:, -1:] for t in sel]
                sel = [t[:, :-1] for t in sel]
            out["text_intermediates"] = sel
            if cfg.get("intermediates_only"):
                return out
            out["text_features"] = projected
            return out

        return projected, seq_out

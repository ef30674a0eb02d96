"""Tag-recognition head: a cross-attention-only BERT (RAM/ALBEF style).

Mirrors the reference construction (model.py:270-283 + tagging_heads/bert.py):
a 2-layer BertModel whose embeddings and per-layer self-attention are deleted,
leaving [cross-attn(label queries <- image tokens) + FFN] x 2, post-LN with
eps 1e-12, gelu, hidden 768, 4 heads, encoder_width = CLIP embed_dim.

The 44 label-query embeddings (2 x num_tags) and the tag_fc scorer live in the
CLIP assembly (models/clip.py), matching where the reference keeps them.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, fused_attention, gelu_exact

Dtype = Any


class BertCrossAttention(nn.Module):
    """BertSelfAttention(is_cross_attention) + BertSelfOutput (post-LN)."""

    hidden_size: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, encoder_hidden, mask=None, deterministic=True):
        h = self.hidden_size
        dh = h // self.num_heads
        dense = lambda feats, name: nn.Dense(
            feats, name=name, dtype=self.dtype, param_dtype=self.param_dtype
        )
        q = dense(h, "query")(hidden)
        k = dense(h, "key")(encoder_hidden)
        v = dense(h, "value")(encoder_hidden)
        rng = (
            self.make_rng("dropout")
            if (self.dropout > 0 and not deterministic)
            else None
        )
        ctx = fused_attention(
            q, k, v, self.num_heads, mask=mask, dropout_rate=self.dropout,
            dropout_rng=rng, deterministic=deterministic,
        )

        out = dense(h, "out_dense")(ctx)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return LayerNorm(eps=1e-12, name="out_ln")(out + hidden)


class BertFFN(nn.Module):
    hidden_size: int
    intermediate_size: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.intermediate_size, name="intermediate",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = gelu_exact(h)
        h = nn.Dense(self.hidden_size, name="output", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return LayerNorm(eps=1e-12, name="output_ln")(h + x)


class TagBertHead(nn.Module):
    """Stack of [cross-attn + FFN] layers operating on label-query embeddings."""

    num_layers: int = 2
    hidden_size: int = 768
    num_heads: int = 4
    intermediate_size: int = 3072
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        label_embeds,          # [B, num_queries, hidden]
        encoder_hidden,        # [B, L, encoder_width]
        encoder_mask: Optional[jnp.ndarray] = None,  # [B, L] 1=attend
        deterministic: bool = True,
    ):
        add_mask = None
        if encoder_mask is not None:
            # BERT extended mask: (1 - m) * -10000 (transformers semantics)
            add_mask = ((1.0 - encoder_mask.astype(jnp.float32)) * -10000.0)[
                :, None, None, :
            ]
        x = label_embeds
        for i in range(self.num_layers):
            x = BertCrossAttention(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer_{i}_crossattention",
            )(x, encoder_hidden, mask=add_mask, deterministic=deterministic)
            x = BertFFN(
                hidden_size=self.hidden_size,
                intermediate_size=self.intermediate_size, dropout=self.dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}_ffn",
            )(x, deterministic=deterministic)
        return x

"""Flax BERT encoder (the PubMedBERT/BiomedCLIP text trunk).

Standard post-LN BERT matching HF transformers BertModel semantics:
embeddings (word + position + token_type, LN eps 1e-12, dropout) -> N layers of
[self-attention + output-LN, FFN + output-LN]. Weight conversion from HF torch
checkpoints in convert/hf_bert.py; parity-tested against transformers'
BertModel with shared random weights (no download needed).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, fused_attention, gelu_exact

Dtype = Any


class BertSelfAttentionLayer(nn.Module):
    hidden_size: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        h = self.hidden_size
        nh, dh = self.num_heads, self.hidden_size // self.num_heads
        dense = lambda f, name: nn.Dense(f, name=name, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        q, k, v = dense(h, "query")(x), dense(h, "key")(x), dense(h, "value")(x)
        rng = (
            self.make_rng("dropout")
            if (self.dropout > 0 and not deterministic)
            else None
        )
        ctx = fused_attention(
            q, k, v, nh, mask=mask, dropout_rate=self.dropout,
            dropout_rng=rng, deterministic=deterministic,
        )
        out = dense(h, "out_dense")(ctx)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return LayerNorm(eps=1e-12, name="out_ln")(out + x)


class BertEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        x = BertSelfAttentionLayer(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attention",
        )(x, mask=mask, deterministic=deterministic)
        h = nn.Dense(self.intermediate_size, name="intermediate",
                     dtype=self.dtype, param_dtype=self.param_dtype)(x)
        h = gelu_exact(h)
        h = nn.Dense(self.hidden_size, name="output", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return LayerNorm(eps=1e-12, name="output_ln")(h + x)


class BertModel(nn.Module):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.1
    pad_token_id: int = 0
    add_pooling_layer: bool = False
    # roberta-family positions: ids start at padding_idx+1 and skip pads
    # (transformers create_position_ids_from_input_ids semantics)
    roberta_positions: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        b, l = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != self.pad_token_id).astype(jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)

        emb = nn.Embed(self.vocab_size, self.hidden_size,
                       name="word_embeddings", dtype=self.dtype,
                       param_dtype=self.param_dtype)(input_ids)
        if self.roberta_positions:
            not_pad = (input_ids != self.pad_token_id).astype(jnp.int32)
            pos_ids = jnp.cumsum(not_pad, axis=1) * not_pad + self.pad_token_id
        else:
            pos_ids = jnp.arange(l)[None]
        emb = emb + nn.Embed(self.max_position_embeddings, self.hidden_size,
                             name="position_embeddings", dtype=self.dtype,
                             param_dtype=self.param_dtype)(pos_ids)
        emb = emb + nn.Embed(self.type_vocab_size, self.hidden_size,
                             name="token_type_embeddings", dtype=self.dtype,
                             param_dtype=self.param_dtype)(token_type_ids)
        emb = LayerNorm(eps=1e-12, name="embeddings_ln")(emb)
        x = nn.Dropout(self.dropout)(emb, deterministic=deterministic)

        ext_mask = ((1.0 - attention_mask.astype(jnp.float32))
                    * -10000.0)[:, None, None, :]
        for i in range(self.num_layers):
            x = BertEncoderLayer(
                hidden_size=self.hidden_size, num_heads=self.num_heads,
                intermediate_size=self.intermediate_size, dropout=self.dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layer_{i}",
            )(x, mask=ext_mask, deterministic=deterministic)

        pooled = None
        if self.add_pooling_layer:
            pooled = nn.Dense(self.hidden_size, name="pooler",
                              dtype=self.dtype,
                              param_dtype=self.param_dtype)(x[:, 0])
            pooled = jnp.tanh(pooled)
        return x, pooled

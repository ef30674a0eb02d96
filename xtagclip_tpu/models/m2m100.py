"""Flax M2M100 encoder (the nllb-clip-* text trunk).

Matches HF transformers M2M100Model.encoder semantics (reference builds these
via AutoModel + `.encoder`, src/open_clip/hf_model.py:123-126, arch registry
hf_configs.py "m2m_100"):

- Token embedding scaled by sqrt(d_model) (scale_embedding=True for NLLB).
- Sinusoidal positional embeddings (fairseq layout: [sin | cos] halves),
  offset 2, with pad-skipping position ids
  (create_position_ids_from_input_ids: cumsum(mask)*mask + padding_idx).
- Pre-norm encoder layers: LN -> scaled self-attention (q scaled by
  1/sqrt(d_head), q/k/v/out all biased) -> residual; LN -> fc1 -> relu ->
  fc2 -> residual. Final encoder-level LayerNorm.

Weight conversion from HF torch checkpoints in convert/hf_m2m100.py;
parity-tested against transformers M2M100Model with shared random weights.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, fused_attention

Dtype = Any


def sinusoidal_positions(num_positions: int, dim: int,
                         padding_idx: int = 1) -> np.ndarray:
    """fairseq/M2M100 sinusoidal table: [sin(pos*f) | cos(pos*f)] halves."""
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64)
                  * -(np.log(10000.0) / (half - 1)))
    ang = np.arange(num_positions, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    if padding_idx is not None:
        table[padding_idx] = 0.0
    return table.astype(np.float32)


class M2M100EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        dense = lambda f, name: nn.Dense(f, name=name, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        residual = x
        h = LayerNorm(name="self_attn_ln")(x)
        # HF scales q by 1/sqrt(d_head) before qk; fused_attention applies
        # the same default scale internally — don't double-apply.
        q = dense(self.d_model, "q_proj")(h)
        k = dense(self.d_model, "k_proj")(h)
        v = dense(self.d_model, "v_proj")(h)
        rng = (self.make_rng("dropout")
               if (self.dropout > 0 and not deterministic) else None)
        ctx = fused_attention(
            q, k, v, self.num_heads, mask=mask, dropout_rate=self.dropout,
            dropout_rng=rng, deterministic=deterministic,
        )
        h = dense(self.d_model, "out_proj")(ctx)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = residual + h

        residual = x
        h = LayerNorm(name="final_ln")(x)
        h = nn.relu(dense(self.ffn_dim, "fc1")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = dense(self.d_model, "fc2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return residual + h


class M2M100Encoder(nn.Module):
    """Returns the final hidden state sequence [B, L, d_model]."""

    vocab_size: int
    d_model: int = 1024
    num_layers: int = 12
    num_heads: int = 16
    ffn_dim: int = 4096
    max_position_embeddings: int = 1024
    pad_token_id: int = 1
    scale_embedding: bool = True
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    # sinusoidal table offset (M2M100SinusoidalPositionalEmbedding)
    POS_OFFSET = 2

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        b, l = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != self.pad_token_id).astype(jnp.int32)

        emb_scale = float(np.sqrt(self.d_model)) if self.scale_embedding else 1.0
        x = nn.Embed(self.vocab_size, self.d_model, name="embed_tokens",
                     dtype=self.dtype,
                     param_dtype=self.param_dtype)(input_ids) * emb_scale

        # pad-skipping position ids, looked up in a fixed sinusoidal table
        not_pad = (input_ids != self.pad_token_id).astype(jnp.int32)
        pos_ids = jnp.cumsum(not_pad, axis=1) * not_pad + self.pad_token_id
        table = jnp.asarray(sinusoidal_positions(
            self.max_position_embeddings + self.POS_OFFSET, self.d_model,
            padding_idx=self.pad_token_id,
        ), dtype=self.dtype)
        x = x + table[pos_ids]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        ext_mask = ((1.0 - attention_mask.astype(jnp.float32))
                    * -1e9)[:, None, None, :]
        for i in range(self.num_layers):
            x = M2M100EncoderLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                ffn_dim=self.ffn_dim, dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer_{i}",
            )(x, mask=ext_mask, deterministic=deterministic)

        return LayerNorm(name="layer_norm")(x)

"""TQN fusion head: a transformer decoder WITHOUT self-attention.

Mirrors reference CAR_heads/TQN_model.py:13-78 + transformer_decoder.py:146-240
(normalize_before=True path): queries cross-attend to the image/text token
sequence through 4 pre-norm layers (d_model 512, 4 heads, ffn 1024, relu,
dropout 0.1), then decoder_norm -> dropout -> MLP head 512->1024->512->256->1.

Both the memory and the queries are passed through decoder_norm before the
decoder (TQN_model.py:71-72) — an idiosyncrasy preserved for weight parity.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.models.layers import LayerNorm, MultiheadAttention

Dtype = Any


class TQNDecoderLayer(nn.Module):
    """Pre-norm decoder layer, self-attention removed (forward_pre with the
    self-attn block commented out in the reference)."""

    d_model: int = 512
    nhead: int = 4
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, deterministic=True, return_weights=False):
        tgt2 = LayerNorm(name="norm2")(tgt)
        attn = MultiheadAttention(
            num_heads=self.nhead, dropout=self.dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, name="multihead_attn",
        )
        if return_weights:
            tgt2, weights = attn(
                tgt2, memory, memory, deterministic=deterministic,
                return_weights=True,
            )
        else:
            # skip the weights-returning slow attention path when the maps
            # are discarded (the train step) — the fast fused lowering runs
            weights = None
            tgt2 = attn(tgt2, memory, memory, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)

        tgt2 = LayerNorm(name="norm3")(tgt)
        h = nn.Dense(self.dim_feedforward, name="linear1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(tgt2)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        tgt = tgt + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if return_weights:
            return tgt, weights
        return tgt


class TQNModel(nn.Module):
    embed_dim: int = 512
    class_num: int = 1
    num_layers: int = 4
    nhead: int = 4
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_features, text_features, deterministic=True,
                 return_atten=False):
        """image_features: [B, P, D] memory; text_features: [Q, D] or [B, Q, D]
        queries. Returns [B, Q, class_num] scores (squeezed by the caller)."""
        # kept for checkpoint parity with the reference logit_scale parameter
        self.param(
            "logit_scale",
            lambda key, shape, dtype: jnp.full(shape, np.log(1 / 0.07), dtype),
            (), self.param_dtype,
        )
        decoder_norm = LayerNorm(name="decoder_norm")
        memory = decoder_norm(image_features)
        if text_features.ndim == 2:
            queries = jnp.broadcast_to(
                text_features[None],
                (image_features.shape[0],) + text_features.shape,
            )
        else:
            queries = text_features
        queries = decoder_norm(queries)

        attn_maps = []
        x = queries
        for i in range(self.num_layers):
            layer = TQNDecoderLayer(
                d_model=self.embed_dim, nhead=self.nhead,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"decoder_layer_{i}",
            )
            if return_atten:
                x, w = layer(x, memory, deterministic=deterministic,
                             return_weights=True)
                attn_maps.append(w)
            else:
                x = layer(x, memory, deterministic=deterministic)
        x = decoder_norm(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        h = nn.Dense(1024, name="mlp_0", dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(512, name="mlp_1", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(256, name="mlp_2", dtype=self.dtype,
                     param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(self.class_num, name="mlp_3", dtype=self.dtype,
                       param_dtype=self.param_dtype)(h)
        if return_atten:
            return out, attn_maps
        return out

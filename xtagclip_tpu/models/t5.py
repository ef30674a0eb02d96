"""Flax T5/mT5 encoder stack (the mt5-* text trunk).

Matches HF transformers T5EncoderModel semantics (reference builds these via
AutoModel + `.encoder`, src/open_clip/hf_model.py:123-126, arch registry
hf_configs.py "mt5"):

- RMSNorm (T5LayerNorm): no mean subtraction, no bias, fp32 variance.
- Relative position bias: bucketed (bidirectional, 32 buckets, max distance
  128), embedding lives on the stack and is added to every layer's attention
  scores (HF stores it on block 0 and shares it).
- Attention is UNSCALED (no 1/sqrt(d_k) — T5 folds the scale into init);
  q/k/v/o are bias-free; inner dim = num_heads * d_kv (may differ from
  d_model).
- Gated feed-forward (mT5 / t5-v1.1): wo(act(wi_0(x)) * wi_1(x)) with
  gelu_new (tanh approximation).
- Pre-norm residual blocks; final RMSNorm after the stack.

Weight conversion from HF torch checkpoints in convert/hf_t5.py;
parity-tested against transformers T5EncoderModel with shared random weights.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           self.param_dtype)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return y.astype(self.dtype) * scale.astype(self.dtype)


def relative_position_bucket(relative_position, num_buckets: int = 32,
                             max_distance: int = 128):
    """Bidirectional T5 bucket ids for (memory_pos - query_pos)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # log only applies where n >= max_exact (is_small selects the rest);
    # floor at 1 to keep log finite there
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5SelfAttention(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias, mask_bias=None, deterministic=True):
        inner = self.num_heads * self.d_kv
        dense = lambda f, name: nn.Dense(f, use_bias=False, name=name,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        b, l, _ = x.shape
        q = dense(inner, "q")(x).reshape(b, l, self.num_heads, self.d_kv)
        k = dense(inner, "k")(x).reshape(b, l, self.num_heads, self.d_kv)
        v = dense(inner, "v")(x).reshape(b, l, self.num_heads, self.d_kv)
        # NOTE: no 1/sqrt(d_k) scaling (T5 semantics)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores + position_bias
        if mask_bias is not None:
            scores = scores + mask_bias
        attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        if self.dropout > 0 and not deterministic:
            attn = nn.Dropout(self.dropout)(attn, deterministic=False)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, inner)
        return dense(self.d_model, "o")(ctx)


class T5GatedFF(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        dense = lambda f, name: nn.Dense(f, use_bias=False, name=name,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        # gelu_new == tanh-approximate gelu (mT5 dense_act_fn)
        h = jax.nn.gelu(dense(self.d_ff, "wi_0")(x), approximate=True)
        h = h * dense(self.d_ff, "wi_1")(x)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return dense(self.d_model, "wo")(h)


class T5EncoderStack(nn.Module):
    """T5/mT5 encoder: returns the final hidden state sequence."""

    vocab_size: int
    d_model: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    d_ff: int = 2048
    num_buckets: int = 32
    max_distance: int = 128
    dropout: float = 0.1
    layer_norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        b, l = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, l), jnp.int32)
        x = nn.Embed(self.vocab_size, self.d_model, name="shared",
                     dtype=self.dtype, param_dtype=self.param_dtype)(input_ids)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        # shared relative position bias [1, H, L, L]
        pos = jnp.arange(l)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = relative_position_bucket(rel, self.num_buckets,
                                           self.max_distance)
        relpos = nn.Embed(self.num_buckets, self.num_heads,
                          name="relpos_bias", dtype=jnp.float32,
                          param_dtype=self.param_dtype)(buckets)
        position_bias = relpos.transpose(2, 0, 1)[None].astype(jnp.float32)
        mask_bias = ((1.0 - attention_mask.astype(jnp.float32))
                     * -1e9)[:, None, None, :]

        ln = lambda name: RMSNorm(eps=self.layer_norm_eps, dtype=self.dtype,
                                  param_dtype=self.param_dtype, name=name)
        drop = nn.Dropout(self.dropout)
        for i in range(self.num_layers):
            h = ln(f"block_{i}_attn_ln")(x)
            h = T5SelfAttention(
                d_model=self.d_model, num_heads=self.num_heads, d_kv=self.d_kv,
                dropout=self.dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"block_{i}_attn",
            )(h, position_bias, mask_bias, deterministic=deterministic)
            x = x + drop(h, deterministic=deterministic)
            h = ln(f"block_{i}_ff_ln")(x)
            h = T5GatedFF(
                d_model=self.d_model, d_ff=self.d_ff, dropout=self.dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block_{i}_ff",
            )(h, deterministic=deterministic)
            x = x + drop(h, deterministic=deterministic)

        x = ln("final_ln")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)

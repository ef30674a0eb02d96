"""CoCa: contrastive + captioning model with autoregressive generation.

Mirrors reference coca_model.py:89-330 + transformer.py:1180-1287
(MultimodalTransformer): CLS-pooled text tower (embed_cls), attentionally
pooled vision tower, a multimodal decoder of interleaved [causal self-attn,
cross-attn-to-image] blocks projecting to vocab logits, and generation
(top-k / top-p sampling and beam search) built on a jitted static-shape
decode step — no dynamic shapes under jit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from xtagclip_tpu.models.clip import l2_normalize
from xtagclip_tpu.models.layers import (
    LayerNorm,
    ResidualAttentionBlock,
    gelu_exact,
)
from xtagclip_tpu.models.text import build_causal_mask

Dtype = Any


class MultimodalTransformer(nn.Module):
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 76
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    output_dim: int = 49408  # vocab size (decoder head)
    act: Any = gelu_exact
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embs, text_embs, deterministic=True):
        seq_len = text_embs.shape[1]
        attn_mask = build_causal_mask(self.context_length)[:seq_len, :seq_len]
        x = text_embs
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                num_heads=self.heads, mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value, act=self.act,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resblocks_{i}",
            )(x, attn_mask=attn_mask, deterministic=deterministic)
            x = ResidualAttentionBlock(
                num_heads=self.heads, mlp_ratio=self.mlp_ratio,
                ls_init_value=self.ls_init_value, act=self.act,
                is_cross_attention=True, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"cross_attn_{i}",
            )(x, k_x=image_embs, v_x=image_embs, deterministic=deterministic)
        x = LayerNorm(name="ln_final")(x)
        w = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.output_dim), self.param_dtype,
        )
        return jnp.matmul(
            x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(jnp.float32)


class CoCa(nn.Module):
    visual: nn.Module
    text: nn.Module
    text_decoder: nn.Module
    embed_dim: int
    init_logit_scale: float = float(np.log(1 / 0.07))
    init_logit_bias: Optional[float] = None
    pad_id: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape, dtype: jnp.full(shape, self.init_logit_scale, dtype),
            (), self.param_dtype,
        )
        if self.init_logit_bias is not None:
            self.logit_bias = self.param(
                "logit_bias",
                lambda key, shape, dtype: jnp.full(shape, self.init_logit_bias, dtype),
                (), self.param_dtype,
            )
        else:
            self.logit_bias = None

    def _encode_image(self, images, normalize=True, deterministic=True):
        latent, tokens = self.visual(images, deterministic=deterministic)
        return (l2_normalize(latent) if normalize else latent), tokens

    def _encode_text(self, text, normalize=True, deterministic=True):
        latent, tokens = self.text(text, deterministic=deterministic)
        return (l2_normalize(latent) if normalize else latent), tokens

    def encode_image(self, images, normalize=True, deterministic=True):
        return self._encode_image(images, normalize, deterministic)[0]

    def encode_text(self, text, normalize=True, deterministic=True):
        return self._encode_text(text, normalize, deterministic)[0]

    def decode_logits(self, image_embs, token_embs, deterministic=True):
        return self.text_decoder(image_embs, token_embs,
                                 deterministic=deterministic)

    def __call__(self, image, text=None, image_latent=None, image_embs=None,
                 output_labels: bool = True, deterministic=True):
        if image_latent is None or image_embs is None:
            image_latent, image_embs = self._encode_image(
                image, deterministic=deterministic
            )
        if text is None:
            return {"image_features": image_latent, "image_embs": image_embs}

        text_latent, token_embs = self._encode_text(
            text, deterministic=deterministic
        )
        labels = text[:, 1:] if output_labels else None
        if output_labels:
            token_embs = token_embs[:, :-1]
        logits = self.text_decoder(image_embs, token_embs,
                                   deterministic=deterministic)
        out = {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            "logit_scale": jnp.exp(self.logit_scale),
        }
        if labels is not None:
            out["labels"] = labels
        if self.logit_bias is not None:
            out["logit_bias"] = self.logit_bias
        return out


# --------------------------------------------------------------------------
# generation (reference coca_model.py:204-480)
# --------------------------------------------------------------------------

SOT_ID = 49406
EOT_ID = 49407


def generate(
    module,
    params,
    image,
    seq_len: int = 30,
    max_seq_len: int = 77,
    temperature: float = 1.0,
    generation_type: str = "top_k",
    top_p: float = 0.1,
    top_k: int = 1,
    pad_token_id: int = 0,
    eos_token_id: int = EOT_ID,
    sot_token_id: int = SOT_ID,
    num_beams: int = 6,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    seed: int = 0,
    fixed_output_length: bool = False,
):
    """Autoregressive caption generation. Returns int32 [B, <=seq_len]."""
    rng = np.random.default_rng(seed)
    out = module.apply(
        {"params": params}, jnp.asarray(image), method=lambda m, im: m(im)
    )
    image_embs = out["image_embs"]
    b = image_embs.shape[0]
    ctx = min(max_seq_len, seq_len)

    step = _make_step(module, params)

    if generation_type == "beam_search":
        return _beam_search(
            step, image_embs, b, ctx, num_beams, sot_token_id, eos_token_id,
            pad_token_id, min_seq_len, fixed_output_length, seq_len,
        )

    tokens = np.full((b, ctx), pad_token_id, np.int32)
    tokens[:, 0] = sot_token_id
    finished = np.zeros(b, bool)
    for pos in range(1, ctx):
        logits = np.asarray(
            step(image_embs, jnp.asarray(tokens), jnp.int32(pos))
        ) / max(temperature, 1e-6)
        if repetition_penalty != 1.0:
            for i in range(b):
                seen = tokens[i, :pos]
                logits[i, seen] = np.where(
                    logits[i, seen] > 0,
                    logits[i, seen] / repetition_penalty,
                    logits[i, seen] * repetition_penalty,
                )
        if pos < min_seq_len:
            logits[:, eos_token_id] = -np.inf
        if generation_type == "top_k":
            kth = np.sort(logits, axis=1)[:, -top_k][:, None]
            logits = np.where(logits < kth, -np.inf, logits)
        elif generation_type == "top_p":
            sorted_idx = np.argsort(-logits, axis=1)
            sorted_logits = np.take_along_axis(logits, sorted_idx, axis=1)
            probs = _softmax(sorted_logits)
            cum = np.cumsum(probs, axis=1)
            cutoff = cum > (1 - top_p)
            cutoff[:, 0] = False  # always keep the top token
            mask = np.zeros_like(logits, bool)
            np.put_along_axis(mask, sorted_idx, cutoff, axis=1)
            logits = np.where(mask, -np.inf, logits)
        else:
            raise ValueError(generation_type)
        probs = _softmax(logits)
        nxt = np.array([rng.choice(probs.shape[1], p=probs[i])
                        for i in range(b)], np.int32)
        nxt = np.where(finished, pad_token_id, nxt)
        tokens[:, pos] = nxt
        finished |= nxt == eos_token_id
        if finished.all():
            tokens = tokens[:, : pos + 1]
            break
    if fixed_output_length and tokens.shape[1] < seq_len:
        pad = np.full((b, seq_len - tokens.shape[1]), pad_token_id, np.int32)
        tokens = np.concatenate([tokens, pad], axis=1)
    return tokens


def _make_step(module, params):
    @jax.jit
    def step(image_embs, tokens, pos):
        out = module.apply(
            {"params": params}, None, tokens, image_latent=jnp.zeros((1,)),
            image_embs=image_embs, output_labels=False,
            method=lambda m, img, txt, image_latent, image_embs, output_labels:
            m(img, txt, image_latent=image_latent, image_embs=image_embs,
              output_labels=output_labels),
        )
        return out["logits"][:, pos - 1]

    return step


def _softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _beam_search(step, image_embs, b, ctx, num_beams, sot, eos, pad,
                 min_len, fixed_output_length, seq_len):
    """Standard beam search (reference uses grouped beams; single-group here,
    same interface)."""
    eb = jnp.repeat(image_embs, num_beams, axis=0)  # [B*K, ...]
    tokens = np.full((b * num_beams, ctx), pad, np.int32)
    tokens[:, 0] = sot
    scores = np.full((b, num_beams), -np.inf)
    scores[:, 0] = 0.0
    done = np.zeros((b, num_beams), bool)
    for pos in range(1, ctx):
        logits = np.asarray(step(eb, jnp.asarray(tokens), jnp.int32(pos)))
        logp = logits - _logsumexp(logits)
        if pos < min_len:
            logp[:, eos] = -np.inf
        v = logp.shape[1]
        logp = logp.reshape(b, num_beams, v)
        # finished beams only extend with pad at no cost
        logp = np.where(done[..., None], -np.inf, logp)
        pad_col = np.where(done, 0.0, -np.inf)
        cand = scores[..., None] + logp  # [B, K, V]
        flat = cand.reshape(b, num_beams * v)
        flat = np.concatenate([flat, (scores + pad_col)], axis=1)
        top = np.argsort(-flat, axis=1)[:, :num_beams]
        new_tokens = np.empty_like(tokens.reshape(b, num_beams, ctx))
        new_scores = np.empty_like(scores)
        new_done = np.zeros_like(done)
        tok3 = tokens.reshape(b, num_beams, ctx)
        for i in range(b):
            for kk, t in enumerate(top[i]):
                if t >= num_beams * v:  # carry a finished beam forward
                    beam = t - num_beams * v
                    new_tokens[i, kk] = tok3[i, beam]
                    new_scores[i, kk] = scores[i, beam]
                    new_done[i, kk] = True
                else:
                    beam, tok_id = divmod(int(t), v)
                    new_tokens[i, kk] = tok3[i, beam]
                    new_tokens[i, kk, pos] = tok_id
                    new_scores[i, kk] = flat[i, t]
                    new_done[i, kk] = tok_id == eos
        tokens = new_tokens.reshape(b * num_beams, ctx)
        scores, done = new_scores, new_done
        if done.all():
            tokens = tokens[:, : pos + 1]
            break
    best = np.argmax(scores, axis=1)
    out = tokens.reshape(b, num_beams, -1)[np.arange(b), best]
    if fixed_output_length and out.shape[1] < seq_len:
        out = np.concatenate(
            [out, np.full((b, seq_len - out.shape[1]), pad, np.int32)], axis=1
        )
    return out


def _logsumexp(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))

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
    num_beam_groups: int = 3,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    diversity_penalty: float = 0.0,
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
            step, image_embs, b, ctx, num_beams, num_beam_groups,
            diversity_penalty, sot_token_id, eos_token_id,
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
            logits = top_p_filter(logits, top_p)
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


def top_p_filter(logits: np.ndarray, top_p: float) -> np.ndarray:
    """HF TopPLogitsWarper semantics (the reference's executed warper,
    coca_model.py:33,268): keep the smallest descending-prob set whose
    cumulative probability reaches top_p; mask the rest to -inf. The removal
    mask is shifted one right so the crossing token itself survives."""
    sorted_idx = np.argsort(-logits, axis=1)
    sorted_logits = np.take_along_axis(logits, sorted_idx, axis=1)
    probs = _softmax(sorted_logits)
    cum = np.cumsum(probs, axis=1)
    # remove a token iff the mass BEFORE it already reaches top_p — the
    # descending-order equivalent of HF's ascending `cum <= 1 - top_p`
    # (boundary inclusive), so exactly the crossing token survives
    cutoff = (cum - probs) >= top_p
    cutoff[:, 0] = False  # always keep the top token
    mask = np.zeros_like(logits, bool)
    np.put_along_axis(mask, sorted_idx, cutoff, axis=1)
    return np.where(mask, -np.inf, logits)


def _beam_search(step, image_embs, b, ctx, num_beams, num_beam_groups,
                 diversity_penalty, sot, eos, pad, min_len,
                 fixed_output_length, seq_len):
    """Grouped (diverse) beam search, HF BeamSearchScorer semantics
    (reference coca_model.py:331-478: num_beam_groups sub-searches share one
    decoder step per position; groups are selected sequentially so later
    groups can be penalized for reusing earlier groups' tokens).

    length_penalty=1.0, early_stopping=False, one returned hypothesis per
    sample — the reference's BeamSearchScorer defaults. diversity_penalty>0
    adds the Hamming diversity term (HF HammingDiversityLogitsProcessor);
    the reference runs with only MinLength processing, i.e. penalty 0.
    All beams of all groups run in ONE jitted decoder step per position.
    """
    if num_beams % num_beam_groups != 0:
        raise ValueError(
            f"num_beams ({num_beams}) must be divisible by num_beam_groups "
            f"({num_beam_groups})"
        )
    gsz = num_beams // num_beam_groups
    eb = jnp.repeat(image_embs, num_beams, axis=0)  # [B*K, ...]
    tokens = np.full((b * num_beams, ctx), pad, np.int32)
    tokens[:, 0] = sot
    scores = np.full((b, num_beams), -1e9, np.float32)
    scores[:, ::gsz] = 0.0  # one live beam per group at t=0
    # finished hypotheses per (sample, group): list of (norm_score, seq[ctx])
    hyps = [[[] for _ in range(num_beam_groups)] for _ in range(b)]
    done = np.zeros((b, num_beam_groups), bool)
    pos = 0  # stays 0 when ctx == 1 (no decode positions); finalize handles it

    def group_done(i, g, best_running, cur_len):
        # early_stopping=False: done when no running beam can still beat the
        # worst kept hypothesis (HF BeamHypotheses.is_done)
        if len(hyps[i][g]) < gsz:
            return False
        worst = min(h[0] for h in hyps[i][g])
        return worst >= best_running / cur_len  # length_penalty = 1.0

    for pos in range(1, ctx):
        logits = np.asarray(step(eb, jnp.asarray(tokens), jnp.int32(pos)))
        logp = (logits - _logsumexp(logits)).astype(np.float64)
        if pos < min_len:
            logp[:, eos] = -np.inf
        v = logp.shape[1]
        logp = logp.reshape(b, num_beams, v)
        tok3 = tokens.reshape(b, num_beams, ctx)
        new_tok3 = tok3.copy()
        current_tokens = np.full((b, num_beams), pad, np.int32)

        for g in range(num_beam_groups):
            s, e = g * gsz, (g + 1) * gsz
            glogp = logp[:, s:e]
            if diversity_penalty > 0.0 and g > 0:
                glogp = glogp.copy()
                for i in range(b):
                    freq = np.bincount(current_tokens[i, :s], minlength=v)
                    glogp[i] -= diversity_penalty * freq[None, :]
            cand = scores[:, s:e, None].astype(np.float64) + glogp  # [B,gsz,V]
            flat = cand.reshape(b, gsz * v)
            k2 = min(2 * gsz, flat.shape[1])
            part = np.argpartition(-flat, k2 - 1, axis=1)[:, :k2]

            for i in range(b):
                if done[i, g]:
                    continue
                order = part[i][np.argsort(-flat[i, part[i]])]
                new_rows = np.empty((gsz, ctx), np.int32)
                new_sc = np.full(gsz, -1e9, np.float64)
                kept = 0
                for rank, t in enumerate(order):
                    beam, tok_id = divmod(int(t), v)
                    sc = float(flat[i, t])
                    if tok_id == eos:
                        # HF: candidates ranked past the group size never
                        # become hypotheses
                        if rank < gsz:
                            seq = tok3[i, s + beam].copy()
                            seq[pos] = eos
                            # HF BeamHypotheses normalizes by the FULL
                            # sequence length incl. the SOT token = pos + 1
                            hyps[i][g].append((sc / (pos + 1), seq))
                            if len(hyps[i][g]) > gsz:  # prune worst
                                hyps[i][g].remove(min(hyps[i][g],
                                                      key=lambda h: h[0]))
                        continue
                    new_rows[kept] = tok3[i, s + beam]
                    new_rows[kept, pos] = tok_id
                    new_sc[kept] = sc
                    kept += 1
                    if kept == gsz:
                        break
                new_tok3[i, s:e] = new_rows
                scores[i, s:e] = new_sc
                current_tokens[i, s:e] = new_rows[:, pos]
                if group_done(i, g, float(new_sc.max()), pos + 1):
                    done[i, g] = True

        tokens = new_tok3.reshape(b * num_beams, ctx)
        if done.all():
            break

    # finalize: flush still-running beams of unfinished groups as hypotheses
    tok3 = tokens.reshape(b, num_beams, ctx)
    final_len = min(pos + 1, ctx)
    out = np.full((b, final_len), pad, np.int32)
    for i in range(b):
        for g in range(num_beam_groups):
            if not done[i, g]:
                s = g * gsz
                for k in range(gsz):
                    if scores[i, s + k] > -1e8:
                        hyps[i][g].append(
                            (float(scores[i, s + k]) / (pos + 1),
                             tok3[i, s + k].copy())
                        )
        best = max((h for g in range(num_beam_groups) for h in hyps[i][g]),
                   key=lambda h: h[0])
        out[i] = best[1][:final_len]
    if fixed_output_length and out.shape[1] < seq_len:
        out = np.concatenate(
            [out, np.full((b, seq_len - out.shape[1]), pad, np.int32)], axis=1
        )
    return out


def _logsumexp(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))

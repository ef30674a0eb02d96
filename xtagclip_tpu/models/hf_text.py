"""HF-style text tower: BERT / mT5 / NLLB trunk + pooler + projection.

Mirrors reference hf_model.py:96-193 (HFTextEncoder) + hf_configs.py arch
registry: attention-masked encoder forward, pooler_type in {mean_pooler,
cls_pooler, cls_last_hidden_state_pooler, max_pooler}, proj 'linear' (no
bias) or 'mlp' (d -> (d+out)//2 -> out, GELU, no biases). Returns
(projected, token_seq) per the XTag text contract.

Trunk families (reference builds encoder-decoder models via AutoModel +
`.encoder`, hf_model.py:123-126):
- bert / roberta / xlm-roberta -> models/bert.py (pad-skipping positions for
  the roberta family)
- mt5 -> models/t5.py (RMSNorm, relative position bias, gated-GELU FF)
- nllb / m2m100 -> models/m2m100.py (sinusoidal positions, pre-norm, relu)

Unknown model names raise NotImplementedError — silently defaulting to BERT
shapes would build a wrong architecture that can never load its checkpoint.

No transformers runtime dependency; HF torch checkpoints load through
convert/hf_bert.py, convert/hf_t5.py, convert/hf_m2m100.py.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.bert import BertModel
from xtagclip_tpu.models.layers import gelu_exact

Dtype = Any

DEFAULT_BERT_CFG = dict(
    vocab_size=30522, hidden_size=768, num_layers=12, num_heads=12,
    intermediate_size=3072, max_position_embeddings=512,
)

# name-keyed shape presets for known hub models (no-egress environment:
# config.json may not be cached locally; reference hf_configs.py analogue)
_KNOWN_HF_SHAPES = {
    "roberta-base": dict(vocab_size=50265, max_position_embeddings=514),
    "roberta-large": dict(vocab_size=50265, hidden_size=1024, num_layers=24,
                          num_heads=16, intermediate_size=4096,
                          max_position_embeddings=514),
    "xlm-roberta-base": dict(vocab_size=250002, max_position_embeddings=514),
    "xlm-roberta-large": dict(vocab_size=250002, hidden_size=1024,
                              num_layers=24, num_heads=16,
                              intermediate_size=4096,
                              max_position_embeddings=514),
    # T5 family (family="t5")
    "mt5-base": dict(vocab_size=250112, d_model=768, num_layers=12,
                     num_heads=12, d_kv=64, d_ff=2048),
    "mt5-xl": dict(vocab_size=250112, d_model=2048, num_layers=24,
                   num_heads=32, d_kv=64, d_ff=5120),
    # M2M100/NLLB family (family="m2m100")
    "nllb-200-distilled-600m": dict(vocab_size=256206, d_model=1024,
                                    num_layers=12, num_heads=16,
                                    ffn_dim=4096,
                                    max_position_embeddings=1024),
    "nllb-200-distilled-1.3b": dict(vocab_size=256206, d_model=1024,
                                    num_layers=24, num_heads=16,
                                    ffn_dim=8192,
                                    max_position_embeddings=1024),
}


def _is_roberta(name: str) -> bool:
    return "roberta" in name.lower()


def detect_family(model_name: str) -> str:
    """Pick the trunk family from the model name (hf_configs.py arch dict)."""
    s = model_name.lower()
    if "mt5" in s or s.endswith("t5") or "/t5" in s or s.startswith("t5-"):
        return "t5"
    if "nllb" in s or "m2m" in s:
        return "m2m100"
    if "bert" in s or "roberta" in s:  # covers PubMedBERT/BiomedBERT/BiomedNLP
        return "bert"
    raise NotImplementedError(
        f"HF text tower {model_name!r}: unknown architecture family "
        f"(supported: bert/roberta/xlm-roberta, mt5/t5, nllb/m2m100). "
        f"Refusing to silently default to BERT shapes."
    )


def _cfg_from_local_json(c: dict, path: str) -> dict:
    """Translate a local HF config.json into trunk kwargs + family."""
    model_type = c.get("model_type") or detect_family(path)
    if model_type in ("t5", "mt5"):
        return dict(
            family="t5",
            vocab_size=c.get("vocab_size", 250112),
            d_model=c.get("d_model", 768),
            num_layers=c.get("num_layers", 12),
            num_heads=c.get("num_heads", 12),
            d_kv=c.get("d_kv", 64),
            d_ff=c.get("d_ff", 2048),
            num_buckets=c.get("relative_attention_num_buckets", 32),
            max_distance=c.get("relative_attention_max_distance", 128),
            pad_token_id=c.get("pad_token_id", 0),
        )
    if model_type == "m2m_100":
        return dict(
            family="m2m100",
            vocab_size=c.get("vocab_size", 256206),
            d_model=c.get("d_model", 1024),
            num_layers=c.get("encoder_layers", 12),
            num_heads=c.get("encoder_attention_heads", 16),
            ffn_dim=c.get("encoder_ffn_dim", 4096),
            max_position_embeddings=c.get("max_position_embeddings", 1024),
            scale_embedding=c.get("scale_embedding", True),
            pad_token_id=c.get("pad_token_id", 1),
        )
    if model_type in ("bert", "roberta", "xlm-roberta") or "bert" in path.lower():
        return dict(
            family="bert",
            vocab_size=c.get("vocab_size", 30522),
            hidden_size=c.get("hidden_size", 768),
            num_layers=c.get("num_hidden_layers", 12),
            num_heads=c.get("num_attention_heads", 12),
            intermediate_size=c.get("intermediate_size", 3072),
            max_position_embeddings=c.get("max_position_embeddings", 512),
            pad_token_id=c.get(
                "pad_token_id",
                1 if _is_roberta(c.get("model_type", path)) else 0),
            roberta_positions=_is_roberta(c.get("model_type", path)),
        )
    raise NotImplementedError(
        f"HF text tower config at {path}: unsupported model_type "
        f"{model_type!r}"
    )


def resolve_hf_config(model_name: str) -> dict:
    """Read config from a local HF checkout when available, else name-keyed
    presets (reference hf_configs.py analogue). Returns trunk kwargs plus a
    'family' key. Raises NotImplementedError for unknown architectures —
    never silently defaults. Zero-egress environment: no hub downloads."""
    import json
    import os

    path = model_name.replace("hf-hub:", "")
    for base in (path, os.path.expanduser(f"~/.cache/huggingface/{path}")):
        cfg_path = os.path.join(base, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                return _cfg_from_local_json(json.load(f), path)

    family = detect_family(path)
    short = path.split("/")[-1].lower()
    preset = None
    for key, p in _KNOWN_HF_SHAPES.items():
        if short.startswith(key):
            preset = dict(p)
            break
    if family == "t5":
        cfg = dict(vocab_size=250112, d_model=768, num_layers=12,
                   num_heads=12, d_kv=64, d_ff=2048, pad_token_id=0)
        cfg.update(preset or {})
        cfg["family"] = "t5"
        return cfg
    if family == "m2m100":
        cfg = dict(vocab_size=256206, d_model=1024, num_layers=12,
                   num_heads=16, ffn_dim=4096, max_position_embeddings=1024,
                   pad_token_id=1)
        cfg.update(preset or {})
        cfg["family"] = "m2m100"
        return cfg
    # bert family
    cfg = dict(DEFAULT_BERT_CFG)
    cfg.update(preset or {})
    if _is_roberta(path):
        cfg["pad_token_id"] = 1
        cfg["roberta_positions"] = True
    cfg["family"] = "bert"
    return cfg


class HFTextEncoder(nn.Module):
    model_name: str
    output_dim: int
    proj_type: str = "mlp"
    pooler_type: str = "mean_pooler"
    pad_token_id: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = resolve_hf_config(self.model_name)
        family = cfg.pop("family")
        pad_id = cfg.pop("pad_token_id", self.pad_token_id)
        attn_mask = (input_ids != pad_id).astype(jnp.int32)
        hf_pooled = None
        if family == "bert":
            use_hf_pooler = self.pooler_type == "cls_pooler"
            seq, hf_pooled = BertModel(
                add_pooling_layer=use_hf_pooler, pad_token_id=pad_id,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="transformer", **cfg,
            )(input_ids, attention_mask=attn_mask,
              deterministic=deterministic)
        elif family == "t5":
            from xtagclip_tpu.models.t5 import T5EncoderStack

            seq = T5EncoderStack(
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="transformer", **cfg,
            )(input_ids, attention_mask=attn_mask,
              deterministic=deterministic)
        elif family == "m2m100":
            from xtagclip_tpu.models.m2m100 import M2M100Encoder

            seq = M2M100Encoder(
                pad_token_id=pad_id, dtype=self.dtype,
                param_dtype=self.param_dtype, name="transformer", **cfg,
            )(input_ids, attention_mask=attn_mask,
              deterministic=deterministic)
        else:  # pragma: no cover - resolve_hf_config already raises
            raise NotImplementedError(family)

        if self.pooler_type == "mean_pooler":
            m = attn_mask[..., None].astype(seq.dtype)
            pooled = (seq * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1)
            tokens = seq
        elif self.pooler_type == "max_pooler":
            m = attn_mask[..., None].astype(bool)
            pooled = jnp.where(m, seq, -jnp.inf).max(axis=1)
            tokens = seq
        elif self.pooler_type == "cls_last_hidden_state_pooler":
            pooled = seq[:, 0]
            tokens = seq[:, 1:]
        elif self.pooler_type == "cls_pooler":
            # non-BERT trunks have no pooling head: ClsPooler falls back to
            # last_hidden_state[:, 0] (reference hf_model.py:56-66)
            pooled = hf_pooled if hf_pooled is not None else seq[:, 0]
            tokens = seq[:, 1:]
        else:
            raise ValueError(f"unknown pooler {self.pooler_type}")

        d_model = seq.shape[-1]
        if self.proj_type == "linear":
            pooled = nn.Dense(self.output_dim, use_bias=False, name="proj",
                              dtype=self.dtype,
                              param_dtype=self.param_dtype)(pooled)
        elif self.proj_type == "mlp":
            hidden = (d_model + self.output_dim) // 2
            fc1 = nn.Dense(hidden, use_bias=False, name="proj_fc1",
                           dtype=self.dtype, param_dtype=self.param_dtype)
            fc2 = nn.Dense(self.output_dim, use_bias=False, name="proj_fc2",
                           dtype=self.dtype, param_dtype=self.param_dtype)
            pooled = fc2(gelu_exact(fc1(pooled)))
        elif self.proj_type not in (None, "none"):
            raise ValueError(f"unknown proj {self.proj_type}")

        return pooled, tokens

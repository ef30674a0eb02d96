"""HF-style text tower: BERT trunk + pooler + projection.

Mirrors reference hf_model.py:96-193 (HFTextEncoder): attention-masked BERT
forward, pooler_type in {mean_pooler, cls_pooler, cls_last_hidden_state_pooler,
max_pooler}, proj 'linear' (no bias) or 'mlp' (d -> (d+out)//2 -> out, GELU,
no biases). Returns (projected, token_seq) per the XTag text contract.

The trunk is the native flax BertModel — no transformers runtime dependency;
HF torch checkpoints load through convert/hf_bert.py.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from xtagclip_tpu.models.bert import BertModel
from xtagclip_tpu.models.layers import gelu_exact

Dtype = Any

# minimal arch registry (reference hf_configs.py); bert-family only for now
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
}


def _is_roberta(name: str) -> bool:
    return "roberta" in name.lower()


def resolve_hf_config(model_name: str) -> dict:
    """Read config from a local HF checkout when available, else name-keyed
    presets / BERT-base defaults (PubMedBERT == BERT-base shape). Zero-egress
    environment: no hub downloads."""
    import json
    import os

    path = model_name.replace("hf-hub:", "")
    for base in (path, os.path.expanduser(f"~/.cache/huggingface/{path}")):
        cfg_path = os.path.join(base, "config.json")
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                c = json.load(f)
            return dict(
                vocab_size=c.get("vocab_size", 30522),
                hidden_size=c.get("hidden_size", 768),
                num_layers=c.get("num_hidden_layers", 12),
                num_heads=c.get("num_attention_heads", 12),
                intermediate_size=c.get("intermediate_size", 3072),
                max_position_embeddings=c.get("max_position_embeddings", 512),
                pad_token_id=c.get("pad_token_id",
                                   1 if _is_roberta(c.get("model_type", path))
                                   else 0),
                roberta_positions=_is_roberta(c.get("model_type", path)),
            )
    cfg = dict(DEFAULT_BERT_CFG)
    short = path.split("/")[-1].lower()
    for key, preset in _KNOWN_HF_SHAPES.items():
        if short.startswith(key):
            cfg.update(preset)
            break
    if _is_roberta(path):
        cfg["pad_token_id"] = 1
        cfg["roberta_positions"] = True
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
        pad_id = cfg.pop("pad_token_id", self.pad_token_id)
        attn_mask = (input_ids != pad_id).astype(jnp.int32)
        use_hf_pooler = self.pooler_type == "cls_pooler"
        seq, hf_pooled = BertModel(
            add_pooling_layer=use_hf_pooler, pad_token_id=pad_id,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="transformer", **cfg,
        )(input_ids, attention_mask=attn_mask, deterministic=deterministic)

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
            pooled = hf_pooled
            tokens = seq[:, 1:]
        else:
            raise ValueError(f"unknown pooler {self.pooler_type}")

        d_model = cfg["hidden_size"]
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

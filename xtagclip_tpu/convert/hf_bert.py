"""HF torch BertModel state dict -> flax BertModel param tree."""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _linear(tree, path, key, v):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    leaf = node.setdefault(path[-1], {})
    if key == "weight":
        leaf["kernel"] = np.ascontiguousarray(v.T)
    else:
        leaf["bias"] = v


def _ln(tree, path, key, v):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    leaf = node.setdefault(path[-1], {})
    leaf[{"weight": "scale", "bias": "bias"}[key]] = v


def _emb(tree, name, v):
    tree.setdefault(name, {})["embedding"] = v


def convert_hf_bert_state_dict(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    """Map `{prefix}embeddings.* / {prefix}encoder.layer.N.*` keys."""
    tree: dict = {}
    layer_re = re.compile(re.escape(prefix) + r"encoder\.layer\.(\d+)\.(.+)")
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        if rest.startswith("embeddings."):
            sub = rest[len("embeddings."):]
            if sub == "word_embeddings.weight":
                _emb(tree, "word_embeddings", v)
            elif sub == "position_embeddings.weight":
                _emb(tree, "position_embeddings", v)
            elif sub == "token_type_embeddings.weight":
                _emb(tree, "token_type_embeddings", v)
            elif sub.startswith("LayerNorm."):
                _ln(tree, ("embeddings_ln",), sub.split(".")[1], v)
            # position_ids buffer dropped
            continue
        m = layer_re.match(k)
        if m:
            i, lrest = int(m.group(1)), m.group(2)
            base = f"layer_{i}"
            parts = lrest.split(".")
            if parts[0] == "attention":
                if parts[1] == "self":
                    _linear(tree, (base, "attention", parts[2]), parts[3], v)
                elif parts[1] == "output":
                    if parts[2] == "dense":
                        _linear(tree, (base, "attention", "out_dense"),
                                parts[3], v)
                    else:
                        _ln(tree, (base, "attention", "out_ln"), parts[3], v)
            elif parts[0] == "intermediate":
                _linear(tree, (base, "intermediate"), parts[2], v)
            elif parts[0] == "output":
                if parts[1] == "dense":
                    _linear(tree, (base, "output"), parts[2], v)
                else:
                    _ln(tree, (base, "output_ln"), parts[2], v)
            continue
        if rest.startswith("pooler.dense."):
            _linear(tree, ("pooler",), rest.split(".")[2], v)
    return tree

"""Convert transformer params between unrolled (resblocks_{i}) and scanned
(resblocks_scan/block with a leading layer axis) layouts.

Unrolled is the checkpoint-interchange layout (matches the torch converters);
scanned is the compile-time-friendly execution layout (Transformer
scan_layers=True). Stack on load, unstack on export.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def stack_transformer_params(transformer_tree: Dict[str, Any]) -> Dict[str, Any]:
    """{'resblocks_0': {...}, 'resblocks_1': {...}} -> {'resblocks_scan':
    {'block': stacked}} (non-resblock keys pass through)."""
    blocks = {}
    out = {}
    for k, v in transformer_tree.items():
        m = re.fullmatch(r"resblocks_(\d+)", k)
        if m:
            blocks[int(m.group(1))] = v
        else:
            out[k] = v
    if not blocks:
        return dict(transformer_tree)
    ordered = [blocks[i] for i in range(len(blocks))]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *ordered)
    out["resblocks_scan"] = {"block": stacked}
    return out


def unstack_transformer_params(transformer_tree: Dict[str, Any]) -> Dict[str, Any]:
    out = {k: v for k, v in transformer_tree.items() if k != "resblocks_scan"}
    scan = transformer_tree.get("resblocks_scan")
    if scan is None:
        return out
    block = scan["block"]
    n = jax.tree_util.tree_leaves(block)[0].shape[0]
    for i in range(n):
        out[f"resblocks_{i}"] = jax.tree.map(lambda x: x[i], block)
    return out


def to_scanned(params: Dict[str, Any]) -> Dict[str, Any]:
    """Stack every tower's transformer subtree (visual/text/...)."""
    out = dict(params)
    for tower in ("visual", "text"):
        t = out.get(tower)
        if isinstance(t, dict) and "transformer" in t:
            t = dict(t)
            t["transformer"] = stack_transformer_params(t["transformer"])
            out[tower] = t
    return out


def to_unrolled(params: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(params)
    for tower in ("visual", "text"):
        t = out.get(tower)
        if isinstance(t, dict) and "transformer" in t:
            t = dict(t)
            t["transformer"] = unstack_transformer_params(t["transformer"])
            out[tower] = t
    return out

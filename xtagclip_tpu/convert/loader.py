"""Checkpoint loading into a ModelBundle.

Handles: torch .pt/.bin (open_clip layout, via convert/openclip.py), orbax
train-state dirs, and .npz (big_vision). Pos-embed resize surgery on shape
mismatch mirrors reference factory.py:190-221 + model.py:1065-1128.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from xtagclip_tpu.convert.openclip import (
    convert_openclip_state_dict,
    load_torch_state_dict,
)
from xtagclip_tpu.models.pos_embed import (
    resize_text_pos_embed,
    resize_vision_pos_embed,
)


def _pos_prefix_tokens(n: int) -> int:
    """1 if an [L, D] vision pos table carries a cls row (L = S^2 + 1),
    0 for a pure grid (L = S^2, the no_class_token GAP towers)."""
    side = int(round(n ** 0.5))
    if side * side == n:
        return 0
    side = int(round((n - 1) ** 0.5))
    if side * side == n - 1:
        return 1
    raise ValueError(f"vision pos-embed length {n} is neither S^2 nor S^2+1")


def _tree_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def merge_converted_params(
    init_params: Dict[str, Any],
    converted: Dict[str, Any],
    strict: bool = True,
    key_filter=None,
) -> Dict[str, Any]:
    """Overlay converted params onto the init tree with pos-embed resize.

    key_filter(path_tuple) -> bool restricts which keys load (the
    --load-tagging-only contract, main_other_simple.py:460-503).
    """
    init_flat = _tree_paths(init_params)
    conv_flat = _tree_paths(converted)
    out: Dict[str, Any] = jax.tree.map(lambda x: x, init_params)

    missing = [k for k in init_flat if k not in conv_flat]
    unexpected = [k for k in conv_flat if k not in init_flat]
    loaded = 0
    for path, val in conv_flat.items():
        if path not in init_flat:
            continue
        if key_filter is not None and not key_filter(path):
            continue
        target = init_flat[path]
        val = np.asarray(val)
        if val.shape != target.shape:
            name = "/".join(path)
            if name == "visual/positional_embedding":
                # prefix (cls) detection from the table lengths: cls-free GAP
                # towers (no_class_token) carry pure S^2 grids
                tgt_prefix = _pos_prefix_tokens(target.shape[0])
                src_prefix = _pos_prefix_tokens(val.shape[0])
                side = int(round((target.shape[0] - tgt_prefix) ** 0.5))
                if src_prefix and not tgt_prefix:
                    val = val[1:]  # cls row has no position in the GAP tower
                elif tgt_prefix and not src_prefix:
                    # cls-free source into a cls tower: keep the init cls row
                    val = np.concatenate(
                        [np.asarray(init_flat[path])[:1], val], axis=0)
                val = resize_vision_pos_embed(val, (side, side),
                                              num_prefix_tokens=tgt_prefix)
            elif name == "text/positional_embedding":
                val = resize_text_pos_embed(val, target.shape[0])
            elif val.size == target.size and tuple(
                    s for s in val.shape if s != 1) == tuple(
                    s for s in target.shape if s != 1):
                # only singleton-dim differences (logit_scale () vs (1,)):
                # a general equal-size reshape would silently row-major-scramble
                # transposed kernels instead of surfacing the converter bug
                val = val.reshape(target.shape)
            else:
                msg = f"shape mismatch for {name}: {val.shape} vs {target.shape}"
                if strict:
                    raise ValueError(msg)
                logging.warning("skipping %s", msg)
                continue
        _set_path(out, path, jnp.asarray(val, dtype=target.dtype))
        loaded += 1
    if missing and key_filter is None:
        logging.info("checkpoint missing %d params (kept init): %s", len(missing),
                     ["/".join(m) for m in missing[:5]])
    if unexpected:
        logging.info("checkpoint had %d unused params", len(unexpected))
    logging.info("loaded %d params from checkpoint", loaded)
    return out


def load_checkpoint_into(bundle, path: str, strict: bool = False,
                         key_filter=None):
    """Load a checkpoint file into bundle.params (in place)."""
    if path.endswith(".npz"):
        from xtagclip_tpu.convert.big_vision import load_big_vision_weights

        converted = load_big_vision_weights(path, bundle)
    elif os.path.isdir(path):
        # orbax dir: restore with the checkpoint's own shapes, then overlay —
        # merge_converted_params resizes pos-embeds when the target geometry
        # differs (the CLIPA --force-image-size path works for our own
        # checkpoints, not just torch ones)
        from xtagclip_tpu.train.checkpoint import restore_params_raw

        converted = restore_params_raw(path)
    else:
        sd = load_torch_state_dict(path)
        converted = convert_openclip_state_dict(sd)
    bn_stats = (converted.pop("__batch_stats__", None)
                if isinstance(converted, dict) else None)
    bundle.params = merge_converted_params(
        bundle.params, converted, strict=strict, key_filter=key_filter
    )
    if bn_stats and key_filter is None:
        # BatchNorm running statistics carried by the checkpoint (FastViT
        # attention-stage norms etc.) overlay the init batch_stats collection
        existing = dict(bundle.extra_variables or {})
        existing["batch_stats"] = merge_converted_params(
            existing.get("batch_stats", {}), bn_stats, strict=False
        )
        bundle.extra_variables = existing
    return bundle


def tagging_only_filter(path) -> bool:
    """--load-tagging-only: only tag_head / tag_labels / tag_fc keys."""
    head = path[0] if path else ""
    return head in ("tag_head", "tag_labels", "tag_fc")

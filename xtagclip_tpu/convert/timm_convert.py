"""timm ViT torch state dict -> flax TimmViT param tree."""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def convert_timm_vit_state_dict(sd: Dict[str, np.ndarray], prefix: str = "") -> dict:
    tree: dict = {}
    leftovers = []

    def put(path, key, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[key] = v

    block_re = re.compile(re.escape(prefix) + r"blocks\.(\d+)\.(.+)")
    for k, v in sd.items():
        if prefix and not k.startswith(prefix):
            continue
        rest = k[len(prefix):]
        if rest == "cls_token":
            tree["cls_token"] = v.reshape(1, 1, -1)
        elif rest == "pos_embed":
            tree["pos_embed"] = v.reshape(v.shape[-2], v.shape[-1])
        elif rest == "patch_embed.proj.weight":
            w = v.transpose(2, 3, 1, 0)  # [D,C,p,p] -> [p,p,C,D]
            put(("patch_embed",), "kernel",
                np.ascontiguousarray(w.reshape(-1, w.shape[-1])))
        elif rest == "patch_embed.proj.bias":
            put(("patch_embed",), "bias", v)
        elif rest.startswith("norm."):
            put(("norm",), {"weight": "scale", "bias": "bias"}[rest.split(".")[1]], v)
        elif rest.startswith("fc_norm."):
            # timm stores fc_norm in the trunk sd; our LayerNorm lives on the
            # TimmModel head — hoisted out of the trunk tree by the caller
            put(("__fc_norm__",),
                {"weight": "scale", "bias": "bias"}[rest.split(".")[1]], v)
        elif rest.startswith("attn_pool."):
            # SigLIP MAP head (timm AttentionPoolLatent) — lives on our
            # TimmModel ('visual/attn_pool'), hoisted by the caller
            sub = rest[len("attn_pool."):].split(".")
            if sub[0] == "latent":
                tree.setdefault("__attn_pool__", {})["latent"] = v
            elif sub[0] in ("q", "kv", "proj"):
                put(("__attn_pool__", sub[0]),
                    "kernel" if sub[1] == "weight" else "bias",
                    np.ascontiguousarray(v.T) if sub[1] == "weight" else v)
            elif sub[0] == "norm":
                put(("__attn_pool__", "norm"),
                    {"weight": "scale", "bias": "bias"}[sub[1]], v)
            elif sub[0] == "mlp":
                put(("__attn_pool__", f"mlp_{sub[1]}"),
                    "kernel" if sub[2] == "weight" else "bias",
                    np.ascontiguousarray(v.T) if sub[2] == "weight" else v)
            else:
                leftovers.append(rest)
        else:
            m = block_re.match(k)
            if not m:
                leftovers.append(rest)
                continue
            i, lrest = int(m.group(1)), m.group(2)
            base = f"blocks_{i}"
            parts = lrest.split(".")
            if parts[0] in ("norm1", "norm2"):
                put((base, parts[0]),
                    {"weight": "scale", "bias": "bias"}[parts[1]], v)
            elif parts[0] == "attn" and parts[1] == "qkv":
                put((base, "qkv"),
                    "kernel" if parts[2] == "weight" else "bias",
                    np.ascontiguousarray(v.T) if parts[2] == "weight" else v)
            elif parts[0] == "attn" and parts[1] == "proj":
                put((base, "proj"),
                    "kernel" if parts[2] == "weight" else "bias",
                    np.ascontiguousarray(v.T) if parts[2] == "weight" else v)
            elif parts[0] == "mlp":
                put((base, parts[1]),
                    "kernel" if parts[2] == "weight" else "bias",
                    np.ascontiguousarray(v.T) if parts[2] == "weight" else v)
            else:
                leftovers.append(rest)
    if leftovers:
        from xtagclip_tpu.convert.timm_families import UnmappedKeysError

        raise UnmappedKeysError(
            f"timm ViT converter: {len(leftovers)} unmapped trunk keys "
            f"(conv-stem / relpos / gap variants need their own map): "
            f"{sorted(leftovers)[:10]}"
        )
    return tree

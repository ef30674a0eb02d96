"""Export flax params back to the open_clip torch layout + HF-hub packaging.

The reverse of convert/openclip.py, and the push_to_hf_hub equivalent
(reference push_to_hf_hub.py): `save_open_clip_checkpoint` writes a torch
.pt/.bin loadable by the PyTorch reference; `save_hf_checkpoint` writes the
HF-hub directory layout (open_clip_pytorch_model.bin + open_clip_config.json).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def to_openclip_state_dict(params) -> Dict[str, np.ndarray]:
    """flax param tree -> open_clip (CustomTextCLIP-layout) torch state dict."""
    import re

    sd: Dict[str, np.ndarray] = {}
    for path, v in _flatten(params).items():
        name = "/".join(path)

        def put(key, arr, transpose=False):
            sd[key] = np.ascontiguousarray(arr.T) if transpose else arr

        m = re.match(r"(visual|text)/transformer/resblocks_(\d+)/(.+)", name)
        if m:
            tower, i, rest = m.group(1), m.group(2), m.group(3)
            base = f"{tower}.transformer.resblocks.{i}"
            parts = rest.split("/")
            if parts[0] in ("ln_1", "ln_2"):
                put(f"{base}.{parts[0]}."
                    f"{'weight' if parts[1] == 'scale' else 'bias'}", v)
            elif parts[0] == "attn" and parts[1] == "in_proj":
                put(f"{base}.attn.in_proj_"
                    f"{'weight' if parts[2] == 'kernel' else 'bias'}",
                    v, transpose=(parts[2] == "kernel"))
            elif parts[0] == "attn" and parts[1] == "out_proj":
                put(f"{base}.attn.out_proj."
                    f"{'weight' if parts[2] == 'kernel' else 'bias'}",
                    v, transpose=(parts[2] == "kernel"))
            elif parts[0] == "mlp":
                put(f"{base}.mlp.{parts[1]}."
                    f"{'weight' if parts[2] == 'kernel' else 'bias'}",
                    v, transpose=(parts[2] == "kernel"))
            elif parts[0] in ("ls_1", "ls_2"):
                put(f"{base}.{parts[0]}.gamma", v)
            continue
        if name == "visual/conv1/kernel":
            # [ph*pw*C, W] -> [W, C, ph, pw]; patch size from kernel rows
            rows, width = v.shape
            p = int(round((rows / 3) ** 0.5))
            w = v.reshape(p, p, 3, width).transpose(3, 2, 0, 1)
            put("visual.conv1.weight", np.ascontiguousarray(w))
        elif name in ("visual/class_embedding", "visual/positional_embedding",
                      "visual/proj"):
            put(name.replace("/", "."), v)
        elif name.startswith("visual/ln_pre/") or name.startswith("visual/ln_post/"):
            part = name.split("/")
            put(f"visual.{part[1]}."
                f"{'weight' if part[2] == 'scale' else 'bias'}", v)
        elif name == "text/token_embedding/embedding":
            put("text.token_embedding.weight", v)
        elif name in ("text/positional_embedding", "text/text_projection",
                      "text/cls_emb"):
            put(name.replace("/", "."), v)
        elif name == "text/text_projection/kernel":
            # Dense-form projection (proj_bias=True, the SigLIP text configs):
            # torch nn.Linear layout [out, in]
            put("text.text_projection.weight", v, transpose=True)
        elif name == "text/text_projection/bias":
            put("text.text_projection.bias", v)
        elif name.startswith("text/ln_final/"):
            put(f"text.ln_final."
                f"{'weight' if name.endswith('scale') else 'bias'}", v)
        elif name == "logit_scale":
            put("logit_scale", v.reshape(()))
        elif name == "logit_bias":
            put("logit_bias", v.reshape(()))
        elif name == "tag_labels/embedding":
            put("tag_labels.weight", v)
        elif name.startswith("tag_fc/"):
            put(f"tag_fc.{'weight' if name.endswith('kernel') else 'bias'}",
                v, transpose=name.endswith("kernel"))
        elif name.startswith("tag_head/"):
            m = re.match(
                r"tag_head/layer_(\d+)_(crossattention|ffn)/(.+)", name
            )
            if not m:
                continue
            i, kind, rest = m.group(1), m.group(2), m.group(3)
            parts = rest.split("/")
            tbase = f"tag_head.encoder.layer.{i}"
            is_kernel = parts[-1] == "kernel"
            suffix = ("weight" if parts[-1] in ("kernel", "scale") else "bias")
            if kind == "crossattention":
                if parts[0] in ("query", "key", "value"):
                    put(f"{tbase}.crossattention.self.{parts[0]}.{suffix}", v,
                        transpose=is_kernel)
                elif parts[0] == "out_dense":
                    put(f"{tbase}.crossattention.output.dense.{suffix}", v,
                        transpose=is_kernel)
                elif parts[0] == "out_ln":
                    put(f"{tbase}.crossattention.output.LayerNorm.{suffix}", v)
            else:
                if parts[0] == "intermediate":
                    put(f"{tbase}.intermediate.dense.{suffix}", v,
                        transpose=is_kernel)
                elif parts[0] == "output":
                    put(f"{tbase}.output.dense.{suffix}", v,
                        transpose=is_kernel)
                elif parts[0] == "output_ln":
                    put(f"{tbase}.output.LayerNorm.{suffix}", v)
        elif name.startswith("fusion_model/"):
            parts = name.split("/")
            is_kernel = parts[-1] == "kernel"
            suffix = ("weight" if parts[-1] in ("kernel", "scale") else "bias")
            if parts[1] == "logit_scale":
                put("fusion_model.logit_scale", v.reshape(()))
            elif parts[1] == "decoder_norm":
                put(f"fusion_model.decoder_norm.{suffix}", v)
                put(f"fusion_model.decoder.norm.{suffix}", v)  # dup reg
            elif parts[1].startswith("decoder_layer_"):
                i = parts[1].split("_")[-1]
                lbase = f"fusion_model.decoder.layers.{i}"
                if parts[2] == "multihead_attn":
                    if parts[3] == "in_proj":
                        put(f"{lbase}.multihead_attn.in_proj_{suffix}", v,
                            transpose=is_kernel)
                    else:
                        put(f"{lbase}.multihead_attn.out_proj.{suffix}", v,
                            transpose=is_kernel)
                elif parts[2] in ("linear1", "linear2"):
                    put(f"{lbase}.{parts[2]}.{suffix}", v, transpose=is_kernel)
                elif parts[2] in ("norm2", "norm3"):
                    put(f"{lbase}.{parts[2]}.{suffix}", v)
            elif parts[1].startswith("mlp_"):
                idx = {"mlp_0": 0, "mlp_1": 3, "mlp_2": 6, "mlp_3": 9}[parts[1]]
                put(f"fusion_model.mlp_head.{idx}.{suffix}", v,
                    transpose=is_kernel)
        # timm/hf towers: export not implemented (load-only layouts)
    return sd


def save_open_clip_checkpoint(bundle, path: str, epoch: int = 0):
    """Write a torch checkpoint loadable by the PyTorch reference."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, np.float32, copy=True))
          for k, v in to_openclip_state_dict(bundle.params).items()}
    torch.save({"epoch": epoch, "name": bundle.model_name, "state_dict": sd},
               path)
    return path


def save_hf_checkpoint(bundle, save_dir: str, tokenizer=None):
    """HF-hub directory layout (reference push_to_hf_hub.py contract)."""
    from xtagclip_tpu.utils.constants import HF_CONFIG_NAME, HF_WEIGHTS_NAME

    os.makedirs(save_dir, exist_ok=True)
    save_open_clip_checkpoint(bundle, os.path.join(save_dir, HF_WEIGHTS_NAME))
    cfg = {
        "model_cfg": {k: v for k, v in bundle.model_cfg.items()
                      if k != "preprocess_cfg"},
        "preprocess_cfg": bundle.preprocess_cfg or {
            "mean": [0.48145466, 0.4578275, 0.40821073],
            "std": [0.26862954, 0.26130258, 0.27577711],
        },
    }
    with open(os.path.join(save_dir, HF_CONFIG_NAME), "w") as f:
        json.dump(cfg, f, indent=2)
    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(save_dir)
    return save_dir


def push_to_hf_hub(bundle, repo_id: str, tokenizer=None, commit_message=None,
                   private: bool = False, local_dir: str | None = None):
    """Package + upload to the HF hub (reference push_to_hf_hub.py surface).

    Always writes the hub directory layout locally (local_dir or a temp dir);
    the upload step requires huggingface_hub credentials and network access
    and raises with the prepared path if either is unavailable.
    """
    import tempfile

    save_dir = local_dir or tempfile.mkdtemp(prefix="hf_push_")
    save_hf_checkpoint(bundle, save_dir, tokenizer=tokenizer)
    try:
        from huggingface_hub import HfApi

        api = HfApi()
        api.create_repo(repo_id, private=private, exist_ok=True)
        api.upload_folder(
            folder_path=save_dir, repo_id=repo_id,
            commit_message=commit_message or "Add model",
        )
        return repo_id
    except Exception as e:  # noqa: BLE001 — no-egress envs land here
        raise RuntimeError(
            f"hub upload unavailable ({type(e).__name__}); the packaged "
            f"checkpoint is at {save_dir}"
        ) from e


def push_pretrained_to_hf_hub(model_name: str, pretrained: str, repo_id: str,
                              **kwargs):
    """Build-from-pretrained then push (reference push_to_hf_hub.py:ditto)."""
    from xtagclip_tpu.factory import create_model, get_tokenizer

    bundle = create_model(model_name, pretrained)
    return push_to_hf_hub(bundle, repo_id, tokenizer=get_tokenizer(model_name),
                          **kwargs)

"""Convert open_clip-layout PyTorch state dicts into xtagclip_tpu param pytrees.

Handles both reference layouts:
- CLIP: text params at top level (token_embedding, transformer., ln_final,
  text_projection, positional_embedding) — normalized to text.* first,
  mirroring reference convert_to_custom_text_state_dict (model.py:968-987).
- CustomTextCLIP: text params under text.*.

Also maps the XTag additions (tag_head/tag_labels/tag_fc/fusion_model).
Input: a dict of numpy arrays (use `load_torch_state_dict` to read .pt files).
Output: a nested dict matching model.init(...)['params'].
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy without keeping torch tensors alive."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if isinstance(ckpt, dict) and "module" in ckpt:
        ckpt = ckpt["module"]
    out = {}
    for k, v in ckpt.items():
        k = k[len("module.") :] if k.startswith("module.") else k
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


_TEXT_ALIAS_PREFIXES = (
    "token_embedding", "ln_final", "transformer.", "positional_embedding",
    "text_projection", "cls_emb", "attn_mask",
)


def normalize_to_custom_text(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Prefix top-level text-tower keys with 'text.' (CLIP -> CustomTextCLIP).

    The XTag fork's CLIP registers the text tower both as a `text.` submodule
    and as top-level aliases (model.py:249-257), so its state_dict carries both
    copies; when `text.*` exists the top-level aliases are dropped.
    """
    has_text = any(k.startswith("text.") for k in sd)
    out = {}
    for k, v in sd.items():
        if k in ("logit_scale", "logit_bias") or k.startswith(
            ("visual.", "tag_", "fusion_model.", "text.")
        ):
            out[k] = v
        elif k.startswith(_TEXT_ALIAS_PREFIXES):
            if not has_text:
                out["text." + k] = v
            # else: duplicate alias of text.* — drop
        else:
            out[k] = v
    return out


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _ln(tree, path, key, v):
    _set(tree, path + ({"weight": "scale", "bias": "bias"}[key],), v)


def _linear(tree, path, key, v):
    if key == "weight":
        _set(tree, path + ("kernel",), np.ascontiguousarray(v.T))
    else:
        _set(tree, path + ("bias",), v)


_RESBLOCK = re.compile(r"transformer\.resblocks\.(\d+)\.(.+)")


def _conv_kernel(v: np.ndarray) -> np.ndarray:
    """torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return np.ascontiguousarray(v.transpose(2, 3, 1, 0))


def _convert_modified_resnet_visual(sd: Dict[str, np.ndarray]):
    """OpenAI/open_clip ModifiedResNet visual.* -> models/resnet.py layout.

    Torch layout (reference modified_resnet.py:95-181): 3-conv stem with
    bn1..bn3, layer{1..4}.{i}.{conv,bn}{1..3} bottlenecks with
    downsample.{0=conv,1=bn} (index -1 is the avgpool), and
    attnpool.{positional_embedding,q/k/v/c_proj}. Returns (params_visual,
    batch_stats_visual); consumed keys are removed from sd."""
    vis: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn_set(mod_path, key, v):
        if key in ("weight", "bias"):
            _set(vis, mod_path + ({"weight": "scale", "bias": "bias"}[key],), v)
        elif key == "running_mean":
            _set(stats, mod_path + ("mean",), v)
        elif key == "running_var":
            _set(stats, mod_path + ("var",), v)
        elif key != "num_batches_tracked":
            raise KeyError(f"unmapped bn key {'.'.join(mod_path)}.{key}")

    layer_re = re.compile(r"layer([1-4])\.(\d+)\.(.+)")
    for k in [k for k in sd if k.startswith("visual.")]:
        rest = k[len("visual."):]
        v = sd[k]
        parts = rest.split(".")
        if parts[0] in ("conv1", "conv2", "conv3") and parts[1] == "weight":
            _set(vis, (parts[0], "kernel"), _conv_kernel(v))
        elif parts[0] in ("bn1", "bn2", "bn3"):
            bn_set((parts[0],), parts[1], v)
        elif m := layer_re.match(rest):
            block = f"layer{m.group(1)}_{m.group(2)}"
            sub = m.group(3).split(".")
            if sub[0].startswith("conv") and sub[1] == "weight":
                _set(vis, (block, sub[0], "kernel"), _conv_kernel(v))
            elif sub[0].startswith("bn"):
                bn_set((block, sub[0]), sub[1], v)
            elif sub[0] == "downsample":
                if sub[1] == "0" and sub[2] == "weight":
                    _set(vis, (block, "downsample_conv", "kernel"),
                         _conv_kernel(v))
                elif sub[1] == "1":
                    bn_set((block, "downsample_bn"), sub[2], v)
                else:
                    raise KeyError(f"unmapped downsample key {k}")
            else:
                raise KeyError(f"unmapped bottleneck key {k}")
        elif parts[0] == "attnpool":
            if parts[1] == "positional_embedding":
                _set(vis, ("attnpool", "positional_embedding"), v)
            elif parts[1].endswith("_proj") and parts[2] in ("weight", "bias"):
                if parts[2] == "weight":
                    _set(vis, ("attnpool", parts[1], "kernel"),
                         np.ascontiguousarray(v.T))
                else:
                    _set(vis, ("attnpool", parts[1], "bias"), v)
            else:
                raise KeyError(f"unmapped attnpool key {k}")
        else:
            raise KeyError(f"unmapped ModifiedResNet visual key {k}")
        del sd[k]
    return vis, stats


def _convert_resblock(tree, tower, m, v):
    i, rest = int(m.group(1)), m.group(2)
    base = (tower, "transformer", f"resblocks_{i}")
    parts = rest.split(".")
    if parts[0] in ("ln_1", "ln_2", "ln_attn"):
        _ln(tree, base + (parts[0],), parts[1], v)
    elif parts[0] == "attn":
        if parts[1] == "in_proj_weight":
            _set(tree, base + ("attn", "in_proj", "kernel"), np.ascontiguousarray(v.T))
        elif parts[1] == "in_proj_bias":
            _set(tree, base + ("attn", "in_proj", "bias"), v)
        elif parts[1] == "out_proj":
            _linear(tree, base + ("attn", "out_proj"), parts[2], v)
        else:
            raise KeyError(f"unmapped attn key {rest}")
    elif parts[0] == "mlp":
        _linear(tree, base + ("mlp", parts[1]), parts[2], v)
    elif parts[0] in ("ls_1", "ls_2"):
        _set(tree, base + (parts[0], "gamma"), v)
    else:
        raise KeyError(f"unmapped resblock key {rest}")


def convert_openclip_state_dict(
    sd: Dict[str, np.ndarray],
    patch_size: int | None = None,
) -> Dict[str, Any]:
    """Map open_clip torch keys to the flax param tree. Unknown/unused keys
    (fusion self_attn, norm1, decoder.norm duplicate, attn_mask buffers,
    position_ids) are dropped, mirroring reference load_checkpoint surgery."""
    sd = normalize_to_custom_text(sd)
    tree: Dict[str, Any] = {}

    # timm trunk / HF bert groups are converted wholesale up front.
    # Family dispatch (vit / eva / swin / vitamin / fastvit-reparam) sniffs
    # the key signature; unknown layouts raise instead of silently mismapping
    # (reference timm_model.py:29-172 loads these through timm itself).
    if any(k.startswith("visual.bn1.") or k.startswith("visual.attnpool.")
           for k in sd):
        sd = dict(sd)
        vis, vis_stats = _convert_modified_resnet_visual(sd)
        tree["visual"] = vis
        if vis_stats:
            tree.setdefault("__batch_stats__", {})["visual"] = vis_stats

    if any(k.startswith("visual.trunk.") for k in sd):
        from xtagclip_tpu.convert.timm_families import convert_timm_trunk

        trunk_tree = convert_timm_trunk(sd, prefix="visual.trunk.")
        bn_stats = trunk_tree.pop("__batch_stats__", None)
        fc_norm = trunk_tree.pop("__fc_norm__", None)
        tree.setdefault("visual", {})["trunk"] = trunk_tree
        if fc_norm:  # timm fc_norm lives on our TimmModel head
            tree["visual"]["fc_norm"] = fc_norm
        attn_pool = trunk_tree.pop("__attn_pool__", None)
        if attn_pool:  # SigLIP MAP head lives on our TimmModel
            tree["visual"]["attn_pool"] = attn_pool
        if bn_stats:
            tree["__batch_stats__"] = {"visual": {"trunk": bn_stats}}
        sd = {k: v for k, v in sd.items() if not k.startswith("visual.trunk.")}
    if any(k.startswith("text.transformer.embeddings.") for k in sd):
        from xtagclip_tpu.convert.hf_bert import convert_hf_bert_state_dict

        tree.setdefault("text", {})["transformer"] = convert_hf_bert_state_dict(
            sd, prefix="text.transformer."
        )
        sd = {k: v for k, v in sd.items()
              if not k.startswith("text.transformer.")}

    for k, v in sd.items():
        if k.endswith(("attn_mask", "position_ids")):
            continue
        if k == "logit_scale":
            _set(tree, ("logit_scale",), v.reshape(()) if v.ndim == 0 or v.size == 1 else v)
            continue
        if k == "logit_bias":
            _set(tree, ("logit_bias",), v.reshape(()))
            continue

        # ----- timm vision head (BiomedCLIP: visual.head.*)
        if k.startswith("visual.head."):
            rest = k[len("visual.head.") :]
            if rest.startswith("proj."):
                _linear(tree, ("visual", "head_proj"), rest.split(".")[1], v)
            elif rest.startswith("mlp.fc1."):
                _linear(tree, ("visual", "head_mlp_fc1"), rest.split(".")[2], v)
            elif rest.startswith("mlp.fc2."):
                _linear(tree, ("visual", "head_mlp_fc2"), rest.split(".")[2], v)
            continue

        # ----- HF text proj (BiomedCLIP: text.proj.*)
        if k.startswith("text.proj."):
            rest = k[len("text.proj.") :]
            if rest.startswith("0."):
                _linear(tree, ("text", "proj_fc1"), rest.split(".")[1], v)
            elif rest.startswith("2."):
                _linear(tree, ("text", "proj_fc2"), rest.split(".")[1], v)
            elif rest in ("weight", "bias"):
                _linear(tree, ("text", "proj"), rest, v)
            continue

        # ----- vision tower -----
        if k.startswith("visual."):
            rest = k[len("visual.") :]
            if rest == "conv1.weight":
                # [W, C, ph, pw] -> [ph*pw*C, W] matching patchify order
                w = v.transpose(2, 3, 1, 0)
                _set(tree, ("visual", "conv1", "kernel"),
                     np.ascontiguousarray(w.reshape(-1, w.shape[-1])))
            elif rest in ("class_embedding", "positional_embedding", "proj"):
                _set(tree, ("visual", rest), v)
            elif rest.startswith(("ln_pre.", "ln_post.")):
                name, key = rest.split(".")
                _ln(tree, ("visual", name), key, v)
            else:
                m = _RESBLOCK.match(rest)
                if m:
                    _convert_resblock(tree, "visual", m, v)
                else:
                    raise KeyError(f"unmapped visual key {k}")
            continue

        # ----- text tower -----
        if k.startswith("text."):
            rest = k[len("text.") :]
            if rest == "token_embedding.weight":
                _set(tree, ("text", "token_embedding", "embedding"), v)
            elif rest in ("positional_embedding", "text_projection", "cls_emb"):
                _set(tree, ("text", rest), v)
            elif rest.startswith("text_projection."):
                _linear(tree, ("text", "text_projection"), rest.split(".")[1], v)
            elif rest.startswith("ln_final."):
                _ln(tree, ("text", "ln_final"), rest.split(".")[1], v)
            else:
                m = _RESBLOCK.match(rest)
                if m:
                    _convert_resblock(tree, "text", m, v)
                else:
                    raise KeyError(f"unmapped text key {k}")
            continue

        # ----- tag head -----
        if k.startswith("tag_head."):
            m = re.match(r"tag_head\.encoder\.layer\.(\d+)\.(.+)", k)
            if not m:
                continue  # pooler etc. (add_pooling_layer=False in reference)
            i, rest = int(m.group(1)), m.group(2)
            ca = ("tag_head", f"layer_{i}_crossattention")
            ffn = ("tag_head", f"layer_{i}_ffn")
            parts = rest.split(".")
            if parts[0] == "crossattention":
                if parts[1] == "self":
                    _linear(tree, ca + (parts[2],), parts[3], v)
                elif parts[1] == "output":
                    if parts[2] == "dense":
                        _linear(tree, ca + ("out_dense",), parts[3], v)
                    else:  # LayerNorm
                        _ln(tree, ca + ("out_ln",), parts[3], v)
            elif parts[0] == "intermediate":
                _linear(tree, ffn + ("intermediate",), parts[2], v)
            elif parts[0] == "output":
                if parts[1] == "dense":
                    _linear(tree, ffn + ("output",), parts[2], v)
                else:
                    _ln(tree, ffn + ("output_ln",), parts[2], v)
            continue

        if k == "tag_labels.weight":
            _set(tree, ("tag_labels", "embedding"), v)
            continue
        if k.startswith("tag_fc."):
            _linear(tree, ("tag_fc",), k.split(".")[1], v)
            continue

        # ----- fusion (TQN) -----
        if k.startswith("fusion_model."):
            rest = k[len("fusion_model.") :]
            if rest == "logit_scale":
                _set(tree, ("fusion_model", "logit_scale"), v.reshape(()))
            elif rest.startswith("decoder_norm."):
                _ln(tree, ("fusion_model", "decoder_norm"), rest.split(".")[1], v)
            elif rest.startswith("decoder.norm."):
                pass  # duplicate registration of decoder_norm
            elif rest.startswith("decoder.layers."):
                m = re.match(r"decoder\.layers\.(\d+)\.(.+)", rest)
                i, lrest = int(m.group(1)), m.group(2)
                base = ("fusion_model", f"decoder_layer_{i}")
                parts = lrest.split(".")
                if parts[0] in ("self_attn", "norm1"):
                    pass  # self-attention is disabled in the WoSelfAtten layer
                elif parts[0] == "multihead_attn":
                    if parts[1] == "in_proj_weight":
                        _set(tree, base + ("multihead_attn", "in_proj", "kernel"),
                             np.ascontiguousarray(v.T))
                    elif parts[1] == "in_proj_bias":
                        _set(tree, base + ("multihead_attn", "in_proj", "bias"), v)
                    elif parts[1] == "out_proj":
                        _linear(tree, base + ("multihead_attn", "out_proj"),
                                parts[2], v)
                elif parts[0] in ("linear1", "linear2"):
                    _linear(tree, base + (parts[0],), parts[1], v)
                elif parts[0] in ("norm2", "norm3"):
                    _ln(tree, base + (parts[0],), parts[1], v)
            elif rest.startswith("mlp_head."):
                idx = int(rest.split(".")[1])
                name = {0: "mlp_0", 3: "mlp_1", 6: "mlp_2", 9: "mlp_3"}[idx]
                _linear(tree, ("fusion_model", name), rest.split(".")[2], v)
            continue

        raise KeyError(f"unmapped checkpoint key {k}")

    return tree

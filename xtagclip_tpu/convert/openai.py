"""OpenAI CLIP checkpoint loading (reference openai.py:24-90 +
model.py:990-1046): accepts JIT archives or bare state dicts, infers the
architecture from tensor shapes, builds the model with QuickGELU, and loads
converted weights (fp16 tensors upcast to the model param dtype).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np


def load_openai_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for k, v in sd.items():
        if k in ("input_resolution", "context_length", "vocab_size"):
            continue
        out[k] = v.float().numpy() if hasattr(v, "float") else np.asarray(v)
    return out


def config_from_openai_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len([
            k for k in sd
            if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")
        ])
        patch = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_cfg = dict(layers=vision_layers, width=vision_width,
                          patch_size=patch, image_size=patch * grid)
    else:
        counts = [
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        ]
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_grid = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        vision_cfg = dict(layers=counts, width=vision_width,
                          image_size=out_grid * 32)
    text_width = sd["ln_final.weight"].shape[0]
    text_cfg = dict(
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        width=text_width,
        heads=text_width // 64,
        layers=len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks")}),
    )
    return dict(embed_dim=sd["text_projection"].shape[1],
                quick_gelu=True, vision_cfg=vision_cfg, text_cfg=text_cfg)


def load_openai_model(path: str, precision: str = "fp32", **model_kwargs):
    """Build + load an OpenAI checkpoint into a ModelBundle."""
    import json
    import os
    import tempfile

    from xtagclip_tpu.convert.loader import merge_converted_params
    from xtagclip_tpu.convert.openclip import convert_openclip_state_dict
    from xtagclip_tpu.factory import add_model_config, create_model

    sd = load_openai_state_dict(path)
    cfg = config_from_openai_state_dict(sd)
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="openai-",
                                     delete=False) as f:
        json.dump(cfg, f)
        cfg_path = f.name
    add_model_config(cfg_path)
    bundle = create_model(os.path.basename(cfg_path)[:-5],
                          precision=precision, **model_kwargs)
    converted = convert_openclip_state_dict(sd)
    bundle.params = merge_converted_params(bundle.params, converted)
    logging.info("loaded OpenAI checkpoint %s (%s)", path,
                 "ViT" if "visual.proj" in sd else "ResNet")
    return bundle

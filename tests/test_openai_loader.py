"""Functional test of the OpenAI checkpoint path (reference openai.py:24-90):
shape-inferred config + weight conversion must reproduce the source model
bit-for-bit, not just load without error."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from xtagclip_tpu.convert.export import to_openclip_state_dict
from xtagclip_tpu.convert.openai import (
    config_from_openai_state_dict,
    load_openai_model,
)
from xtagclip_tpu.factory import add_model_config, create_model

pytestmark = pytest.mark.parity

# geometry chosen to satisfy the OpenAI-layout invariants the config
# inference relies on: text heads = width // 64, vision head_width = 64
CFG = dict(
    embed_dim=64,
    quick_gelu=True,
    vision_cfg=dict(layers=2, width=128, patch_size=8, image_size=32),
    text_cfg=dict(context_length=16, vocab_size=300, width=128, heads=2,
                  layers=2),
)


@pytest.fixture(scope="module")
def source_bundle():
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinyoai-",
                                     delete=False) as f:
        json.dump(CFG, f)
        p = f.name
    add_model_config(p)
    return create_model(os.path.basename(p)[:-5])


@pytest.fixture(scope="module")
def openai_ckpt_path(source_bundle, tmp_path_factory):
    import torch

    # the OpenAI JIT-archive layout is the CLIP (non-custom-text) layout:
    # text-tower tensors live at top level, not under a 'text.' prefix
    sd = {
        (k[len("text."):] if k.startswith("text.") else k): torch.from_numpy(
            np.ascontiguousarray(v))
        for k, v in to_openclip_state_dict(source_bundle.params).items()
    }
    path = str(tmp_path_factory.mktemp("oai") / "openai_tiny.pt")
    torch.save(sd, path)
    return path


def test_config_inference(openai_ckpt_path):
    from xtagclip_tpu.convert.openai import load_openai_state_dict

    cfg = config_from_openai_state_dict(
        load_openai_state_dict(openai_ckpt_path))
    assert cfg["embed_dim"] == 64
    assert cfg["quick_gelu"] is True
    assert cfg["vision_cfg"] == dict(layers=2, width=128, patch_size=8,
                                     image_size=32)
    assert cfg["text_cfg"] == dict(context_length=16, vocab_size=300,
                                   width=128, heads=2, layers=2)


def test_loaded_model_matches_source(source_bundle, openai_ckpt_path):
    loaded = load_openai_model(openai_ckpt_path)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    txt = jnp.asarray(rng.integers(1, 300, size=(2, 16)), jnp.int32)

    for method in ("encode_image", "encode_text"):
        x = img if method == "encode_image" else txt
        a = source_bundle.module.apply(
            {"params": source_bundle.params}, x, True,
            method=getattr(source_bundle.module, method))[0]
        b = loaded.module.apply(
            {"params": loaded.params}, x, True,
            method=getattr(loaded.module, method))[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=method)

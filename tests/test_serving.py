"""Precomputed-prompt serving path (xtagclip_tpu/serving.py).

The serve step replaces the per-image text tower with a [C, K, D] gather.
These tests pin its EQUIVALENCE to the on-the-fly train/eval forward: for
every class c, serve's fusion column [:, c] must equal the full path's
diagonal when every image in the batch is assigned class c (then text_j
uses image j's own tag combo, so full i2t[i, i] == serve[i, c]).
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.models.clip import num_combos
from xtagclip_tpu.serving import (
    make_xtag_serve_step,
    precompute_prompt_features,
)

CFG = dict(
    embed_dim=64,
    fusion_dim=64,
    vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=8,
                    image_size=32),
    text_cfg=dict(context_length=16, vocab_size=1024, width=64, heads=2,
                  layers=2),
)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    path = tmp_path_factory.mktemp("cfg") / "tinyserve.json"
    path.write_text(json.dumps(CFG))
    add_model_config(str(path))
    return create_model(path.stem, use_tagging=True, use_fusion=True)


@pytest.fixture(scope="module")
def prompt_table():
    rng = np.random.default_rng(5)
    return rng.integers(
        1, 1000, size=(2, 3, num_combos(), 16)).astype(np.int32)


def test_serve_matches_full_forward(bundle, prompt_table):
    B, C, template = 4, 3, 1
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((B, 32, 32, 3)).astype(np.float32))

    table = precompute_prompt_features(
        bundle, prompt_table, template_id=template, batch_size=64)
    assert table.shape == (C, num_combos(), CFG["embed_dim"])

    serve = make_xtag_serve_step(bundle, table)
    img_feat, tag_global, i2t_serve = serve(bundle.params, images)
    assert i2t_serve.shape == (B, C)
    assert tag_global.shape == (B, 6)

    jt = jnp.asarray(prompt_table)
    for c in range(C):
        out = bundle.apply(
            images, None, jt, jnp.full((B,), c, jnp.int32), template, True)
        diag = jnp.diagonal(out["i2t_cls"])
        np.testing.assert_allclose(
            np.asarray(i2t_serve[:, c]), np.asarray(diag),
            rtol=2e-4, atol=2e-4)
        # the tag picks and image features must be identical too
        np.testing.assert_array_equal(
            np.asarray(tag_global), np.asarray(out["tag_indices"]))
        np.testing.assert_allclose(
            np.asarray(img_feat), np.asarray(out["image_features"]),
            rtol=1e-5, atol=1e-5)


def test_precompute_padding_boundary(bundle, prompt_table):
    """Chunked encode with a non-divisor batch size: padded rows must not
    leak into the table."""
    t_small = precompute_prompt_features(
        bundle, prompt_table, template_id=0, batch_size=1000)
    t_big = precompute_prompt_features(
        bundle, prompt_table, template_id=0, batch_size=8192)
    np.testing.assert_allclose(
        np.asarray(t_small), np.asarray(t_big), rtol=1e-5, atol=1e-5)


def test_serve_requires_fusion_model(tmp_path):
    path = tmp_path / "tinyserve2.json"
    path.write_text(json.dumps(CFG))
    add_model_config(str(path))
    b = create_model(path.stem)  # no fusion
    with pytest.raises(ValueError, match="use_fusion"):
        make_xtag_serve_step(b, jnp.zeros((3, num_combos(), 64)))

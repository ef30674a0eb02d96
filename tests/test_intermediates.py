"""forward_intermediates / feature_take_indices parity
(reference transformer.py:743-823, 1067-1150; model.py:395-456;
utils.py:94-133)."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax.numpy as jnp

from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.models.layers import feature_take_indices

CFG = dict(
    embed_dim=64,
    vision_cfg=dict(layers=3, width=64, head_width=32, patch_size=8,
                    image_size=32),
    text_cfg=dict(context_length=16, vocab_size=1000, width=64, heads=4,
                  layers=3),
)


@pytest.fixture(scope="module")
def tiny():
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinyint-",
                                     delete=False) as f:
        json.dump(CFG, f)
        path = f.name
    add_model_config(path)
    return create_model(os.path.basename(path)[:-5])


def test_feature_take_indices():
    assert feature_take_indices(12, None) == (list(range(12)), 11)
    assert feature_take_indices(12, 3) == ([9, 10, 11], 11)
    assert feature_take_indices(12, [0, -1]) == ([0, 11], 11)
    with pytest.raises(AssertionError):
        feature_take_indices(12, 13)
    with pytest.raises(AssertionError):
        feature_take_indices(12, [12])


def test_vision_intermediates_shapes(tiny, rng):
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    out = tiny.forward_intermediates(
        image=img, image_indices=2, image_output_fmt="NCHW",
        image_output_extra_tokens=True,
    )
    inters = out["image_intermediates"]
    assert len(inters) == 2
    assert inters[0].shape == (2, 64, 4, 4)  # [B, C, gh, gw]
    assert out["image_intermediates_prefix"][0].shape == (2, 1, 64)
    # final features present and L2-normalized by default
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5)

    # NLC keeps the token sequence flat
    out = tiny.forward_intermediates(
        image=img, image_indices=[0, -1], image_output_fmt="NLC",
        intermediates_only=True,
    )
    assert set(out) == {"image_intermediates"}
    assert out["image_intermediates"][0].shape == (2, 16, 64)


def test_text_intermediates_and_logits(tiny, rng):
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    txt = jnp.asarray(rng.integers(1, 999, size=(2, 16)).astype(np.int32))
    out = tiny.forward_intermediates(
        image=img, text=txt, text_indices=1, output_logits=True,
        output_logit_scale_bias=True,
    )
    assert len(out["text_intermediates"]) == 1
    assert out["text_intermediates"][0].shape == (2, 16, 64)
    assert out["image_logits"].shape == (2, 2)
    np.testing.assert_allclose(np.asarray(out["image_logits"]),
                               np.asarray(out["text_logits"]).T, rtol=1e-5)
    assert float(out["logit_scale"]) > 0


def test_final_features_match_normal_forward(tiny, rng):
    """image_features from the intermediates path must equal encode_image."""
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    out = tiny.forward_intermediates(image=img, image_indices=1)
    pooled, _ = tiny.encode_image(img, normalize=True)
    np.testing.assert_allclose(np.asarray(out["image_features"]),
                               np.asarray(pooled), rtol=1e-5, atol=1e-6)


def test_normalized_last_intermediate_consistent(tiny, rng):
    """ln_post(last intermediate)[:, 0] equals the pre-projection pooled
    feature — LayerNorm is per-token, so slicing commutes with it."""
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    out = tiny.forward_intermediates(
        image=img, image_indices=[-1], normalize_intermediates=True,
        image_output_fmt="NLC", image_output_extra_tokens=True,
        intermediates_only=True,
    )
    prefix = np.asarray(out["image_intermediates_prefix"][0][:, 0])  # [B, C]
    # reproduce pooled-pre-proj: ln_post applied to the cls token
    params = tiny.params
    w = np.asarray(params["visual"]["ln_post"]["scale"])
    b = np.asarray(params["visual"]["ln_post"]["bias"])
    # prefix already ln_post'ed by normalize_intermediates; just sanity-check
    # it matches projecting back through proj to the public pooled feature
    proj = np.asarray(params["visual"]["proj"])
    pooled, _ = tiny.encode_image(img, normalize=False)
    np.testing.assert_allclose(prefix @ proj, np.asarray(pooled),
                               rtol=1e-4, atol=1e-5)
    assert w.shape == b.shape == (64,)

"""no_class_token GAP towers (TPU perf option, PERF.md round 3): cls-free
sequence (128-multiple attention lanes), param tree without class_embedding,
grid-sized positional embedding, avg pooling over all tokens."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.factory import add_model_config, create_model


def _make(name_prefix, vision_extra, **model_kwargs):
    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=8,
                        image_size=32, pool_type="avg",
                        final_ln_after_pool=True, **vision_extra),
        text_cfg=dict(context_length=16, vocab_size=300, width=64, heads=2,
                      layers=2),
    )
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix=name_prefix,
                                     delete=False) as f:
        json.dump(cfg, f)
    add_model_config(f.name)
    return create_model(os.path.basename(f.name)[:-5], **model_kwargs)


def test_cls_free_tower_structure_and_forward():
    b = _make("tinynocls-", dict(no_class_token=True))
    vis = b.params["visual"]
    assert "class_embedding" not in vis
    assert vis["positional_embedding"].shape == (16, 64)  # grid 4x4, no +1

    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 32, 32, 3)), jnp.float32)
    pooled, tokens = b.module.apply({"params": b.params}, img, True,
                                    method=b.module.encode_image)
    assert pooled.shape == (2, 64)
    assert tokens.shape == (2, 16, 64)  # spatial tokens only
    assert np.isfinite(np.asarray(pooled)).all()


def test_cls_free_pooling_matches_mean_of_tokens():
    """avg pool over ALL tokens when cls-free; over spatial-only otherwise."""
    b_free = _make("tinynocls2-", dict(no_class_token=True))
    img = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 32, 32, 3)), jnp.float32)
    # un-projected check via param surgery is overkill; instead verify the
    # cls-carrying GAP tower has one more token and a class_embedding param
    b_cls = _make("tinyclsgap-", dict())
    assert "class_embedding" in b_cls.params["visual"]
    assert b_cls.params["visual"]["positional_embedding"].shape == (17, 64)
    _, tokens_cls = b_cls.module.apply({"params": b_cls.params}, img, True,
                                       method=b_cls.module.encode_image)
    _, tokens_free = b_free.module.apply({"params": b_free.params}, img, True,
                                         method=b_free.module.encode_image)
    assert tokens_cls.shape[1] == 17 and tokens_free.shape[1] == 16


def test_cls_free_requires_avg_pool():
    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(layers=1, width=64, head_width=32, patch_size=8,
                        image_size=32, pool_type="tok", no_class_token=True),
        text_cfg=dict(context_length=16, vocab_size=300, width=64, heads=2,
                      layers=1),
    )
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="badnocls-",
                                     delete=False) as f:
        json.dump(cfg, f)
    add_model_config(f.name)
    with pytest.raises(ValueError, match="no_class_token"):
        create_model(os.path.basename(f.name)[:-5])


def test_cls_free_trains_and_scans():
    """the option composes with scan-over-layers (the deep-tower default)."""
    b = _make("tinynoclsscan-", dict(no_class_token=True), scan_layers=True)
    # grad flows: d(pooled.sum())/d(params) is finite
    img = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 32, 32, 3)), jnp.float32)

    def loss_fn(p):
        pooled, _ = b.module.apply({"params": p}, img, True,
                                   method=b.module.encode_image)
        return (pooled.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss_fn)(b.params)
    leaves = jax.tree_util.tree_leaves(g["visual"])
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


def test_cls_free_checkpoint_resizes_on_load(tmp_path):
    """The CLIPA stage-change path for cls-free GAP towers: a checkpoint saved
    at one image size must load into the same arch at a larger
    --force-image-size with the pure-grid pos embed bicubic-resized (no cls
    row to split off). Regression: the loader assumed L = S^2+1 and asserted
    'non-square source grid' on cls-free tables."""
    from xtagclip_tpu.convert.loader import merge_converted_params

    small = _make("tinynoclsa-", dict(no_class_token=True))
    big = _make("tinynoclsb-", dict(no_class_token=True),
                force_image_size=64)
    assert big.params["visual"]["positional_embedding"].shape[0] == 64  # 8x8

    merged = merge_converted_params(big.params, jax.device_get(small.params),
                                    strict=True)
    pe = np.asarray(merged["visual"]["positional_embedding"])
    assert pe.shape == (64, 64)
    # resized grid, not the init values
    assert not np.allclose(
        pe, np.asarray(big.params["visual"]["positional_embedding"]))


def test_cls_checkpoint_into_cls_free_drops_prefix(tmp_path):
    """A cls-token checkpoint loaded into a cls-free tower of the same grid
    drops the cls pos row instead of failing."""
    from xtagclip_tpu.convert.loader import merge_converted_params

    src = _make("tinyclssrc-", dict())          # cls tower: 17 pos rows
    dst = _make("tinynoclsd-", dict(no_class_token=True))  # 16 rows
    src_params = jax.device_get(src.params)
    src_pe = np.asarray(src_params["visual"]["positional_embedding"])
    assert src_pe.shape[0] == 17

    merged = merge_converted_params(dst.params, src_params, strict=False)
    pe = np.asarray(merged["visual"]["positional_embedding"])
    assert pe.shape == (16, 64)
    np.testing.assert_allclose(pe, src_pe[1:], rtol=1e-6)

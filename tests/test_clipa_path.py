"""CLIPA two-stage resolution-change path, executed end to end (round-2
VERDICT item 4; BASELINE config #5).

Drives the exact CLI contract of scripts/h14_224_32_finetune.sh and
clipav2_vit_h14_i84_224_336_cl32_gap_datacomp1b.sh at reduced width but with
the REAL ViT-H/14 grid transition (16x16 -> 24x24 tokens, the same 224->336
ratio): stage-A training at the base resolution saves a checkpoint; stage B
loads it with --force-image-size at 1.5x, which must bicubic-resize the
vision pos-embed on load (reference model.py:1065-1096; resize parity vs
torch is pinned in test_parity_fullscale.py), then train and evaluate at the
new shape. Structural CL32-GAP features (avg pool + final_ln_after_pool,
last-token pool + no_causal_mask text) are in the config under test.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=64,
    vision_cfg=dict(
        layers=4, width=64, head_width=32, patch_size=8, image_size=128,
        pool_type="avg", final_ln_after_pool=True,
    ),
    text_cfg=dict(
        context_length=32, vocab_size=49408, width=64, heads=2, layers=2,
        pool_type="last", no_causal_mask=True,
    ),
)

BASE, BIG = 128, 192  # grids 16 -> 24, the ViT-H/14 224->336 transition


def test_clipa_two_stage_resolution_change(tmp_path):
    from xtagclip_tpu.cli import main as main_cli
    from xtagclip_tpu.factory import add_model_config

    cfg_path = tmp_path / "tiny-clipah.json"
    cfg_path.write_text(json.dumps(CFG))
    add_model_config(cfg_path)

    # stage A — h14_224_32_finetune.sh contract (synthetic stands in for wds)
    main_cli.main([
        "--model", "tiny-clipah",
        "--dataset-type", "synthetic", "--train-num-samples", "16",
        "--batch-size", "4", "--epochs", "1", "--warmup", "1",
        "--precision", "fp32", "--lr", "1e-4",
        "--force-image-size", str(BASE),
        "--grad-checkpointing", "--local-loss", "--gather-with-grad",
        "--logs", str(tmp_path / "logs"), "--name", "stageA",
        "--val-frequency", "0", "--workers", "1",
    ])
    ckpt = tmp_path / "logs" / "stageA" / "checkpoints" / "epoch_1"
    assert ckpt.is_dir()

    # stage B — clipav2 336 contract: pretrained load + force-image-size 1.5x
    # + squash/bilinear/imagenet-norm preprocessing overrides, then train+eval
    main_cli.main([
        "--model", "tiny-clipah",
        "--pretrained", str(ckpt),
        "--force-image-size", str(BIG),
        "--image-resize-mode", "squash",
        "--image-interpolation", "bilinear",
        "--image-mean", "0.485", "0.456", "0.406",
        "--image-std", "0.229", "0.224", "0.225",
        "--dataset-type", "synthetic", "--train-num-samples", "16",
        "--val-data", "synthetic", "--val-num-samples", "8",
        "--batch-size", "4", "--epochs", "1", "--warmup", "1",
        "--precision", "fp32", "--lr", "1e-5",
        "--logs", str(tmp_path / "logs"), "--name", "stageB",
        "--val-frequency", "1", "--workers", "1",
    ])
    assert (tmp_path / "logs" / "stageB" / "checkpoints" / "epoch_1").is_dir()


def test_force_image_size_resizes_pos_embed_on_load(tmp_path):
    """create_model(pretrained=..., force_image_size=1.5x) must land a
    bicubic-resized [24*24+1, W] vision pos-embed, not the init values."""
    import jax

    from xtagclip_tpu.convert.loader import load_checkpoint_into
    from xtagclip_tpu.factory import add_model_config, create_model
    from xtagclip_tpu.models.pos_embed import resize_vision_pos_embed
    from xtagclip_tpu.train.checkpoint import save_train_state

    cfg_path = tmp_path / "tiny-clipah2.json"
    cfg_path.write_text(json.dumps(CFG))
    add_model_config(cfg_path)

    src = create_model("tiny-clipah2")
    ckpt_dir = save_train_state(str(tmp_path), "ckpt",
                                {"params": src.params})

    dst = create_model("tiny-clipah2", force_image_size=BIG)
    load_checkpoint_into(dst, ckpt_dir)
    got = np.asarray(dst.params["visual"]["positional_embedding"])
    assert got.shape[0] == (BIG // 8) ** 2 + 1

    want = resize_vision_pos_embed(
        np.asarray(src.params["visual"]["positional_embedding"]),
        (BIG // 8, BIG // 8))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # and the resized model runs at the new resolution
    x = np.random.default_rng(0).standard_normal(
        (2, BIG, BIG, 3)).astype(np.float32)
    feats, tokens = dst.encode_image(x)
    assert feats.shape == (2, 64)
    assert tokens.shape[1] == (BIG // 8) ** 2 + 1  # incl. cls token

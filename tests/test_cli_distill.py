"""Vanilla CLI: --distill-model / --use-bn-sync / --profile wiring end-to-end
(reference open_clip_train/main.py distillation path, loss.py:187-223)."""

import json
import os

import pytest

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=64,
    vision_cfg=dict(layers=1, width=64, head_width=32, patch_size=8,
                    image_size=16),
    text_cfg=dict(context_length=16, vocab_size=49408, width=64, heads=2,
                  layers=1),
)


def test_main_cli_distill_synthetic(tmp_path):
    from xtagclip_tpu.cli import main as main_cli
    from xtagclip_tpu.factory import add_model_config

    cfg_path = tmp_path / "tiny-distill.json"
    cfg_path.write_text(json.dumps(CFG))
    add_model_config(cfg_path)

    main_cli.main([
        "--model", "tiny-distill",
        "--distill-model", "tiny-distill",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "4", "--epochs", "1", "--warmup", "1",
        "--precision", "fp32", "--lr", "1e-4",
        "--profile", "--profile-steps", "1",
        "--logs", str(tmp_path / "logs"), "--name", "distill_e2e",
        "--log-every-n-steps", "1", "--val-frequency", "0",
        "--workers", "1",
    ])
    ckpts = tmp_path / "logs" / "distill_e2e" / "checkpoints"
    assert (ckpts / "epoch_1").is_dir()
    trace_dir = tmp_path / "logs" / "distill_e2e" / "trace"
    assert any(p.is_file() for p in trace_dir.rglob("*")), (
        "--profile produced no trace files"
    )


def test_main_cli_bn_sync_resnet(tmp_path):
    """RN tower + --use-bn-sync through the CLI (reference
    main_other.py:370-371 SyncBatchNorm wiring)."""
    from xtagclip_tpu.cli import main as main_cli
    from xtagclip_tpu.factory import add_model_config

    cfg = dict(
        embed_dim=32,
        vision_cfg=dict(layers=[1, 1, 1, 1], width=16, image_size=32),
        text_cfg=dict(context_length=16, vocab_size=49408, width=32, heads=2,
                      layers=1),
    )
    cfg_path = tmp_path / "tiny-rn.json"
    cfg_path.write_text(json.dumps(cfg))
    add_model_config(cfg_path)

    main_cli.main([
        "--model", "tiny-rn",
        "--use-bn-sync",
        "--dataset-type", "synthetic",
        "--train-num-samples", "16",
        "--batch-size", "8", "--epochs", "1", "--warmup", "1",
        "--precision", "fp32", "--lr", "1e-4",
        "--logs", str(tmp_path / "logs"), "--name", "bnsync_e2e",
        "--log-every-n-steps", "1", "--val-frequency", "0",
        "--workers", "1",
    ])
    assert (tmp_path / "logs" / "bnsync_e2e" / "checkpoints" / "epoch_1").is_dir()

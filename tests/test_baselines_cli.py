"""End-to-end runs of the three standalone fine-tune baseline CLIs
(BASELINE.md configs #1 and #3; reference resnet50_baseline.py,
clip_baseline.py, biomedclip_baseline.py): train a couple of epochs on a
tiny on-disk scar dataset, then check the metrics/ckpt/plot artifacts."""

import json
import os
import tempfile

import numpy as np
import pytest

from scar_fixtures import make_scar_dataset

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def scar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scar_baselines")
    csv = make_scar_dataset(str(root), n=10, image_size=48)
    return str(root), csv


@pytest.fixture(scope="module")
def tiny_clip_config():
    from xtagclip_tpu.factory import add_model_config

    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=16,
                        image_size=64),
        text_cfg=dict(context_length=16, vocab_size=1000, width=64, heads=2,
                      layers=2),
    )
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     prefix="tinybaseline-",
                                     delete=False) as f:
        json.dump(cfg, f)
    add_model_config(f.name)
    return os.path.basename(f.name)[:-5]


def _common_args(scar_root, tmp_path, ckpt, plot):
    root, csv = scar_root
    return [
        "--train-root", root, "--val-root", root,
        "--train-csv", csv, "--val-csv", csv,
        "--batch-size", "4", "--epochs", "2", "--patience", "5",
        "--ckpt", str(tmp_path / ckpt), "--output", str(tmp_path / plot),
    ]


def _check(metrics, tmp_path, ckpt, plot):
    assert 0.0 <= metrics["accuracy"] <= 1.0
    for k in ("macro_precision", "macro_recall", "macro_f1", "weighted_f1",
              "per_class"):
        assert k in metrics, metrics
    assert (tmp_path / ckpt).exists()
    assert (tmp_path / plot).exists()


def test_resnet50_baseline_cli(scar_root, tmp_path):
    from xtagclip_tpu.cli.baselines import resnet50_baseline

    metrics = resnet50_baseline.main(
        _common_args(scar_root, tmp_path, "r50.pkl", "r50.png")
        + ["--image-size", "64"]
    )
    _check(metrics, tmp_path, "r50.pkl", "r50.png")


def test_clip_baseline_cli(scar_root, tmp_path, tiny_clip_config):
    from xtagclip_tpu.cli.baselines import clip_baseline

    metrics = clip_baseline.main(
        _common_args(scar_root, tmp_path, "clip.pkl", "clip.png")
        + ["--model", tiny_clip_config, "--lock-image"]
    )
    _check(metrics, tmp_path, "clip.pkl", "clip.png")


def test_biomedclip_baseline_cli(scar_root, tmp_path, tiny_clip_config):
    """--lock-image + --lock-text-encoder (BASELINE config #3's flags): the
    locked vision tower must be excluded from the trainable set and stay
    bit-frozen through training (the classifier tree carries only
    visual + head; text params never enter it, matching the head's design)."""
    import pickle

    import jax

    from xtagclip_tpu.cli.baselines import biomedclip_baseline

    metrics = biomedclip_baseline.main(
        _common_args(scar_root, tmp_path, "bmc.pkl", "bmc.png")
        + ["--model", tiny_clip_config, "--lock-image",
           "--lock-text-encoder"]
    )
    _check(metrics, tmp_path, "bmc.pkl", "bmc.png")

    with open(tmp_path / "bmc.pkl", "rb") as f:
        saved = pickle.load(f)
    trained = saved["params"] if isinstance(saved, dict) and "params" in saved \
        else saved
    assert "visual" in trained, list(trained)
    from xtagclip_tpu.cli.baselines.clip_baseline import build_classifier

    _, fresh_params, _, _ = build_classifier(tiny_clip_config, None, 3, True)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg="locked visual param changed during training"),
        trained["visual"], fresh_params["visual"],
    )
    # the head must have actually trained away from its deterministic init
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        trained["head"], fresh_params["head"]))
    assert any(changed), "head params identical to init - no training happened"

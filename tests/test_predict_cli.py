"""Batch-prediction CLI (cli/predict.py): images in, JSONL out.

No reference analogue (its eval paths need labeled datasets); this is the
serving entry point. Covers: directory + CSV inputs, last-batch padding,
tag output, fusion scoring, and the .npz feature dump.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from xtagclip_tpu.cli.predict import main as predict_main

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pred_imgs")
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(
            rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
        ).save(d / f"im{i}.jpg")
    return d


TINY = ["--model", "test-tiny", "--precision", "fp32"]


@pytest.fixture(scope="module", autouse=True)
def tiny_config(tmp_path_factory):
    import json as _json

    from xtagclip_tpu.factory import add_model_config

    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=16,
                        image_size=32),
        text_cfg=dict(context_length=77, vocab_size=49408, width=64,
                      heads=2, layers=2),
    )
    d = tmp_path_factory.mktemp("cfg")
    p = d / "test-tiny.json"
    p.write_text(_json.dumps(cfg))
    add_model_config(str(p))
    fcfg = dict(cfg, fusion_dim=64)
    fp = d / "test-tiny-fusion.json"
    fp.write_text(_json.dumps(fcfg))
    add_model_config(str(fp))


def test_predict_directory_with_tags_and_embed(image_dir, tmp_path):
    out = tmp_path / "preds.jsonl"
    emb = tmp_path / "emb.npz"
    predict_main(TINY + [
        "--input", str(image_dir), "--use-tagging", "--batch-size", "4",
        "--output", str(out), "--save-embed", str(emb),
    ])
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == 5  # 4 + padded last batch of 1
    scar_classes = {"Others", "Hypertrophic scar", "Keloid scar"}
    for r in recs:
        assert r["class"] in scar_classes
        assert abs(sum(r["probs"].values()) - 1.0) < 1e-2
        assert len(r["tags"]) == 6  # one pick per attribute category
    d = np.load(emb)
    assert d["image_features"].shape == (5, 64)
    assert d["image_features"].dtype == np.float32


def test_predict_csv_fusion_scoring(image_dir, tmp_path, capsys):
    csv = tmp_path / "in.csv"
    csv.write_text("filepath,caption\n" + "\n".join(
        f"{image_dir}/im{i}.jpg,x" for i in range(2)) + "\n")
    predict_main(TINY + [
        "--input", str(csv), "--fusion-scoring", "--batch-size", "2",
        "--dataset", "pathmnist",
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    recs = [json.loads(l) for l in lines]
    assert len(recs) == 2
    assert len(recs[0]["probs"]) == 9  # PathMNIST classes
    assert "tags" not in recs[0]


def test_predict_classname_override(image_dir, capsys):
    predict_main(TINY + [
        "--input", str(image_dir / "im0.jpg"),
        "--classnames", "cat,dog", "--template", "a photo of a {}.",
    ])
    rec = json.loads(capsys.readouterr().out.splitlines()[0])
    assert set(rec["probs"]) == {"cat", "dog"}


def test_train_checkpoint_predict_roundtrip(image_dir, tmp_path, capsys):
    """Lifecycle: main_other trains on synthetic data -> orbax checkpoint ->
    predict --resume serves it. Proves our own checkpoints feed the serving
    entry point, not just converted torch ones."""
    from xtagclip_tpu.cli import main_other

    main_other.main([
        "--model", "test-tiny",
        "--dataset-type", "synthetic",
        "--train-num-samples", "8",
        "--batch-size", "4", "--epochs", "1", "--warmup", "1",
        "--precision", "fp32", "--lr", "1e-4",
        "--logs", str(tmp_path / "logs"), "--name", "lifecycle",
        "--val-frequency", "0", "--workers", "1",
    ])
    ckpt = tmp_path / "logs" / "lifecycle" / "checkpoints" / "last"
    assert ckpt.is_dir()

    predict_main(TINY + [
        "--input", str(image_dir / "im0.jpg"),
        "--resume", str(ckpt),
        "--classnames", "cat,dog",
    ])
    rec = json.loads(capsys.readouterr().out.splitlines()[0])
    assert set(rec["probs"]) == {"cat", "dog"}


def test_predict_fusion_classify(image_dir, tmp_path):
    """--fusion-classify: precomputed pseudo-prompt space + TQN scoring
    (serving.py) as the class decision."""
    out = tmp_path / "fpreds.jsonl"
    predict_main([
        "--model", "test-tiny-fusion", "--precision", "fp32",
        "--input", str(image_dir), "--fusion-classify",
        "--batch-size", "4", "--output", str(out),
    ])
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == 5
    for r in recs:
        assert r["class"] in {"Others", "Hypertrophic scar", "Keloid scar"}
        assert len(r["tags"]) == 6


def test_predict_fusion_classify_from_artifact(image_dir, tmp_path):
    """Deploy-without-model-code: --export-serving writes the AOT artifact
    (serve_classify with the prompt table baked in), then --serving-artifact
    reruns the same inputs from the blob alone and must reproduce the live
    run's classes and tags."""
    live_out = tmp_path / "live.jsonl"
    art = tmp_path / "artifact"
    predict_main([
        "--model", "test-tiny-fusion", "--precision", "fp32",
        "--input", str(image_dir), "--fusion-classify",
        "--batch-size", "4", "--output", str(live_out),
        "--export-serving", str(art),
    ])
    assert (art / "serving_manifest.json").is_file()
    assert (art / "serve_classify.stablehlo").is_file()

    art_out = tmp_path / "art.jsonl"
    predict_main([
        "--input", str(image_dir), "--fusion-classify",
        "--batch-size", "4", "--output", str(art_out),
        "--serving-artifact", str(art),
    ])
    live = [json.loads(l) for l in live_out.read_text().splitlines()]
    from_art = [json.loads(l) for l in art_out.read_text().splitlines()]
    assert len(from_art) == len(live) == 5
    for a, b in zip(from_art, live):
        assert a["image"] == b["image"]
        assert a["class"] == b["class"]
        assert a["tags"] == b["tags"]
        for c, p in b["probs"].items():
            # live path normalizes on host in fp32, the artifact in-graph —
            # probabilities agree to preprocessing noise
            assert abs(a["probs"][c] - p) < 0.05

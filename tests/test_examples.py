"""The examples/ scripts run as documented (subprocess, tiny models).

Each is invoked the way the README documents — `JAX_PLATFORMS=cpu python
examples/...` — which also exercises the scripts' programmatic CPU forcing
(TPU plugins that ignore the env var would otherwise hang the documented
command in device init).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = dict(
    embed_dim=64,
    fusion_dim=64,
    vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=16,
                    image_size=32),
    text_cfg=dict(context_length=77, vocab_size=49408, width=64, heads=2,
                  layers=2),
)


@pytest.fixture(scope="module")
def tiny_cfg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("excfg")
    (d / "ex-tiny.json").write_text(json.dumps(TINY))
    return d


def _run(script, args, cfg_dir, timeout=420):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # make the tiny config reachable through the registry scan
    env["XTAGCLIP_EXTRA_CONFIGS"] = str(cfg_dir)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stdout


def test_zero_shot_example(tiny_cfg_dir):
    out = _run("zero_shot_classification.py", ["--model", "ex-tiny"],
               tiny_cfg_dir)
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 3  # one ranked line per scar class
    assert "scar" in out or "Others" in out


def test_feature_extraction_example(tiny_cfg_dir, tmp_path):
    out_npz = tmp_path / "emb.npz"
    _run("feature_extraction.py",
         ["--model", "ex-tiny", "--batch-size", "8", "--out", str(out_npz)],
         tiny_cfg_dir)
    d = np.load(out_npz)
    assert d["image_features"].shape == (8, 64)
    assert d["image_features"].dtype == np.float32


def test_xtag_inference_example(tiny_cfg_dir):
    out = _run("xtag_inference.py",
               ["--model", "ex-tiny", "--batch-size", "2"], tiny_cfg_dir)
    assert "tag_logits: (2, 44)" in out
    assert "fusion i2t:" in out

"""Profiler CLI (reference open_clip_train/profiler.py:128-249): per-model
GFLOPs/GMACs/Mparams rows and the CSV report."""

import csv
import json
import os
import tempfile

import pytest

from xtagclip_tpu.cli import profiler
from xtagclip_tpu.factory import add_model_config

pytestmark = pytest.mark.e2e

# big enough that GFLOPs don't round to 0.0 at the CSV's 2-decimal precision
CFG = dict(
    embed_dim=64,
    vision_cfg=dict(layers=4, width=256, head_width=64, patch_size=8,
                    image_size=64),
    text_cfg=dict(context_length=16, vocab_size=300, width=64, heads=2,
                  layers=2),
)


@pytest.fixture(scope="module")
def tiny_name():
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinyprof-",
                                     delete=False) as f:
        json.dump(CFG, f)
    add_model_config(f.name)
    return os.path.basename(f.name)[:-5]


def test_profiler_rows_and_csv(tiny_name, tmp_path):
    out = tmp_path / "profile.csv"
    rows = profiler.main(["--model", tiny_name, "--results-file", str(out)])
    assert len(rows) == 1
    row = rows[0]
    assert row["model"] == tiny_name
    assert row["mparams"] > 0
    assert row["image_mparams"] > 0 and row["text_mparams"] > 0
    # XLA cost analysis flops: positive when available (nan-tolerated on
    # backends without cost analysis, but CPU provides it)
    assert row["image_gflops"] > 0
    assert abs(row["image_gmacs"] * 2 - row["image_gflops"]) < 0.015
    assert row["text_gflops"] >= 0  # tiny text tower may round to 0.0

    with open(out) as f:
        got = list(csv.DictReader(f))
    assert len(got) == 1 and got[0]["model"] == tiny_name


def test_profiler_keeps_going_on_bad_model(tiny_name, capsys):
    rows = profiler.main(["--model", f"no-such-model,{tiny_name}"])
    assert len(rows) == 1 and rows[0]["model"] == tiny_name
    assert "profile failed" in capsys.readouterr().out

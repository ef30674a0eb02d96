"""Behavioral parity of the non-model surfaces vs the reference's own code.

The model towers are parity-tested elsewhere (test_parity_*); this file pins
the *metric and schedule math* against the reference implementations executed
directly (torch CPU):

- grouped tag metrics vs others/train_other.py:549-648 calculate_batch_metrics
  (through the reference's own string round-trip, get_selected_items :524-547)
- one-hot / int top-k accuracy vs others/train_other.py:650-692 accuracy
- retrieval R@K vs open_clip_train/train.py:360-378 get_clip_metrics
- LR schedules vs open_clip_train/scheduler.py:13-56 across the warmup /
  cooldown boundaries

The reference functions are extracted by name with ast (their host modules
import the full torch/webdataset stack, which we don't want in this tier).
"""

from __future__ import annotations

import ast
import logging
import math

import numpy as np
import pytest

from xtagclip_tpu.train import scheduler as our_sched
from xtagclip_tpu.train.metrics import (
    accuracy_onehot,
    accuracy_topk,
    retrieval_metrics,
    tag_batch_metrics,
)
from xtagclip_tpu.utils.assets import read_tag_list

REF = "/root/reference/src"


def _extract_functions(path, names):
    """Compile only the named top-level functions from a reference file."""
    src = open(path).read()
    tree = ast.parse(src)
    keep = [n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in names]
    assert len(keep) == len(names), (path, names)
    mod = ast.Module(body=keep, type_ignores=[])
    import torch

    ns = {"torch": torch, "np": np, "numpy": np, "logging": logging,
          "math": math}
    exec(compile(mod, path, "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref_train_other():
    return _extract_functions(
        f"{REF}/others/train_other.py",
        ["get_selected_items", "calculate_batch_metrics", "accuracy"],
    )


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


# ---------------------------------------------------------------------------
# grouped tag metrics
# ---------------------------------------------------------------------------

def _assert_metric_dicts_close(got, want, atol=1e-5):
    for key in ("accuracy", "precision", "recall", "f1"):
        np.testing.assert_allclose(got[key], want[key], atol=atol,
                                   err_msg=key)
    assert got["groups"].keys() == want["groups"].keys()
    for gname, gwant in want["groups"].items():
        for key in ("accuracy", "precision", "recall", "f1"):
            np.testing.assert_allclose(
                got["groups"][gname][key], gwant[key], atol=atol,
                err_msg=f"{gname}.{key}")


def test_tag_metrics_match_reference_roundtrip(ref_train_other, rng):
    """Binary preds -> reference string round-trip -> reference metrics must
    equal our tag_batch_metrics on the same binary matrices, overall and for
    every attribute group."""
    import torch

    tags = read_tag_list("scar_tag_list.txt")
    assert len(tags) == 22
    for density in (0.5, 0.15, 0.9):
        true = (rng.random((32, 22)) < 0.5).astype(np.float32)
        pred = (rng.random((32, 22)) < density).astype(np.float32)

        pred_strings = ref_train_other["get_selected_items"](
            torch.from_numpy(pred), tags)
        want = ref_train_other["calculate_batch_metrics"](
            torch.from_numpy(true), pred_strings, tags)
        got = tag_batch_metrics(true, pred)
        _assert_metric_dicts_close(got, want)


def test_tag_metrics_match_reference_control_word_shape(ref_train_other, rng):
    """The production shape: exactly one predicted tag per attribute group
    (prepare_control_words / prepare_tag_indices output)."""
    import torch

    tags = read_tag_list("scar_tag_list.txt")
    sizes = [3, 4, 3, 4, 4, 4]
    starts = np.cumsum([0] + sizes[:-1])
    b = 48
    pred = np.zeros((b, 22), np.float32)
    for start, size in zip(starts, sizes):
        choice = rng.integers(0, size, b)
        pred[np.arange(b), start + choice] = 1.0
    true = np.zeros((b, 22), np.float32)
    for start, size in zip(starts, sizes):
        choice = rng.integers(0, size, b)
        true[np.arange(b), start + choice] = 1.0

    pred_strings = ref_train_other["get_selected_items"](
        torch.from_numpy(pred), tags)
    want = ref_train_other["calculate_batch_metrics"](
        torch.from_numpy(true), pred_strings, tags)
    got = tag_batch_metrics(true, pred)
    _assert_metric_dicts_close(got, want)


def test_tag_metrics_empty_prediction_rows(ref_train_other):
    """Rows with no positives on either side exercise the eps guards."""
    import torch

    tags = read_tag_list("scar_tag_list.txt")
    true = np.zeros((4, 22), np.float32)
    true[1, 3] = 1.0
    pred = np.zeros((4, 22), np.float32)
    pred[2, 5] = 1.0

    pred_strings = ref_train_other["get_selected_items"](
        torch.from_numpy(pred), tags)
    want = ref_train_other["calculate_batch_metrics"](
        torch.from_numpy(true), pred_strings, tags)
    got = tag_batch_metrics(true, pred)
    _assert_metric_dicts_close(got, want)


# ---------------------------------------------------------------------------
# top-k accuracy
# ---------------------------------------------------------------------------

def test_accuracy_int_targets_matches_reference(ref_train_other, rng):
    import torch

    logits = rng.standard_normal((64, 20), dtype=np.float32)
    target = rng.integers(0, 20, 64)
    want = ref_train_other["accuracy"](
        torch.from_numpy(logits), torch.from_numpy(target), topk=(1, 5))
    got = accuracy_topk(logits, target, topk=(1, 5))
    np.testing.assert_allclose(got, want)


def test_accuracy_onehot_matches_reference(ref_train_other, rng):
    import torch

    logits = rng.standard_normal((64, 12), dtype=np.float32)
    # multi-hot targets incl. some all-zero rows
    target = (rng.random((64, 12)) < 0.2).astype(np.float32)
    want_overall, want_counts, want_class = ref_train_other["accuracy"](
        torch.from_numpy(logits), torch.from_numpy(target), topk=(1, 2),
        onehot_target=True)
    got_overall, got_counts, got_class = accuracy_onehot(
        logits, target, topk=(1, 2))
    np.testing.assert_allclose(got_overall, want_overall)
    np.testing.assert_allclose(got_counts, want_counts.numpy())
    for k in (1, 2):
        np.testing.assert_allclose(got_class[k], want_class[k].numpy(),
                                   err_msg=f"k={k}")


# ---------------------------------------------------------------------------
# retrieval metrics
# ---------------------------------------------------------------------------

def test_retrieval_metrics_match_reference(rng):
    import torch

    fns = _extract_functions(f"{REF}/open_clip_train/train.py",
                             ["get_clip_metrics"])
    img = rng.standard_normal((40, 16), dtype=np.float32)
    txt = rng.standard_normal((40, 16), dtype=np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    want = fns["get_clip_metrics"](
        torch.from_numpy(img), torch.from_numpy(txt), torch.tensor(100.0))
    got = retrieval_metrics(img, txt, logit_scale=100.0)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(got[key], want[key], atol=1e-6,
                                   err_msg=key)


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------

class _FakeOpt:
    def __init__(self):
        self.param_groups = [{"lr": 0.0}]


@pytest.fixture(scope="module")
def ref_scheduler():
    return _extract_functions(
        f"{REF}/open_clip_train/scheduler.py",
        ["assign_learning_rate", "_warmup_lr", "const_lr",
         "const_lr_cooldown", "cosine_lr"],
    )


def _compare_schedule(ref_fn, ours_fn, steps):
    # ours evaluates in float32 (traceable jnp schedule); the reference in
    # python float64 — hence the slightly loose rtol
    for step in range(steps):
        np.testing.assert_allclose(
            float(ours_fn(step)), ref_fn(step), rtol=1e-5, atol=1e-7,
            err_msg=f"step {step}")


def test_cosine_lr_matches_reference(ref_scheduler):
    ref = ref_scheduler["cosine_lr"](_FakeOpt(), 0.5, 10, 100)
    ours = our_sched.cosine_lr(0.5, 10, 100)
    _compare_schedule(ref, ours, 100)


def test_const_lr_matches_reference(ref_scheduler):
    ref = ref_scheduler["const_lr"](_FakeOpt(), 2e-3, 7, 50)
    ours = our_sched.const_lr(2e-3, 7, 50)
    _compare_schedule(ref, ours, 50)


@pytest.mark.parametrize("power,end_lr", [(1.0, 0.0), (2.0, 1e-5)])
def test_const_lr_cooldown_matches_reference(ref_scheduler, power, end_lr):
    ref = ref_scheduler["const_lr_cooldown"](
        _FakeOpt(), 1e-3, 5, 80, 30, cooldown_power=power,
        cooldown_end_lr=end_lr)
    ours = our_sched.const_lr_cooldown(
        1e-3, 5, 80, 30, cooldown_power=power, cooldown_end_lr=end_lr)
    _compare_schedule(ref, ours, 80)

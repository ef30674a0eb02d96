"""Orbax checkpointing: epoch saves, latest, 4-way best policy, partial load.

Replaces the reference torch.save flow (main_other.py:580-644):
- epoch_{N} + epoch_latest (atomic — orbax writes tmp then renames, same
  crash-safety as the reference's tmp.pt + os.replace);
- best_{metric} checkpoints for train-top1 / train-loss / val-top1 / tag-acc;
- --delete-previous-checkpoint pruning;
- resume-latest discovery.
"""

from __future__ import annotations

import logging
import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

BEST_KEYS = ("train_top1", "train_loss", "val_top1", "tag_acc")


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_train_state(ckpt_dir: str, tag: str, state_tree: Any):
    """Save {params, opt_state, step, epoch,...} under ckpt_dir/tag."""
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    if os.path.exists(path):
        shutil.rmtree(path)
    with _checkpointer() as ckptr:
        ckptr.save(path, state_tree)
    return path


def restore_train_state(ckpt_dir: str, tag: str, template: Any) -> Any:
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    with _checkpointer() as ckptr:
        return ckptr.restore(path, template)


def restore_params(path: str, params_template: Any) -> Any:
    """Restore bare params from a saved train-state dir or params dir."""
    path = os.path.abspath(path)
    with _checkpointer() as ckptr:
        try:
            return ckptr.restore(os.path.join(path, "params"), params_template)
        except Exception:
            restored = ckptr.restore(path, {"params": params_template})
            return restored["params"]


def restore_params_raw(path: str) -> Any:
    """Restore bare params with the CHECKPOINT's own shapes (no template).

    Needed when loading into a model whose geometry differs — e.g. the CLIPA
    --force-image-size finetune path, where the vision pos-embed is resized
    after load (reference factory.py:216-217)."""
    path = os.path.abspath(path)
    with _checkpointer() as ckptr:
        sub = os.path.join(path, "params")
        if os.path.isdir(sub):
            return ckptr.restore(sub)
        restored = ckptr.restore(path)
        if isinstance(restored, dict) and "params" in restored:
            return restored["params"]
        return restored


def _clone_tree(src: str, dst: str):
    """Duplicate a finished checkpoint dir via hardlinks (fallback: copy).

    Checkpoint files are write-once (re-saves rmtree the dir first, which
    only unlinks — never mutates shared inodes), so hardlink clones are safe
    and turn the N-way epoch_latest/best_* duplication into metadata ops.
    """
    tmp = dst + ".tmp_clone"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    try:
        shutil.copytree(src, tmp, copy_function=os.link)
    except OSError:  # cross-device / fs without hardlinks
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(src, tmp)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.rename(tmp, dst)
    return dst


class CheckpointManager:
    """Epoch/latest/best checkpoint policy (reference main_other.py:580-644).

    Each distinct state is serialized ONCE per epoch; the other tags
    (epoch_latest, best_*) are hardlink clones of that save — the reference
    re-writes the full .pt for every tag, which at real checkpoint sizes
    multiplies epoch IO several-fold.
    """

    def __init__(self, ckpt_dir: str, save_frequency: int = 1,
                 save_most_recent: bool = True,
                 delete_previous: bool = False, save_best: bool = False):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)
        self.save_frequency = save_frequency
        self.save_most_recent = save_most_recent
        self.delete_previous = delete_previous
        self.save_best = save_best
        self.best = {k: -np.inf for k in BEST_KEYS}
        self.best["train_loss"] = np.inf
        self._last_saved = None  # ((id, epoch, step), path)

    def _save_or_clone(self, tag: str, state_tree: Any):
        path = os.path.abspath(os.path.join(self.dir, tag))
        # id() alone can be reused after GC; epoch+step pin the content
        # (params only change when step advances), so a stale clone would
        # need an id collision at the exact same training position.
        if isinstance(state_tree, dict):
            marker = (id(state_tree), state_tree.get("epoch"),
                      state_tree.get("step"))
        else:
            marker = (id(state_tree), None, None)
        if self._last_saved is not None:
            last_marker, src = self._last_saved
            if last_marker == marker and src != path and os.path.isdir(src):
                return _clone_tree(src, path)
        save_train_state(self.dir, tag, state_tree)
        self._last_saved = (marker, path)
        return path

    def save_epoch(self, epoch: int, state_tree: Any):
        if self.save_frequency > 0 and (epoch % self.save_frequency) == 0:
            self._save_or_clone(f"epoch_{epoch}", state_tree)
            if self.delete_previous:
                prev = os.path.join(self.dir, f"epoch_{epoch - self.save_frequency}")
                if os.path.isdir(prev):
                    shutil.rmtree(prev)
                    if (self._last_saved
                            and self._last_saved[1] == os.path.abspath(prev)):
                        self._last_saved = None
        if self.save_most_recent:
            self._save_or_clone("epoch_latest", state_tree)

    def save_if_best(self, metrics: dict, state_tree: Any):
        if not self.save_best:
            return []
        saved = []
        for key in BEST_KEYS:
            if key not in metrics:
                continue
            v = float(metrics[key])
            better = v < self.best[key] if key == "train_loss" else v > self.best[key]
            if better:
                self.best[key] = v
                self._save_or_clone(f"best_{key}", state_tree)
                saved.append(key)
        return saved

    def save_last(self, state_tree: Any):
        self._save_or_clone("last", state_tree)

    def latest_tag(self) -> Optional[str]:
        return find_latest_checkpoint(self.dir)


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """'--resume latest' discovery (main_other.py:195-227)."""
    if not os.path.isdir(ckpt_dir):
        return None
    if os.path.isdir(os.path.join(ckpt_dir, "epoch_latest")):
        return "epoch_latest"
    epochs = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m and os.path.isdir(os.path.join(ckpt_dir, name)):
            epochs.append(int(m.group(1)))
    if epochs:
        return f"epoch_{max(epochs)}"
    return None

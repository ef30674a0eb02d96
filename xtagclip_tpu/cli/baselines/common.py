"""Shared machinery for the three standalone fine-tune baselines
(reference {resnet50,clip,biomedclip}_baseline.py): supervised CE training
over scar/PathMNIST CSVs with early stopping, macro P/R/F1 eval, result plots.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xtagclip_tpu.data.loader import DataLoader
from xtagclip_tpu.data.scar import ScarDataset


class ScarClassificationDataset:
    """Adapter over ScarDataset yielding (image, class_idx, additional, name)
    — the baseline contract (resnet50_baseline.py:56-187)."""

    def __init__(self, root, csv_file, transform, is_train=True):
        class _NullTok:
            def __call__(self, texts):
                return np.zeros((1, 1), np.int32)

        self.inner = ScarDataset(
            root, csv_file=csv_file, transform=transform, is_train=is_train,
            tokenizer=_NullTok(),
        )

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, idx):
        image, label_vec, additional, _t, _w, class_idx = self.inner[idx]
        return image, np.int32(class_idx), additional, os.path.basename(
            self.inner.imgs[idx]
        )


class EarlyStopping:
    """Patience-based early stop on val loss (biomedclip_baseline.py:439-470)."""

    def __init__(self, patience: int = 5, mode: str = "min"):
        self.patience = patience
        self.mode = mode
        self.best = np.inf if mode == "min" else -np.inf
        self.counter = 0
        self.should_stop = False

    def step(self, value: float) -> bool:
        """Returns True when `value` is a new best."""
        better = value < self.best if self.mode == "min" else value > self.best
        if better:
            self.best = value
            self.counter = 0
            return True
        self.counter += 1
        if self.counter >= self.patience:
            self.should_stop = True
        return False


def classification_metrics(logits: np.ndarray, targets: np.ndarray,
                           num_classes: int) -> Dict[str, Any]:
    """Accuracy + per-class and macro/weighted P/R/F1
    (resnet50_baseline.py:235-414 reporting)."""
    pred = np.argmax(logits, axis=1)
    acc = float((pred == targets).mean())
    per_class = {}
    ps, rs, f1s, ns = [], [], [], []
    for c in range(num_classes):
        tp = float(((pred == c) & (targets == c)).sum())
        fp = float(((pred == c) & (targets != c)).sum())
        fn = float(((pred != c) & (targets == c)).sum())
        p = tp / (tp + fp) if tp + fp > 0 else 0.0
        r = tp / (tp + fn) if tp + fn > 0 else 0.0
        f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
        n = int((targets == c).sum())
        per_class[c] = {"precision": p, "recall": r, "f1": f1, "support": n}
        ps.append(p); rs.append(r); f1s.append(f1); ns.append(n)
    total = max(sum(ns), 1)
    return {
        "accuracy": acc,
        "macro_precision": float(np.mean(ps)),
        "macro_recall": float(np.mean(rs)),
        "macro_f1": float(np.mean(f1s)),
        "weighted_f1": float(sum(f * n for f, n in zip(f1s, ns)) / total),
        "per_class": per_class,
    }


def train_supervised(
    apply_fn: Callable,   # (params, extra, images, additional, train, rng) -> logits
    params,
    extra_vars,
    train_loader: DataLoader,
    val_loader: DataLoader,
    num_classes: int,
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    num_epochs: int = 100,
    patience: int = 15,
    trainable_mask=None,
    ckpt_path: Optional[str] = None,
    mutable_stats: bool = False,
):
    """Generic supervised loop shared by all three baselines."""
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if trainable_mask is not None:
        labels = jax.tree.map(lambda t: "t" if t else "f", trainable_mask)
        tx = optax.multi_transform({"t": tx, "f": optax.set_to_zero()}, labels)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, extra, opt_state, images, additional, targets, rng):
        def loss_fn(p):
            out = apply_fn(p, extra, images, additional, True, rng)
            if mutable_stats:
                logits, new_extra = out
            else:
                logits, new_extra = out, extra
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), targets
            ).mean()
            return loss, (logits, new_extra)

        (loss, (logits, new_extra)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        acc = (jnp.argmax(logits, axis=1) == targets).mean()
        return params2, new_extra, opt_state2, loss, acc

    @jax.jit
    def eval_step(params, extra, images, additional):
        logits = apply_fn(params, extra, images, additional, False, None)
        return logits

    stopper = EarlyStopping(patience=patience, mode="min")
    history = {"train_loss": [], "train_acc": [], "val_loss": [], "val_acc": []}
    best_params = params
    best_extra = extra_vars
    rng = jax.random.PRNGKey(0)

    for epoch in range(num_epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        tl, ta, n = 0.0, 0.0, 0
        for batch in train_loader:
            images, targets, additional = batch[0], batch[1], batch[2]
            rng, sub = jax.random.split(rng)
            params, extra_vars, opt_state, loss, acc = train_step(
                params, extra_vars, opt_state, jnp.asarray(images),
                jnp.asarray(additional), jnp.asarray(targets), sub,
            )
            b = np.shape(images)[0]
            tl += float(loss) * b
            ta += float(acc) * b
            n += b
        vl, all_logits, all_targets = 0.0, [], []
        vn = 0
        for batch in val_loader:
            images, targets, additional = batch[0], batch[1], batch[2]
            logits = eval_step(params, extra_vars, jnp.asarray(images),
                               jnp.asarray(additional))
            loss = optax.softmax_cross_entropy_with_integer_labels(
                jnp.asarray(logits, jnp.float32), jnp.asarray(targets)
            ).mean()
            b = np.shape(images)[0]
            vl += float(loss) * b
            vn += b
            all_logits.append(np.asarray(logits))
            all_targets.append(np.asarray(targets))
        val_logits = np.concatenate(all_logits) if all_logits else np.zeros((0, num_classes))
        val_targets = np.concatenate(all_targets) if all_targets else np.zeros((0,), np.int32)
        val_acc = float((np.argmax(val_logits, 1) == val_targets).mean()) if vn else 0.0

        history["train_loss"].append(tl / max(n, 1))
        history["train_acc"].append(ta / max(n, 1))
        history["val_loss"].append(vl / max(vn, 1))
        history["val_acc"].append(val_acc)
        logging.info(
            "epoch %d: train_loss %.4f acc %.4f | val_loss %.4f acc %.4f (%.1fs)",
            epoch, history["train_loss"][-1], history["train_acc"][-1],
            history["val_loss"][-1], val_acc, time.time() - t0,
        )
        if stopper.step(history["val_loss"][-1]):
            best_params, best_extra = params, extra_vars
            if ckpt_path:
                _save_pytree(ckpt_path, {"params": jax.device_get(params),
                                         "extra": jax.device_get(extra_vars)})
        if stopper.should_stop:
            logging.info("early stopping at epoch %d", epoch)
            break

    return best_params, best_extra, history


def evaluate_supervised(apply_fn, params, extra_vars, loader,
                        num_classes: int) -> Dict[str, Any]:
    @jax.jit
    def eval_step(params, extra, images, additional):
        return apply_fn(params, extra, images, additional, False, None)

    logits, targets = [], []
    for batch in loader:
        images, t, additional = batch[0], batch[1], batch[2]
        logits.append(np.asarray(eval_step(
            params, extra_vars, jnp.asarray(images), jnp.asarray(additional)
        )))
        targets.append(np.asarray(t))
    if not logits:
        return {"accuracy": 0.0}
    return classification_metrics(
        np.concatenate(logits), np.concatenate(targets), num_classes
    )


def plot_history(history: dict, out_path: str):
    """Loss/accuracy curves (resnet50_baseline.py:545-589)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        logging.warning("matplotlib unavailable; skipping plot")
        return
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    axes[0].plot(history["train_loss"], label="train")
    axes[0].plot(history["val_loss"], label="val")
    axes[0].set_title("Loss"); axes[0].legend()
    axes[1].plot(history["train_acc"], label="train")
    axes[1].plot(history["val_acc"], label="val")
    axes[1].set_title("Accuracy"); axes[1].legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    logging.info("saved plot to %s", out_path)


def _save_pytree(path, tree):
    import pickle

    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, tree), f)


def load_pytree(path):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)

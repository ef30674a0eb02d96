"""Epoch driver: batch adaptation, template selection, throughput telemetry.

Mirrors reference others/train_other.py:65-287: per-step GT-prompt-template
selection, XTag loss combo (inside the jitted step), loss meters, samples/s
and samples/s/device logging every --log-every-n-steps.
"""

from __future__ import annotations

import logging
import random
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from xtagclip_tpu.train.logger import AverageMeter


def adapt_batch(batch, use_tagging: bool, template_id: int = 0,
                prompt_template_setting: Optional[str] = None,
                rng: Optional[random.Random] = None):
    """Normalize a dataset batch into the train-step dict.

    Scar batches: (image, label, additional, gt_tokens[B,5,ctx], class_word,
    class_idx); generic: (image, texts).
    """
    if isinstance(batch, (tuple, list)) and len(batch) >= 6:
        images, label, additional, gt_tokens, class_words, class_idx = batch[:6]
        # reference train_other.py:97-110: pick one GT prompt variant per step
        sel = template_id
        if prompt_template_setting == "total":
            sel = (rng or random).randint(0, gt_tokens.shape[1] - 1)
        out = {
            "images": images,
            "texts": np.asarray(gt_tokens[:, sel]),
            "additional": np.asarray(additional),
            "class_ids": np.asarray(class_idx, np.int32),
            "template_id": sel,
        }
        return out, np.asarray(label), list(class_words)
    images, texts = batch[:2]
    out = {"images": images, "texts": np.asarray(texts)}
    if use_tagging:
        # generic (synthetic/csv/webdataset) batches carry no class label;
        # the pseudo-prompt lookup still needs a class row — class 0, like
        # the reference's generic-caption path which simply has no class word
        out["class_ids"] = np.zeros(np.asarray(texts).shape[0], np.int32)
        out["template_id"] = template_id
    return out, None, None


def train_one_epoch(
    state,
    step_fn,
    data: Dict[str, Any],
    epoch: int,
    args,
    schedule=None,
    rng_key=None,
    train_key: Optional[str] = None,
    mesh=None,
):
    """Run one epoch of jitted steps. Returns (state, epoch_metrics).

    When a mesh is given, each batch is device_put with a 'data'-axis
    NamedSharding before the step so GSPMD data parallelism actually
    activates (XLA all-reduces grads / all-gathers negatives over ICI);
    without it the batch enters jit replicated and every device redundantly
    computes the same samples.
    """
    train_key = train_key or ("scar_train" if "scar_train" in data else "train")
    info = data[train_key]
    info.set_epoch(epoch)
    dataloader = info.dataloader
    num_batches = len(dataloader)

    device_count = jax.device_count()
    meters: Dict[str, AverageMeter] = {}
    batch_time = AverageMeter()
    data_time = AverageMeter()
    host_rng = random.Random(args.seed + epoch)
    if rng_key is None:
        rng_key = jax.random.PRNGKey(args.seed)

    accum_freq = max(int(getattr(args, "accum_freq", 1) or 1), 1)

    def to_microbatches(bd):
        # make_accum_train_step consumes [accum_freq, micro_b, ...] arrays
        def r(x):
            if hasattr(x, "ndim") and x.ndim > 0:
                b = x.shape[0]
                return np.asarray(x).reshape(
                    (accum_freq, b // accum_freq) + x.shape[1:]
                )
            return x

        return {k: r(v) for k, v in bd.items()}

    shard = None
    if mesh is not None:
        from xtagclip_tpu.core.mesh import DATA_AXIS
        from xtagclip_tpu.parallel.sharding import shard_batch

        data_size = mesh.shape.get(DATA_AXIS, 1)

        def shard(bd):
            b = int(np.shape(bd["images"])[-4])  # microbatch dim under accum
            if data_size > 1 and b % data_size:
                if not getattr(args, "_warned_unshardable", False):
                    logging.warning(
                        "batch %d not divisible by data-parallel size %d; "
                        "running replicated (no DP speedup). Use a batch "
                        "size that is a multiple of the device count.",
                        b, data_size,
                    )
                    args._warned_unshardable = True
                return bd
            return shard_batch(bd, mesh, accum=accum_freq > 1)

    # --profile: capture a jax.profiler trace of a short steady-state window
    # (skips step 0/1 compile) in epoch 0 (SURVEY 5.1: the TPU equivalent of
    # the reference's flop-counter/torch-trace tooling).
    profile = bool(getattr(args, "profile", False)) and epoch == 0
    profile_dir = getattr(args, "profile_dir", None) or (
        f"{getattr(args, 'logs', '.')}/{getattr(args, 'name', 'run')}/trace"
    )
    prof_start, prof_stop = 2, 2 + int(getattr(args, "profile_steps", 5) or 5)
    profiling = False

    end = time.time()
    last_metrics = {}
    # jitted steps dispatch ASYNCHRONOUSLY: per-iteration host timing is
    # meaningless between sync points. Throughput is therefore measured over
    # whole log intervals — samples dispatched since the last device_get,
    # divided by the wall time to this device_get (which waits out the
    # device backlog). PERF.md methodology, applied to the trainer's own
    # telemetry (reference train_other.py:251-259 measures sync steps).
    t_interval = time.time()
    interval_samples = interval_steps = 0
    epoch_samples = 0
    epoch_time = 0.0
    for i, batch in enumerate(dataloader):
        if profile and i == prof_start:
            jax.profiler.start_trace(profile_dir)
            profiling = True
            logging.info("profiler trace started -> %s", profile_dir)
        batch_dict, _, _ = adapt_batch(
            batch,
            use_tagging=getattr(args, "use_tagging", False),
            prompt_template_setting=getattr(args, "prompt_template_setting", None),
            rng=host_rng,
        )
        if accum_freq > 1:
            batch_dict = to_microbatches(batch_dict)
        if shard is not None:
            batch_dict = shard(batch_dict)
        data_time.update(time.time() - end)
        state, metrics = step_fn(state, batch_dict, rng_key)
        ishape = np.shape(batch_dict["images"])
        interval_samples += int(
            ishape[0] * (ishape[1] if accum_freq > 1 else 1))
        interval_steps += 1

        if profiling and (i + 1 == prof_stop or i == num_batches - 1):
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            profiling = False
            logging.info("profiler trace written -> %s", profile_dir)

        if (i % args.log_every_n_steps) == 0 or i == num_batches - 1:
            metrics = jax.device_get(metrics)  # sync point: backlog drained
            last_metrics = metrics
            for k, v in metrics.items():
                meters.setdefault(k, AverageMeter()).update(float(v))
            now = time.time()
            interval_t = max(now - t_interval, 1e-9)
            batch_time.update(interval_t / max(interval_steps, 1))
            samples_per_s = interval_samples / interval_t
            epoch_samples += interval_samples
            epoch_time += interval_t
            t_interval = now
            interval_samples = interval_steps = 0
            lr = float(schedule(int(state.step))) if schedule else float("nan")
            logging.info(
                "Train Epoch: %d [%d/%d] loss: %.5g lr: %.3g "
                "logit_scale: %.3f data: %.3fs batch: %.3fs "
                "samples/s: %.1f samples/s/device: %.1f",
                epoch, i, num_batches, float(metrics.get("loss", np.nan)),
                lr, float(metrics.get("logit_scale", np.nan)),
                data_time.val, batch_time.val, samples_per_s,
                samples_per_s / device_count,
            )
        end = time.time()

    epoch_metrics = {k: m.avg for k, m in meters.items()}
    if last_metrics and epoch_samples:
        epoch_metrics["samples_per_second"] = epoch_samples / max(
            epoch_time, 1e-9)
    return state, epoch_metrics

"""Vanilla CLIP training CLI — the open_clip_train.main equivalent.

Same flow as reference src/open_clip_train/main.py (the entry used by
scripts/h14_*.sh and clipav*.sh): contrastive-only training with webdataset/
csv/synthetic data, optional SigLIP loss, retrieval eval, tensorboard/wandb
sinks when requested.

Run: python -m xtagclip_tpu.cli.main --model ViT-B-32 --dataset-type synthetic ...
"""

from __future__ import annotations

import json
import logging
import os
import sys
from datetime import datetime

import jax
import numpy as np

from xtagclip_tpu.core.mesh import create_mesh, init_distributed, is_master
from xtagclip_tpu.data.registry import get_data
from xtagclip_tpu.factory import create_model_and_transforms, get_tokenizer
from xtagclip_tpu.parallel.sharding import shard_params
from xtagclip_tpu.train.checkpoint import CheckpointManager, find_latest_checkpoint
from xtagclip_tpu.train.evaluate import evaluate
from xtagclip_tpu.train.logger import setup_logging
from xtagclip_tpu.train.loop import make_accum_train_step, make_train_step
from xtagclip_tpu.train.params import parse_args
from xtagclip_tpu.train.scheduler import create_scheduler
from xtagclip_tpu.train.train_state import (
    create_train_state,
    make_optimizer,
    trainable_mask,
)
from xtagclip_tpu.train.trainer import train_one_epoch


def main(argv=None):
    args = parse_args(argv, include_xtag=False)
    for attr, default in (("use_tagging", False), ("use_fusion", False),
                          ("prompt_template_setting", None),
                          ("save_embed", False), ("save_best", False),
                          ("load_tagging_only", False)):
        if not hasattr(args, attr):
            setattr(args, attr, default)

    init_distributed(args)
    if args.name is None:
        args.name = "-".join([
            datetime.now().strftime("%Y_%m_%d-%H_%M_%S"),
            f"model_{args.model.replace('/', '-')}",
            f"lr_{args.lr}", f"b_{args.batch_size}", f"p_{args.precision}",
        ])
    log_base_path = os.path.join(args.logs, args.name)
    args.log_path = None
    if is_master(args) or args.log_local:
        os.makedirs(log_base_path, exist_ok=True)
        args.log_path = os.path.join(
            log_base_path, f"out-{args.rank}" if args.log_local else "out.log"
        )
    setup_logging(args.log_path, logging.DEBUG if args.debug else logging.INFO)
    args.checkpoint_path = os.path.join(log_base_path, "checkpoints")
    if is_master(args):
        os.makedirs(args.checkpoint_path, exist_ok=True)
    if getattr(args, "copy_codebase", False) and is_master(args):
        from xtagclip_tpu.train.file_utils import copy_codebase

        logging.info("copied codebase to %s", copy_codebase(args))

    tb_writer = None
    if "tensorboard" in (args.report_to or ""):
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(os.path.join(log_base_path, "tensorboard"))
        except ImportError:
            logging.warning("tensorboard unavailable")
    if "wandb" in (args.report_to or ""):
        try:
            import wandb

            wandb.init(project=args.wandb_project_name, name=args.name,
                       notes=args.wandb_notes, config=vars(args))
        except ImportError:
            logging.warning("wandb unavailable")

    precision = {
        "amp": "bf16", "amp_bf16": "bf16", "amp_bfloat16": "bf16",
        "fp16": "bf16",
    }.get(args.precision, args.precision)

    bundle, preprocess_train, preprocess_val = create_model_and_transforms(
        args.model, args.pretrained or None, precision=precision,
        force_quick_gelu=args.force_quick_gelu,
        force_image_size=(
            args.force_image_size[0] if args.force_image_size and
            len(args.force_image_size) == 1 else args.force_image_size
        ),
        grad_checkpointing=args.grad_checkpointing,
        use_bn_sync=args.use_bn_sync,
        cache_dir=getattr(args, "cache_dir", None),
        **({"vision_cfg": {"patch_dropout": args.force_patch_dropout}}
           if args.force_patch_dropout is not None else {}),
        image_mean=args.image_mean, image_std=args.image_std,
        image_interpolation=args.image_interpolation,
        image_resize_mode=args.image_resize_mode, aug_cfg=args.aug_cfg,
    )
    tokenizer = get_tokenizer(args.model)

    # --torchscript/--trace (reference training.main:226 trace_model):
    # emit the AOT serving artifact — serialized StableHLO of
    # encode_image/encode_text/forward with a symbolic batch dim, weights
    # baked in (convert/serving.py), the jax-native traced-module analogue
    if getattr(args, "torchscript", False) or getattr(args, "trace", False):
        from xtagclip_tpu.convert.serving import save_serving

        serve_dir = os.path.join(
            args.checkpoint_path or args.logs or ".", "serving")
        manifest = save_serving(bundle, serve_dir, model_name=args.model)
        logging.info(
            "serving artifact: %s (%s)", serve_dir,
            ", ".join(f"{k}={v['bytes'] / 1e6:.1f}MB"
                      for k, v in manifest["entries"].items()))

    if args.resume == "latest":
        tag = find_latest_checkpoint(args.checkpoint_path)
        args.resume = os.path.join(args.checkpoint_path, tag) if tag else None

    mesh = create_mesh(model_parallel=getattr(args, "model_parallel", 1) or 1)
    params = shard_params(bundle.params, mesh, fsdp=getattr(args, "fsdp", False))

    data = get_data(args, (preprocess_train, preprocess_val), epoch=0,
                    tokenizer=tokenizer)
    if not data:
        raise RuntimeError("no data specified (--train-data/--val-data)")

    if "train" not in data:
        evaluate(bundle.module, {"params": params, **bundle.extra_variables}, data, 0, args, tokenizer, tb_writer)
        return

    steps_per_epoch = len(data["train"].dataloader)
    schedule = create_scheduler(args, steps_per_epoch * args.epochs)
    mask = trainable_mask(
        params, lock_image=args.lock_image,
        lock_image_unlocked_groups=args.lock_image_unlocked_groups,
        lock_text=args.lock_text,
        lock_text_unlocked_layers=args.lock_text_unlocked_layers,
        lock_text_freeze_layer_norm=args.lock_text_freeze_layer_norm,
    )
    tx = make_optimizer(schedule, beta1=args.beta1, beta2=args.beta2,
                        eps=args.eps, weight_decay=args.wd,
                        grad_clip_norm=args.grad_clip_norm, params=params,
                        train_mask=mask, opt=args.opt, momentum=args.momentum)
    state = create_train_state(params, tx, extra_vars=bundle.extra_variables)

    start_epoch = 0
    if args.resume:
        from xtagclip_tpu.convert.loader import load_checkpoint_into
        from xtagclip_tpu.train.checkpoint import restore_train_state

        if os.path.isdir(args.resume):
            restored = restore_train_state(
                os.path.dirname(args.resume), os.path.basename(args.resume),
                {"state": state, "epoch": 0},
            )
            state = restored["state"]
            start_epoch = int(restored["epoch"]) + 1
        else:
            bundle.params = state.params
            load_checkpoint_into(bundle, args.resume)
            state = state.replace(params=bundle.params)

    teacher = None
    if args.distill_model:
        # frozen teacher (reference main.py --distill-model/--distill-pretrained,
        # DistillClipLoss loss.py:187-223); forward runs inside the jitted step.
        from xtagclip_tpu.factory import create_model

        t_bundle = create_model(
            args.distill_model, args.distill_pretrained or None,
            precision=precision,
            # teacher consumes the student's preprocessed batches, so it must
            # share the student's input geometry
            force_image_size=(
                args.force_image_size[0] if args.force_image_size and
                len(args.force_image_size) == 1 else args.force_image_size
            ),
        )
        teacher = (
            t_bundle.module,
            # under --fsdp the frozen teacher's params shard too — its HBM
            # share matters exactly when the student's does
            {"params": shard_params(t_bundle.params, mesh,
                                    fsdp=getattr(args, "fsdp", False)),
             **t_bundle.extra_variables},
        )

    args_cfg = {
        "siglip": args.siglip, "use_tagging_loss": False,
        "lock_image_freeze_bn_stats": bool(
            args.lock_image and args.lock_image_freeze_bn_stats),
    }
    if args.loss_dist_impl:
        # reference --loss-dist-impl picks the SigLIP collective variant
        # (loss.py:314-448 'bidir'/'shift'/'reduce'/'gather')
        args_cfg["siglip_dist_impl"] = args.loss_dist_impl
    if "coca" in args.model.lower():
        args_cfg.update(
            coca=True,
            coca_caption_loss_weight=args.coca_caption_loss_weight,
            coca_contrastive_loss_weight=args.coca_contrastive_loss_weight,
        )
    if args.accum_freq > 1:
        if teacher is not None:
            logging.warning(
                "--distill-model is not supported with --accum-freq > 1 "
                "(feature-cache replay path); distillation disabled."
            )
        step_fn = make_accum_train_step(bundle.module, tx, args_cfg,
                                        args.accum_freq)
    else:
        step_fn = make_train_step(bundle.module, tx, args_cfg, donate=False,
                                  teacher=teacher, mesh=mesh)

    ckpt_mgr = CheckpointManager(
        args.checkpoint_path, save_frequency=args.save_frequency,
        save_most_recent=args.save_most_recent,
        delete_previous=args.delete_previous_checkpoint,
    )
    rng_key = jax.random.PRNGKey(args.seed)
    for epoch in range(start_epoch, args.epochs):
        logging.info("Start epoch %d", epoch)
        state, train_metrics = train_one_epoch(
            state, step_fn, data, epoch, args,
            schedule=schedule, rng_key=rng_key, train_key="train",
            mesh=mesh,
        )
        completed = epoch + 1
        evaluate(bundle.module, {"params": state.params, **(state.extra_vars or {})},
                 data, completed, args, tokenizer, tb_writer)
        if is_master(args):
            ckpt_mgr.save_epoch(completed,
                                {"state": jax.device_get(state), "epoch": epoch})
    return state


if __name__ == "__main__":
    main(sys.argv[1:])

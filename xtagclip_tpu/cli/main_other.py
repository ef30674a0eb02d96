"""XTag training/eval CLI — the others.main_other equivalent.

Same public flag surface and flow as reference src/others/main_other_simple.py:
parse -> distributed init -> experiment naming + resume-latest -> model build
(use_tagging/use_fusion/prompt_template_setting) -> tower locks -> optimizer ->
partial/full resume -> data (get_data with get_data_other fallback) ->
scheduler -> epoch loop with 4-way best checkpointing -> final 'last' save.

Run: python -m xtagclip_tpu.cli.main_other --model ViT-B-32 --dataset-type synthetic ...
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
from xtagclip_tpu.data.registry import get_data, get_data_other
from xtagclip_tpu.factory import create_model_and_transforms, get_tokenizer
from xtagclip_tpu.parallel.sharding import shard_batch, shard_params
from xtagclip_tpu.tokenize.prompts import PromptTable
from xtagclip_tpu.train import metadata
from xtagclip_tpu.train.checkpoint import (
    CheckpointManager,
    find_latest_checkpoint,
    restore_train_state,
)
from xtagclip_tpu.train.file_utils import start_sync_process
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
from xtagclip_tpu.train.zero_shot import train_data_eval, zero_shot_eval

LATEST_CHECKPOINT_NAME = "epoch_latest"


def main(argv=None):
    args = parse_args(argv)

    init_distributed(args)

    # experiment naming (reference main_other.py:150-164)
    if args.name is None:
        args.name = "-".join(
            [
                datetime.now().strftime("%Y_%m_%d-%H_%M_%S"),
                f"model_{args.model.replace('/', '-')}",
                f"lr_{args.lr}",
                f"b_{args.batch_size}",
                f"p_{args.precision}",
            ]
        )

    log_base_path = os.path.join(args.logs, args.name)
    args.log_path = None
    if is_master(args) or args.log_local:
        os.makedirs(log_base_path, exist_ok=True)
        log_filename = f"out-{args.rank}" if args.log_local else "out.log"
        args.log_path = os.path.join(log_base_path, log_filename)
    setup_logging(args.log_path, logging.DEBUG if args.debug else logging.INFO)

    args.checkpoint_path = os.path.join(log_base_path, "checkpoints")
    if is_master(args):
        os.makedirs(args.checkpoint_path, exist_ok=True)
        with open(os.path.join(log_base_path, "params.txt"), "w") as f:
            for name in sorted(vars(args)):
                f.write(f"{name}: {getattr(args, name)}\n")

    if getattr(args, "copy_codebase", False) and is_master(args):
        from xtagclip_tpu.train.file_utils import copy_codebase

        logging.info("copied codebase to %s", copy_codebase(args))

    # wandb/tensorboard hard-disabled as in the reference XTag mains
    # (main_other.py:184-185); the vanilla loop keeps them.
    args.wandb = False
    args.tensorboard = False

    if args.resume == "latest":
        tag = find_latest_checkpoint(args.checkpoint_path)
        args.resume = os.path.join(args.checkpoint_path, tag) if tag else None
        logging.info("resume latest -> %s", args.resume)

    remote_sync_process = None
    if args.remote_sync and is_master(args):
        remote_sync_process = start_sync_process(
            args.remote_sync_frequency, log_base_path,
            os.path.join(args.remote_sync, args.name),
            args.remote_sync_protocol,
        )
        remote_sync_process.start()

    precision = {
        "amp": "bf16", "amp_bf16": "bf16", "amp_bfloat16": "bf16",
        "fp16": "bf16",  # no fp16 HW path on TPU; bf16 is strictly better
    }.get(args.precision, args.precision)

    bundle, preprocess_train, preprocess_val = create_model_and_transforms(
        args.model,
        args.pretrained or None,
        precision=precision,
        force_quick_gelu=args.force_quick_gelu,
        force_image_size=(
            args.force_image_size[0] if args.force_image_size and
            len(args.force_image_size) == 1 else args.force_image_size
        ),
        use_tagging=args.use_tagging,
        use_fusion=args.use_fusion,
        prompt_template_setting=args.prompt_template_setting,
        grad_checkpointing=args.grad_checkpointing,
        use_bn_sync=args.use_bn_sync,
        cache_dir=getattr(args, "cache_dir", None),
        image_mean=args.image_mean,
        image_std=args.image_std,
        image_interpolation=args.image_interpolation,
        image_resize_mode=args.image_resize_mode,
        aug_cfg=args.aug_cfg,
        **({"vision_cfg": {
            **({"patch_dropout": args.force_patch_dropout}
               if args.force_patch_dropout is not None else {}),
            **({"n_learnable_tokens": args.n_learnable_tokens,
                "insert_position": args.insert_position}
               if args.add_learnable_tokens else {}),
        }} if (args.force_patch_dropout is not None
               or args.add_learnable_tokens) else {}),
    )
    tokenizer = get_tokenizer(args.model)

    if args.load_tagging_only and args.resume:
        from xtagclip_tpu.convert.loader import (
            load_checkpoint_into,
            tagging_only_filter,
        )

        load_checkpoint_into(bundle, args.resume, key_filter=tagging_only_filter)
        args.resume = None

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(bundle.params))
    logging.info("Model %s: %.2fM params", args.model, n_params / 1e6)

    # mesh + sharding (DP over all devices; params replicated unless --fsdp)
    mesh = create_mesh(model_parallel=getattr(args, "model_parallel", 1) or 1)
    params = shard_params(bundle.params, mesh, fsdp=getattr(args, "fsdp", False))

    # data
    # reference main_other.py:473-486: bare try get_data, fall back to the
    # scar/PathMNIST/MedicalMNIST dispatch on any failure
    try:
        data = get_data(
            args, (preprocess_train, preprocess_val), epoch=0,
            tokenizer=tokenizer,
        )
    except Exception as e:  # noqa: BLE001
        logging.info("get_data failed (%s); trying get_data_other", e)
        data = get_data_other(
            args, (preprocess_train, preprocess_val), epoch=0,
            tokenizer=tokenizer,
        )
    logging.info("datasets: %s", list(data))

    train_key = "scar_train" if "scar_train" in data else (
        "train" if "train" in data else None
    )

    # prompt table for the traceable tag->prompt path
    prompt_table = None
    if args.use_tagging:
        table = PromptTable(list(metadata.SCAR_CLASSNAMES), tokenizer=tokenizer)
        import jax.numpy as jnp

        prompt_table = jnp.asarray(table.table)

    # optimizer
    steps_per_epoch = len(data[train_key].dataloader) if train_key else 0
    total_steps = steps_per_epoch * args.epochs
    schedule = create_scheduler(args, max(total_steps, 1))
    mask = trainable_mask(
        params,
        lock_image=args.lock_image,
        lock_image_unlocked_groups=args.lock_image_unlocked_groups,
        lock_text=args.lock_text,
        lock_text_unlocked_layers=args.lock_text_unlocked_layers,
        lock_text_freeze_layer_norm=args.lock_text_freeze_layer_norm,
    )
    tx = make_optimizer(
        schedule, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        weight_decay=args.wd, grad_clip_norm=args.grad_clip_norm,
        params=params, train_mask=mask,
        opt=args.opt, momentum=args.momentum,
    )
    state = create_train_state(params, tx, extra_vars=bundle.extra_variables)

    start_epoch = 0
    if args.resume:
        from xtagclip_tpu.train.checkpoint import restore_params

        if os.path.isdir(args.resume):
            import orbax.checkpoint as ocp

            meta_path = os.path.join(args.resume, "meta.json")
            template = {"state": state, "epoch": 0}
            try:
                restored = restore_train_state(
                    os.path.dirname(args.resume),
                    os.path.basename(args.resume), template,
                )
                state = restored["state"]
                start_epoch = int(restored["epoch"]) + 1
                logging.info("resumed full state from %s (epoch %d)",
                             args.resume, start_epoch)
            except Exception as e:  # bare-model restore fallback
                logging.info("full-state restore failed (%s); params only", e)
                state = state.replace(
                    params=restore_params(args.resume, state.params)
                )
        else:
            from xtagclip_tpu.convert.loader import load_checkpoint_into

            bundle.params = state.params
            load_checkpoint_into(bundle, args.resume)
            state = state.replace(params=bundle.params)

    args_cfg = {
        "siglip": args.siglip,
        "use_tagging_loss": args.use_tagging,
        # driver-instantiated ASL uses defaults (main_other.py:553)
        "asl_gamma_neg": 4, "asl_gamma_pos": 1, "asl_clip": 0.05,
        "lock_image_freeze_bn_stats": bool(
            args.lock_image and args.lock_image_freeze_bn_stats),
    }
    if args.accum_freq > 1:
        step_fn = make_accum_train_step(
            bundle.module, tx, args_cfg, args.accum_freq,
            prompt_table=prompt_table,
        )
    else:
        step_fn = make_train_step(
            bundle.module, tx, args_cfg, prompt_table=prompt_table,
            donate=False, mesh=mesh,
        )

    ckpt_mgr = CheckpointManager(
        args.checkpoint_path, save_frequency=args.save_frequency,
        save_most_recent=True,
        delete_previous=args.delete_previous_checkpoint,
        save_best=args.save_best,
    )

    if train_key is None:
        # eval-only (reference main_other.py:561-568)
        metrics = zero_shot_eval(
            bundle.module,
            {"params": state.params, **(state.extra_vars or {})},
            data, 0, args, tokenizer, prompt_table=prompt_table,
        )
        logging.info("eval: %s", json.dumps(metrics, default=float))
        return metrics

    rng_key = jax.random.PRNGKey(args.seed)
    last_tree = None
    for epoch in range(start_epoch, args.epochs):
        logging.info("Start epoch %d", epoch)
        state, train_metrics = train_one_epoch(
            state, step_fn, data, epoch, args,
            schedule=schedule, rng_key=rng_key, train_key=train_key,
            mesh=mesh,
        )
        completed = epoch + 1

        eval_metrics = {}
        zs_every = args.zeroshot_frequency or args.val_frequency
        if (completed % max(zs_every, 1) == 0) or completed == args.epochs:
            eval_params = {"params": state.params, **(state.extra_vars or {})}
            eval_metrics = zero_shot_eval(
                bundle.module, eval_params, data, completed, args, tokenizer,
                prompt_table=prompt_table,
            )
            # train-split validation pass (reference train_other.py:290-496):
            # top1/top2 + tag metrics on the TRAIN data, traindata_val_*.txt
            # artifacts, and the live train_top1 best-checkpoint metric
            if args.use_tagging and train_key == "scar_train":
                eval_metrics.update(train_data_eval(
                    bundle.module, eval_params, data, args, tokenizer,
                    prompt_table=prompt_table,
                ))
            logging.info("Eval epoch %d: %s", completed,
                         json.dumps(eval_metrics, default=float))

        if is_master(args):
            state_tree = last_tree = {
                "state": jax.device_get(state),
                "epoch": epoch,
            }
            ckpt_mgr.save_epoch(completed, state_tree)
            best_metrics = {
                "train_top1": eval_metrics.get(
                    "train_data-top1", train_metrics.get("top1", -np.inf)
                ),
                "train_loss": train_metrics.get("loss", np.inf),
                "val_top1": eval_metrics.get("scar_val-top1",
                                             eval_metrics.get("val-top1",
                                                              -np.inf)),
                "tag_acc": eval_metrics.get("scar_val-tag_accuracy", -np.inf),
            }
            saved = ckpt_mgr.save_if_best(best_metrics, state_tree)
            if saved:
                logging.info("saved best checkpoints: %s", saved)

    if is_master(args):
        # reuse the final epoch's tree when available so 'last' hardlink-clones
        # the epoch save instead of re-serializing identical state
        ckpt_mgr.save_last(last_tree if last_tree is not None else
                           {"state": jax.device_get(state),
                            "epoch": args.epochs - 1})
    if remote_sync_process is not None:
        remote_sync_process.terminate()
    return state


if __name__ == "__main__":
    main(sys.argv[1:])

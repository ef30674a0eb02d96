"""Jitted train steps.

One jit contains the WHOLE step — forward (incl. the on-device tag->prompt
lookup), losses, backward, optimizer, logit-scale clamp. Data parallelism is
GSPMD: batch arrays carry a 'data'-sharded NamedSharding, params are
replicated; XLA inserts the grad all-reduce and the feature all-gathers over
ICI automatically (equivalent to the reference's DDP + gather_features).

Loss combination mirrors reference train_other.py:117-136:
total = contrastive + 2*tag(ASL on additional.repeat(1,2)) + 2*(dqncos(i2t)+dqncos(t2i)).

Gradient accumulation reproduces the reference's feature-cache replay
(train_other.py:140-216): pass 1 caches features across microbatches without
gradients; pass 2 recomputes each microbatch with gradients against the full
cached negative set — full-effective-batch negatives, bounded activation
memory. Both passes are lax.scan's inside the same jit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from xtagclip_tpu.losses import asymmetric_loss, clip_loss, dqncos_loss, siglip_loss
from xtagclip_tpu.losses.distill import distill_loss
from xtagclip_tpu.train.train_state import TrainState, apply_gradients


def _model_losses(module, params, batch, rngs, args_cfg, prompt_table,
                  extra_vars=None, teacher=None, mesh=None):
    """Forward + the XTag loss combination. Returns (total, (metrics, vars)).

    `teacher` = (teacher_module, teacher_variables) enables distillation
    (reference DistillClipLoss, loss.py:187-223 wired via --distill-model):
    the frozen teacher forward runs inside the same jit so XLA overlaps it
    with the student's compute.
    """
    variables = {"params": params, **(extra_vars or {})}
    mutable = list(extra_vars) if extra_vars else False

    if args_cfg.get("coca"):
        # CoCa train path (reference main.py + CoCaLoss, loss.py:142-184):
        # contrastive + pad-masked caption CE over the decoder logits.
        import optax

        out = module.apply(
            variables, batch["images"], batch["texts"],
            deterministic=False, rngs=rngs,
        )
        contrastive = clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"],
        ) * args_cfg.get("coca_contrastive_loss_weight", 1.0)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            out["logits"].astype(jnp.float32), out["labels"]
        )
        mask = (out["labels"] != args_cfg.get("pad_id", 0)).astype(jnp.float32)
        caption = ((ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
                   ) * args_cfg.get("coca_caption_loss_weight", 2.0)
        metrics = {
            "contrastive_loss": contrastive, "caption_loss": caption,
            "logit_scale": out["logit_scale"], "loss": contrastive + caption,
        }
        return contrastive + caption, (metrics, {})

    # --lock-image-freeze-bn-stats (reference utils.py:11-49,
    # freeze_batch_norm_2d): the locked image tower must both keep its BN
    # running statistics AND normalize with them (not per-batch stats), so the
    # tower runs in eval mode inside the train-mode forward.
    freeze_visual = bool(args_cfg.get("lock_image_freeze_bn_stats"))
    # register the mesh for the traced forward: the fused block kernels'
    # *_auto wrappers shard_map their pallas_call over the data axis
    # (ops/fused_attn_block.mesh_context) — without this, multi-device
    # steps silently lose the kernel win to the XLA fallback
    from xtagclip_tpu.ops import fused_attn_block

    with fused_attn_block.mesh_context(mesh):
        out = module.apply(
            variables,
            batch["images"],
            text=batch.get("texts"),
            prompt_table=prompt_table,
            class_ids=batch.get("class_ids"),
            template_id=batch.get("template_id", 0),
            deterministic=False,
            visual_deterministic=True if freeze_visual else None,
            rngs=rngs,
            mutable=mutable,
        )
    new_vars = {}
    if mutable:
        out, new_vars = out
    logit_scale = out["logit_scale"]
    if args_cfg.get("siglip"):
        data_shards = (
            mesh.shape.get("data", 1) if mesh is not None
            and "data" in mesh.axis_names else 1
        )
        # the ring path needs the batch divisible by the data axis; a ragged
        # final batch (trainer.py runs it replicated, no drop_last) falls
        # back to the global-matrix loss — same value, no collective
        if data_shards > 1 and (
                out["image_features"].shape[0] % data_shards == 0):
            # the canonical ICI ring, INSIDE the executed step: shard_map
            # binds the data axis so siglip_loss's ppermute ring runs as a
            # true collective-permute over the mesh (reference loss.py:226-311
            # neighbour exchange); pmean of per-shard losses equals the
            # global-matrix loss (each shard's ring covers its row block).
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map  # jax >= 0.8
            except ImportError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map

            # reference dist impls (loss.py:314-448): bidir/shift are both
            # neighbour rings -> ppermute ring; reduce/gather -> all_gather
            impl = args_cfg.get("siglip_dist_impl", "shift")
            impl = "gather" if impl in ("gather", "reduce") else "shift"

            def _ring(imgf, txtf, scale, bias):
                l = siglip_loss(imgf, txtf, scale, bias, axis_name="data",
                                dist_impl=impl)
                return jax.lax.pmean(l, "data")

            bias = out.get("logit_bias")
            if bias is None:
                bias = jnp.zeros((), jnp.float32)
            contrastive = shard_map(
                _ring, mesh=mesh,
                in_specs=(P("data"), P("data"), P(), P()),
                out_specs=P(),
            )(out["image_features"], out["text_features"], logit_scale, bias)
        else:
            contrastive = siglip_loss(
                out["image_features"], out["text_features"], logit_scale,
                out.get("logit_bias"),
            )
    else:
        contrastive = clip_loss(
            out["image_features"], out["text_features"], logit_scale,
        )
    metrics = {"contrastive_loss": contrastive, "logit_scale": logit_scale}
    total = contrastive

    if teacher is not None:
        t_module, t_vars = teacher
        with fused_attn_block.mesh_context(mesh):
            t_out = t_module.apply(
                t_vars,
                batch["images"],
                text=batch.get("texts"),
                prompt_table=prompt_table,
                class_ids=batch.get("class_ids"),
                template_id=batch.get("template_id", 0),
                deterministic=True,
            )
        dist_l = distill_loss(
            out["image_features"], out["text_features"], logit_scale,
            jax.lax.stop_gradient(t_out["image_features"]),
            jax.lax.stop_gradient(t_out["text_features"]),
            jax.lax.stop_gradient(t_out["logit_scale"]),
        )
        metrics["distill_loss"] = dist_l
        total = total + dist_l

    if args_cfg.get("use_tagging_loss", True) and "additional" in batch:
        target = jnp.tile(batch["additional"], (1, 2))
        tag_l = asymmetric_loss(
            out["tag_logits"], target,
            gamma_neg=args_cfg.get("asl_gamma_neg", 4),
            gamma_pos=args_cfg.get("asl_gamma_pos", 1),
            clip=args_cfg.get("asl_clip", 0.05),
        )
        metrics["tagging_loss"] = tag_l
        total = total + 2.0 * tag_l  # double-added as in train_other.py:135-136

    if out.get("i2t_cls") is not None:
        ce = dqncos_loss(out["i2t_cls"]) + dqncos_loss(out["t2i_cls"])
        metrics["ce_loss"] = ce
        total = total + 2.0 * ce

    metrics["loss"] = total
    return total, (metrics, new_vars)


def make_train_step(
    module,
    tx,
    args_cfg: Dict[str, Any],
    prompt_table=None,
    donate: bool = True,
    teacher=None,
    mesh=None,
):
    """Build the jitted single-step update: (state, batch, rng) -> (state, metrics)."""

    def step(state: TrainState, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, state.step)}

        def loss_fn(params):
            return _model_losses(
                module, params, batch, rngs, args_cfg, prompt_table,
                extra_vars=state.extra_vars, teacher=teacher, mesh=mesh,
            )

        (_, (metrics, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = apply_gradients(state, grads, tx)
        if new_vars:
            new_state = new_state.replace(extra_vars=new_vars)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_step(
    module,
    tx,
    args_cfg: Dict[str, Any],
    num_steps: int,
    prompt_table=None,
    teacher=None,
    donate: bool = True,
    mesh=None,
):
    """K optimizer steps inside ONE jit via lax.scan over stacked batches
    [K, B, ...]. Amortizes per-dispatch overhead (critical on remote/tunneled
    runtimes where each dispatch costs a round trip) and lets XLA pipeline
    across step boundaries. Returns (state, stacked_metrics)."""

    def one(state: TrainState, batch_rng):
        batch, rng = batch_rng

        def loss_fn(params):
            return _model_losses(
                module, params, batch, {"dropout": rng}, args_cfg,
                prompt_table, extra_vars=state.extra_vars, teacher=teacher,
                mesh=mesh,
            )

        (_, (metrics, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = apply_gradients(state, grads, tx)
        if new_vars:
            new_state = new_state.replace(extra_vars=new_vars)
        return new_state, metrics

    def multi(state: TrainState, batches, rng):
        rngs = jax.random.split(rng, num_steps)
        return jax.lax.scan(one, state, (batches, rngs))

    # donate=False keeps the input state alive (and avoids the one-time
    # recompile when the donated output layout differs from the input's)
    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def make_accum_train_step(
    module,
    tx,
    args_cfg: Dict[str, Any],
    accum_freq: int,
    prompt_table=None,
    donate: bool = True,
):
    """Feature-cache-replay grad accumulation inside one jit.

    batch arrays are shaped [accum_freq, micro_b, ...].
    """

    def step(state: TrainState, batch, rng):
        rngs_base = jax.random.fold_in(rng, state.step)
        extra_vars = state.extra_vars
        variables = {"params": state.params, **(extra_vars or {})}
        # BN towers (RN50): run the cached/replay forwards with the running
        # stats collection present; stat updates are captured from the replay
        # pass below (reference runs both passes in train mode too)
        mutable = list(extra_vars) if extra_vars else False

        def micro(batch_i, i):
            # scalar leaves (e.g. template_id) are shared across microbatches
            return jax.tree.map(
                lambda x: x[i] if jnp.ndim(x) > 0 else x, batch_i
            )

        # pass 1: cache features (no grad)
        def cache_one(carry, i):
            mb = micro(batch, i)
            out = module.apply(
                variables,
                mb["images"],
                text=mb.get("texts"),
                prompt_table=prompt_table,
                class_ids=mb.get("class_ids"),
                template_id=mb.get("template_id", 0),
                deterministic=False,
                rngs={"dropout": jax.random.fold_in(rngs_base, i)},
                mutable=mutable,
            )
            if mutable:
                out, _ = out
            return carry, (out["image_features"], out["text_features"])

        _, (img_f, txt_f) = jax.lax.scan(
            cache_one, None, jnp.arange(accum_freq)
        )
        img_f = jax.lax.stop_gradient(img_f)  # [A, mb, D]
        txt_f = jax.lax.stop_gradient(txt_f)

        # pass 2: per-microbatch grads vs full cached negatives
        def grad_one(carry, i):
            mb = micro(batch, i)

            def loss_fn(params):
                out = module.apply(
                    {"params": params, **(extra_vars or {})},
                    mb["images"],
                    text=mb.get("texts"),
                    prompt_table=prompt_table,
                    class_ids=mb.get("class_ids"),
                    template_id=mb.get("template_id", 0),
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(rngs_base, i)},
                    mutable=mutable,
                )
                new_vars = {}
                if mutable:
                    out, new_vars = out
                # splice this microbatch's live features into the cache
                a, mbs, d = img_f.shape
                all_img = img_f.at[i].set(out["image_features"]).reshape(-1, d)
                all_txt = txt_f.at[i].set(out["text_features"]).reshape(-1, d)
                if args_cfg.get("siglip"):
                    bias = out.get("logit_bias")
                    if bias is None:
                        bias = jnp.zeros((), jnp.float32)
                    contrastive = siglip_loss(
                        all_img, all_txt, out["logit_scale"], bias)
                else:
                    contrastive = clip_loss(
                        all_img, all_txt, out["logit_scale"])
                total = contrastive
                metrics = {"contrastive_loss": contrastive,
                           "logit_scale": out["logit_scale"]}
                # reference accum objective (train_other.py:191-194):
                # total = sum(losses) + tag_losses — tag at 1x and NO
                # dqncos fusion CE, unlike the non-accum step's 2x combo
                if args_cfg.get("use_tagging_loss") and "additional" in mb:
                    tag_l = asymmetric_loss(
                        out["tag_logits"], jnp.tile(mb["additional"], (1, 2)),
                        gamma_neg=args_cfg.get("asl_gamma_neg", 4),
                        gamma_pos=args_cfg.get("asl_gamma_pos", 1),
                        clip=args_cfg.get("asl_clip", 0.05),
                    )
                    total = total + tag_l
                    metrics["tagging_loss"] = tag_l
                metrics["loss"] = total
                return total, (metrics, new_vars)

            ((_, (m, new_vars)), g) = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            carry = jax.tree.map(jnp.add, carry, g)
            return carry, (m, new_vars)

        zero = jax.tree.map(jnp.zeros_like, state.params)
        grads, (metrics, vars_seq) = jax.lax.scan(
            grad_one, zero, jnp.arange(accum_freq))
        metrics = jax.tree.map(lambda x: x.mean(), metrics)
        new_state = apply_gradients(state, grads, tx)
        if mutable:
            # keep the LAST microbatch's updated running stats
            new_state = new_state.replace(extra_vars=jax.tree.map(
                lambda x: x[-1], vars_seq))
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())

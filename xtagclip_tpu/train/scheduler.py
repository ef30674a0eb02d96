"""LR schedules (reference open_clip_train/scheduler.py:13-56): const_lr /
const_lr_cooldown / cosine_lr with linear warmup.

Each returns a pure fn step->lr built on jnp.where so it traces under jit
(usable directly as an optax schedule) and also evaluates host-side for
logging with plain ints.
"""

from __future__ import annotations

import jax.numpy as jnp


def _warmup_lr(base_lr, warmup_length, step):
    return base_lr * (step + 1.0) / max(1.0, float(warmup_length))


def const_lr(base_lr, warmup_length, steps):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(
            step < warmup_length,
            _warmup_lr(base_lr, warmup_length, step),
            base_lr,
        )

    return schedule


def const_lr_cooldown(base_lr, warmup_length, steps, cooldown_steps,
                      cooldown_power=1.0, cooldown_end_lr=0.0):
    start_cooldown_step = steps - cooldown_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        e = jnp.maximum(step - start_cooldown_step, 0.0)
        decay = (1.0 - (e / cooldown_steps)) ** cooldown_power
        cooled = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        lr = jnp.where(step < start_cooldown_step, base_lr, cooled)
        return jnp.where(
            step < warmup_length, _warmup_lr(base_lr, warmup_length, step), lr
        )

    return schedule


def cosine_lr(base_lr, warmup_length, steps):
    es = max(1, steps - warmup_length)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        e = jnp.maximum(step - warmup_length, 0.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(
            step < warmup_length, _warmup_lr(base_lr, warmup_length, step), cos
        )

    return schedule


def create_scheduler(args, total_steps: int):
    if args.skip_scheduler:
        return lambda step: jnp.asarray(args.lr, jnp.float32)
    if args.lr_scheduler == "cosine":
        return cosine_lr(args.lr, args.warmup, total_steps)
    if args.lr_scheduler == "const":
        return const_lr(args.lr, args.warmup, total_steps)
    if args.lr_scheduler == "const-cooldown":
        cooldown_steps = (
            total_steps * args.epochs_cooldown // args.epochs
            if args.epochs_cooldown else total_steps
        )
        return const_lr_cooldown(
            args.lr, args.warmup, total_steps, cooldown_steps,
            args.lr_cooldown_power, args.lr_cooldown_end,
        )
    raise ValueError(f"Unknown scheduler {args.lr_scheduler}")

"""Train state: optax AdamW with the reference's no-decay partition, tower
locking via trainability masks, and the post-step logit_scale clamp.

Reference semantics:
- AdamW param groups: params named gain/bias-ish or with ndim < 2 get wd=0
  (main_other.py:408-427 'exclude' = ndim<2 or endswith .bias or in
  {bn, ln, bias, logit_scale} pattern).
- Tower locking (LiT): lock_image_tower/lock_text_tower freeze all params
  except the last `unlocked_groups` groups (transformer.py:628-659, 971-999).
- logit_scale.clamp_(0, ln(100)) after every optimizer step
  (train_other.py:223-224).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace as dc_replace
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

MAX_LOGIT_SCALE = math.log(100.0)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def decay_mask(params) -> Any:
    """True = apply weight decay. Mirrors the gain/bias exclusion split."""

    def rule(path, leaf):
        name = _path_str(path).lower()
        if leaf.ndim < 2:
            return False
        if name.endswith("/bias") or "logit_scale" in name:
            return False
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def _vit_group_of(path_str: str, num_blocks: int) -> int:
    """Map a visual param path to its lock group index.

    Groups (transformer.py:633-646): 0 = stem (conv1/cls/pos/ln_pre),
    1..num_blocks-1 = resblocks[:-1], num_blocks = last block + ln_post,
    num_blocks+1 = proj. Total groups = num_blocks + 2.
    """
    if "resblocks_" in path_str:
        i = int(path_str.split("resblocks_")[1].split("/")[0])
        return min(i, num_blocks - 1) + 1 if i < num_blocks - 1 else num_blocks
    if "ln_post" in path_str or "attn_pool" in path_str:
        return num_blocks
    if path_str.endswith("proj") or "/proj" in path_str:
        return num_blocks + 1
    return 0  # conv1, class_embedding, positional_embedding, ln_pre


def _text_group_of(path_str: str, num_blocks: int) -> int:
    """Groups (transformer.py:976-988): 0 = embeddings, 1..B-1 = blocks[:-1],
    B = last block + ln_final (+ text_projection stays locked)."""
    if "resblocks_" in path_str:
        i = int(path_str.split("resblocks_")[1].split("/")[0])
        return min(i, num_blocks - 1) + 1 if i < num_blocks - 1 else num_blocks
    if "ln_final" in path_str:
        return num_blocks
    if "text_projection" in path_str:
        return -1  # never unlocked by groups in the reference
    return 0  # token_embedding, positional_embedding, cls_emb


def trainable_mask(
    params,
    lock_image: bool = False,
    lock_image_unlocked_groups: int = 0,
    lock_text: bool = False,
    lock_text_unlocked_layers: int = 0,
    lock_text_freeze_layer_norm: bool = False,
    num_vision_blocks: Optional[int] = None,
    num_text_blocks: Optional[int] = None,
) -> Any:
    """True = trainable. Implements LiT-style tower freezing."""

    def count_blocks(tower):
        t = params.get(tower, {})
        tr = t.get("transformer", {})
        return sum(1 for k in tr if k.startswith("resblocks_"))

    nv = num_vision_blocks or count_blocks("visual")
    nt = num_text_blocks or count_blocks("text")

    def rule(path, leaf):
        p = _path_str(path)
        if lock_image and p.startswith("visual/"):
            if lock_image_unlocked_groups == 0:
                return False
            total_groups = nv + 2
            g = _vit_group_of(p[len("visual/"):], nv)
            return g >= total_groups - lock_image_unlocked_groups
        if lock_text and p.startswith("text/"):
            if not lock_text_freeze_layer_norm and (
                "/ln_" in p or "LayerNorm" in p
                or p.endswith("ln_final/scale") or p.endswith("ln_final/bias")
            ):
                # lock keeps LayerNorm trainable unless --lock-text-freeze-
                # layer-norm is passed (reference hf_model.py:171-186)
                return True
            if lock_text_unlocked_layers == 0:
                return False
            total_groups = nt + 1
            g = _text_group_of(p[len("text/"):], nt)
            if g < 0:
                return False
            return g >= total_groups - lock_text_unlocked_layers
        return True

    return jax.tree_util.tree_map_with_path(rule, params)


def make_optimizer(
    schedule: Callable,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    weight_decay: float = 0.2,
    grad_clip_norm: Optional[float] = None,
    params=None,
    train_mask=None,
    opt: str = "adamw",
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    """--opt selection (reference params.py --opt/--momentum; the reference
    additionally dispatches to arbitrary timm optimizers — here: adamw
    (default), adam, sgd(+momentum), lion, adafactor)."""
    name = (opt or "adamw").lower().replace("timm/", "")
    wd_mask = decay_mask(params) if params is not None else None
    if name == "adamw":
        tx = optax.adamw(
            learning_rate=schedule, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=wd_mask,
        )
    elif name == "adam":
        tx = optax.adam(learning_rate=schedule, b1=beta1, b2=beta2, eps=eps)
    elif name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.sgd(learning_rate=schedule, momentum=momentum),
        )
    elif name == "lion":
        tx = optax.lion(learning_rate=schedule, b1=beta1, b2=beta2,
                        weight_decay=weight_decay, mask=wd_mask)
    elif name == "adafactor":
        tx = optax.adafactor(learning_rate=schedule)
    else:
        raise ValueError(f"unknown optimizer {opt!r}")
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(tx)
    if train_mask is not None:
        frozen_label = jax.tree.map(
            lambda t: "trainable" if t else "frozen", train_mask
        )
        tx_all = optax.chain(*chain)
        return optax.multi_transform(
            {"trainable": tx_all, "frozen": optax.set_to_zero()}, frozen_label
        )
    return optax.chain(*chain)


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    extra_vars: Any  # non-param collections (e.g. BatchNorm batch_stats)

    def replace(self, **kw):
        return dc_replace(self, **kw)


def create_train_state(params, tx, extra_vars=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        extra_vars=extra_vars or {},
    )


def apply_gradients(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # logit_scale.clamp_(0, ln 100) — reference train_other.py:223-224
    if "logit_scale" in new_params:
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.clip(
            new_params["logit_scale"], 0.0, MAX_LOGIT_SCALE
        )
    return state.replace(
        step=state.step + 1, params=new_params, opt_state=new_opt
    )

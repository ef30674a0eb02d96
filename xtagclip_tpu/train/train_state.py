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
import re
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


# ---------------------------------------------------------------------------
# generalized block discovery for timm-family trunks (reference
# timm_model.py:87-118 uses timm's group_matcher; here the same scheme is
# derived from the param tree itself): block-module names sort into depth
# order, stage downsamples/merges/pos-embeds group with their stage's first
# block, final norms join the last block, head/proj is the final group.
# ---------------------------------------------------------------------------

_BLOCK_NAME = re.compile(
    r"(?:resblocks|blocks)_(\d+)$"          # ViT / EVA / ViTamin transformer
    r"|stage(\d+)_block(\d+)$"              # swin / fastvit / convnext
    r"|stage(\d+)_(\d+)$"                   # vitamin MBConv stages
)
_BLOCK_PRELUDE = re.compile(
    r"(?:downsample|merge)(\d+)(?:_.*)?$"   # fastvit/convnext/swin downsample
    r"|stage(\d+)_(?:downsample|pos_emb).*$"
)
_TRUNK_FINAL = ("norm", "ln_post", "final_conv")
_HEAD_NAMES = ("head_proj", "head_mlp_fc1", "head_mlp_fc2", "head_norm",
               "fc_norm", "proj")


def _block_sort_key(name: str):
    """Depth-sortable key for a block-ish trunk child, or None."""
    m = _BLOCK_NAME.fullmatch(name)
    if m:
        if m.group(1) is not None:          # (res)blocks_{i}: after conv stages
            return (100, int(m.group(1)), 1)
        if m.group(2) is not None:          # stage{s}_block{b}
            return (int(m.group(2)), int(m.group(3)), 1)
        return (int(m.group(4)), int(m.group(5)), 1)  # vitamin stage{s}_{b}
    m = _BLOCK_PRELUDE.fullmatch(name)
    if m:
        s = int(next(g for g in m.groups() if g is not None))
        return (s, -1, 0)                   # groups with the stage's 1st block
    return None


def _trunk_groups(trunk_params: dict):
    """name -> group ordinal for a trunk param tree; returns (map, B)."""
    keyed = [(k, _block_sort_key(k)) for k in trunk_params]
    blocks = sorted((key, name) for name, key in keyed if key is not None)
    # preludes (key[2] == 0) share the ordinal of the next real block
    mapping, ordinal = {}, -1
    for key, name in blocks:
        if key[2] == 1:
            ordinal += 1
            mapping[name] = ordinal
        else:
            mapping[name] = ordinal + 1
    nb = ordinal + 1
    for name in mapping:  # clamp trailing preludes
        mapping[name] = min(mapping[name], max(nb - 1, 0))
    return mapping, nb


def _timm_visual_group_of(path_str: str, visual_params: dict,
                          groups: Optional[tuple] = None) -> tuple:
    """(group, total_groups) for a TimmModel-style visual tower path.

    `groups` (a precomputed `_trunk_groups` result) avoids re-deriving the
    trunk mapping per leaf — trainable_mask calls this for every param."""
    mapping, nb = groups if groups is not None else _trunk_groups(
        visual_params.get("trunk", {}))
    total = nb + 2
    parts = path_str.split("/")
    if parts[0] == "trunk" and len(parts) > 1:
        child = parts[1]
        if child in mapping:
            g = mapping[child]
            # last block and the final norm form one group, like ln_post
            return (min(g, nb - 1) + 1 if g < nb - 1 else nb, total)
        if child in _TRUNK_FINAL:
            return (nb, total)
        return (0, total)  # patch_embed / cls_token / pos_embed / stem
    if parts[0] in _HEAD_NAMES:
        return (nb + 1, total)
    return (0, total)


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

    visual_params = params.get("visual", {})
    timm_style = nv == 0 and "trunk" in visual_params
    timm_groups = (_trunk_groups(visual_params.get("trunk", {}))
                   if timm_style else None)

    def rule(path, leaf):
        p = _path_str(path)
        if lock_image and p.startswith("visual/"):
            if lock_image_unlocked_groups == 0:
                return False
            rest = p[len("visual/"):]
            if timm_style:
                # timm-family tower (trunk + head): groups derived from the
                # param tree (reference timm_model.py:87-118 group matcher)
                g, total_groups = _timm_visual_group_of(
                    rest, visual_params, groups=timm_groups)
            else:
                total_groups = nv + 2
                g = _vit_group_of(rest, nv)
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
    momentum: Optional[float] = None,
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
        # --momentum default is None at the flag level; the reference's timm
        # dispatch gives SGD momentum 0.9 when unspecified — match that.
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=wd_mask),
            optax.sgd(learning_rate=schedule,
                      momentum=0.9 if momentum is None else momentum),
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

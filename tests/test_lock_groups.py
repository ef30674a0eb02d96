"""--lock-image-unlocked-groups on timm-family towers (round-2 VERDICT item 7).

The reference locks timm towers through timm's group_matcher
(timm_model.py:87-118): group 0 = stem, one group per block (stage
downsamples join their stage's first block), final norm joins the last
block, projection head last. Round 2's CLIP-only matcher silently collapsed
every timm param into group 0; these tests pin the generalized scheme on
real ConvNeXt / FastViT / Swin / EVA towers built by the factory.
"""

import jax
import numpy as np
import pytest

from xtagclip_tpu.train.train_state import trainable_mask


def _mask_paths(params, **kw):
    mask = trainable_mask(params, lock_image=True, **kw)
    out = {}
    for p, v in jax.tree_util.tree_leaves_with_path(mask):
        out[jax.tree_util.keystr(p)] = bool(v)
    return out


def _build(model_name, **kw):
    from xtagclip_tpu.factory import create_model

    return create_model(model_name, **kw).params


@pytest.fixture(scope="module")
def convnext_params():
    return _build("convnext_base")


def test_lock_all_groups_freezes_whole_tower(convnext_params):
    m = _mask_paths(convnext_params, lock_image_unlocked_groups=0)
    assert not any(v for k, v in m.items() if "visual" in k)
    assert all(v for k, v in m.items() if "text" in k)


def test_unlock_one_group_is_head_only(convnext_params):
    m = _mask_paths(convnext_params, lock_image_unlocked_groups=1)
    trainable = {k for k, v in m.items() if "visual" in k and v}
    frozen = {k for k, v in m.items() if "visual" in k and not v}
    assert trainable, "one unlocked group must unlock the head"
    assert all("head" in k for k in trainable), trainable
    assert any("trunk" in k for k in frozen)
    # the silent round-2 failure mode: nothing in the trunk may unlock
    assert not any("trunk" in k for k in trainable)


def test_unlock_two_groups_adds_last_block_only(convnext_params):
    m = _mask_paths(convnext_params, lock_image_unlocked_groups=2)
    trainable = {k for k, v in m.items() if "visual" in k and v}
    # ConvNeXt-B: stages (3,3,27,3) -> last block is stage3_block2; the final
    # norm is head_norm (group 1), already unlocked
    assert any("stage3_block2" in k for k in trainable)
    assert not any("stage3_block1" in k for k in trainable)
    assert not any("stage0_" in k for k in trainable)
    assert not any("stem" in k for k in trainable)


def test_unlock_everything(convnext_params):
    # groups = blocks + stem + head; unlocked >= total unlocks all
    nb = len({k.split("']")[0] for k in _mask_paths(
        convnext_params, lock_image_unlocked_groups=0)})
    m = _mask_paths(convnext_params, lock_image_unlocked_groups=99)
    assert all(v for k, v in m.items() if "visual" in k)


@pytest.mark.parametrize("model_name,last_block,stem_marker", [
    ("MobileCLIP-S1", "stage3_block3", "stem0"),           # fastvit_mci1
    ("swin_base_patch4_window7_224", "stage3_block1", "patch_embed"),
    ("EVA02-B-16", "blocks_11", "patch_embed"),
])
def test_family_group_boundaries(model_name, last_block, stem_marker):
    params = _build(model_name, skip_init=False)
    m1 = _mask_paths(params, lock_image_unlocked_groups=1)
    t1 = {k for k, v in m1.items() if "visual" in k and v}
    assert not any("trunk" in k for k in t1), (model_name, sorted(t1)[:5])
    m2 = _mask_paths(params, lock_image_unlocked_groups=2)
    t2 = {k for k, v in m2.items() if "visual" in k and v}
    assert any(last_block in k for k in t2), (model_name, sorted(t2)[:8])
    assert not any(stem_marker in k for k in t2)

"""Export round-trip: flax -> open_clip torch layout -> flax must be identity,
and the exported dict must load into the reference PyTorch model. Also
checkpoint save/resume round-trip through orbax."""

import json
import os
import sys
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from xtagclip_tpu.convert.export import save_open_clip_checkpoint, to_openclip_state_dict
from xtagclip_tpu.convert.openclip import convert_openclip_state_dict
from xtagclip_tpu.factory import add_model_config, create_model

pytestmark = pytest.mark.parity

CFG = dict(
    embed_dim=512,
    vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=8,
                    image_size=32),
    text_cfg=dict(context_length=16, vocab_size=300, width=512, heads=4,
                  layers=2),
)


@pytest.fixture(scope="module")
def bundle():
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinyexp-",
                                     delete=False) as f:
        json.dump(CFG, f)
        p = f.name
    add_model_config(p)
    return create_model(os.path.basename(p)[:-5], use_fusion=True)


def test_export_import_roundtrip(bundle):
    sd = to_openclip_state_dict(bundle.params)
    back = convert_openclip_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(bundle.params)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for p, a in flat_a:
        k = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(a), np.asarray(flat_b[k]),
                                   err_msg=k, rtol=1e-6)


def test_exported_checkpoint_loads_in_reference(bundle, tmp_path):
    from ref_compat import import_ref_open_clip

    oc = import_ref_open_clip()
    import torch

    path = str(tmp_path / "export.pt")
    save_open_clip_checkpoint(bundle, path, epoch=3)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 3
    cwd = os.getcwd()
    os.chdir("/root/reference/src/open_clip")
    try:
        ref = oc.CustomTextCLIP(
            embed_dim=512, vision_cfg=CFG["vision_cfg"],
            text_cfg=CFG["text_cfg"], use_fusion=True,
        )
    finally:
        os.chdir(cwd)
    missing, unexpected = ref.load_state_dict(ckpt["state_dict"], strict=False)
    # everything we export must land; reference-only buffers may be missing
    assert not unexpected, unexpected[:5]


def test_orbax_resume_roundtrip(bundle, tmp_path):
    from xtagclip_tpu.train.checkpoint import (
        CheckpointManager,
        find_latest_checkpoint,
        restore_train_state,
    )
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

    tx = make_optimizer(cosine_lr(1e-4, 1, 10), params=bundle.params)
    state = create_train_state(bundle.params, tx)
    state = state.replace(step=jnp.int32(7))
    mgr = CheckpointManager(str(tmp_path / "ck"), save_frequency=1)
    mgr.save_epoch(2, {"state": jax.device_get(state), "epoch": 2})
    tag = find_latest_checkpoint(str(tmp_path / "ck"))
    assert tag == "epoch_latest"
    restored = restore_train_state(
        str(tmp_path / "ck"), tag,
        {"state": create_train_state(bundle.params, tx), "epoch": 0},
    )
    assert int(restored["epoch"]) == 2
    assert int(restored["state"].step) == 7
    a = jax.tree_util.tree_leaves(restored["state"].params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_checkpoint_clone_hardlinks(bundle, tmp_path):
    """Same-state tags are hardlink clones (single serialization per epoch),
    distinct states are real saves, and clones restore identically even after
    their source tag is deleted."""
    from xtagclip_tpu.train.checkpoint import (
        CheckpointManager,
        restore_train_state,
    )
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

    tx = make_optimizer(cosine_lr(1e-4, 1, 10), params=bundle.params)
    state = jax.device_get(create_train_state(bundle.params, tx))
    ck = tmp_path / "ck"
    mgr = CheckpointManager(str(ck), save_frequency=1, save_best=True)

    def tree_e(epoch, st):
        return {"state": st, "epoch": epoch, "step": epoch * 10}

    t1 = tree_e(1, state)
    mgr.save_epoch(1, t1)
    mgr.save_if_best({"train_top1": 0.5}, t1)

    def inode_sig(tag):
        sig = {}
        for root, _, files in os.walk(ck / tag):
            for f in files:
                rel = os.path.relpath(os.path.join(root, f), ck / tag)
                sig[rel] = os.stat(os.path.join(root, f)).st_ino
        return sig

    # epoch_latest and best_train_top1 share every data inode with epoch_1
    base = inode_sig("epoch_1")
    assert base and inode_sig("epoch_latest") == base
    assert inode_sig("best_train_top1") == base

    # a NEW state at the next epoch must be a real save, not a clone
    state2 = jax.tree_util.tree_map(lambda x: x, state)
    t2 = tree_e(2, state2)
    mgr.save_epoch(2, t2)
    assert inode_sig("epoch_2") != base
    assert inode_sig("epoch_latest") == inode_sig("epoch_2")

    # deleting the clone source must not corrupt the clone
    import shutil as _sh
    _sh.rmtree(ck / "epoch_1")
    restored = restore_train_state(
        str(ck), "best_train_top1",
        {"state": create_train_state(bundle.params, tx), "epoch": 0, "step": 0},
    )
    assert int(restored["epoch"]) == 1
    for x, y in zip(jax.tree_util.tree_leaves(restored["state"].params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_delete_previous_checkpoint_prunes(bundle, tmp_path):
    """--delete-previous-checkpoint removes epoch N-1 on saving epoch N
    (reference main_other.py:597-600). Regression: the prune branch indexed
    the (marker, path) pair out of range and raised IndexError."""
    from xtagclip_tpu.train.checkpoint import CheckpointManager
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

    tx = make_optimizer(cosine_lr(1e-4, 1, 10), params=bundle.params)
    state = jax.device_get(create_train_state(bundle.params, tx))
    ck = tmp_path / "ck"
    mgr = CheckpointManager(str(ck), save_frequency=1, delete_previous=True)
    for epoch in (1, 2, 3):
        mgr.save_epoch(epoch, {"state": state, "epoch": epoch,
                               "step": epoch * 10})
    assert not (ck / "epoch_1").exists()
    assert not (ck / "epoch_2").exists()
    assert (ck / "epoch_3").is_dir()
    assert (ck / "epoch_latest").is_dir()


def test_export_roundtrip_dense_text_projection(tmp_path):
    """proj_bias=True text towers (the SigLIP text configs) export their
    Dense-form projection (regression: text/text_projection/{kernel,bias}
    matched no branch and was silently dropped, leaving the reloaded
    projection at random init)."""
    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(layers=1, width=64, head_width=32, patch_size=8,
                        image_size=16),
        text_cfg=dict(context_length=12, vocab_size=100, width=64, heads=2,
                      layers=1, proj_bias=True),
    )
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinydpj-",
                                     delete=False) as f:
        json.dump(cfg, f)
        p = f.name
    add_model_config(p)
    bundle = create_model(os.path.basename(p)[:-5])
    sd = to_openclip_state_dict(bundle.params)
    assert "text.text_projection.weight" in sd
    assert "text.text_projection.bias" in sd

    back = convert_openclip_state_dict(sd)
    np.testing.assert_allclose(
        np.asarray(back["text"]["text_projection"]["kernel"]),
        np.asarray(bundle.params["text"]["text_projection"]["kernel"]),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(back["text"]["text_projection"]["bias"]),
        np.asarray(bundle.params["text"]["text_projection"]["bias"]),
        rtol=1e-6)

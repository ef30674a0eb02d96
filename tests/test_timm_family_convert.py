"""Trunk-family weight converters: EVA / Swin / ViTamin / FastViT(MobileCLIP).

No timm and no real checkpoints exist in this environment, so the converters
are pinned two ways (VERDICT round-2 item 2):
 1. export -> convert roundtrips: our exporters emit the documented timm
    layout; converting it back must cover the init tree exactly — param-path
    and shape equality (EVA/Swin/ViTamin: value equality; FastViT: the
    convert path re-expresses fused convs as identity-BN ConvBN, so
    equality is asserted on the eval-mode FORWARD instead).
 2. strictness: unknown keys raise UnmappedKeysError naming them; train-form
    FastViT checkpoints are rejected with reparameterization instructions.
Reference loads these through timm itself (timm_model.py:29-172).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.convert.timm_families import (
    UnmappedKeysError,
    convert_eva_sd,
    convert_fastvit_sd,
    convert_swin_sd,
    convert_timm_trunk,
    convert_vitamin_sd,
    detect_trunk_family,
    export_eva_sd,
    export_fastvit_sd,
    export_swin_sd,
    export_vitamin_sd,
)


def tree_paths(tree):
    return {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def assert_tree_equal(a, b):
    pa, pb = tree_paths(a), tree_paths(b)
    assert pa == pb, (
        f"path/shape mismatch: only_in_a={sorted(set(pa) - set(pb))[:6]} "
        f"only_in_b={sorted(set(pb) - set(pa))[:6]}"
    )
    flat_a = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(a))
    for p, v in jax.tree_util.tree_leaves_with_path(b):
        np.testing.assert_allclose(
            np.asarray(flat_a[jax.tree_util.keystr(p)]), np.asarray(v),
            atol=1e-6, err_msg=jax.tree_util.keystr(p))


def randomize(params, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree.map(
        lambda x: jnp.asarray(
            rng.standard_normal(x.shape).astype(np.float32) * 0.05), params)


# ---------------------------------------------------------------------------
# EVA
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fused", [True, False], ids=["eva01", "eva02"])
def test_eva_roundtrip(fused):
    from xtagclip_tpu.models.eva import EvaTrunk

    trunk = EvaTrunk(patch_size=8, width=64, layers=2, heads=4,
                     mlp_hidden=86 if not fused else 128,
                     swiglu=not fused, scale_mlp=not fused,
                     qkv_fused=fused, use_rope=not fused)
    params = trunk.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    params = randomize(params)
    sd = export_eva_sd(params, qkv_fused=fused)
    if fused:
        assert "blocks.0.attn.q_bias" in sd and "blocks.0.attn.qkv.weight" in sd
    else:
        assert "blocks.0.attn.k_proj.weight" in sd
        assert "blocks.0.attn.k_proj.bias" not in sd  # EVA-02: k has no bias
        assert "blocks.0.mlp.norm.weight" in sd  # sub-LN
    assert detect_trunk_family(sd.keys()) == "eva"
    back = convert_eva_sd(sd)
    if fused:
        # k-bias is synthesized zeros on conversion; zero it in the source
        # for the comparison (timm stores no k bias at all)
        d = 64
        for blk in params:
            if blk.startswith("blocks_"):
                b = np.asarray(params[blk]["attn"]["qkv"]["bias"]).copy()
                b[d:2 * d] = 0
                params[blk]["attn"]["qkv"]["bias"] = b
    assert_tree_equal(params, back)


# ---------------------------------------------------------------------------
# Swin
# ---------------------------------------------------------------------------

def test_swin_roundtrip_and_forward():
    from xtagclip_tpu.models.swin import SwinTrunk

    trunk = SwinTrunk(patch_size=4, embed_dim=16, depths=(1, 2),
                      heads=(2, 4), window=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 32, 32, 3)).astype(np.float32))
    params = randomize(trunk.init(jax.random.PRNGKey(0), x)["params"])
    sd = export_swin_sd(params)
    assert "layers.0.downsample.reduction.weight" in sd
    assert "layers.0.blocks.0.attn.relative_position_bias_table" in sd
    assert detect_trunk_family(sd.keys()) == "swin"
    back = convert_swin_sd(sd)
    assert_tree_equal(params, back)
    # the merge-order permutation must leave the forward invariant
    out_a = trunk.apply({"params": params}, x)
    out_b = trunk.apply({"params": jax.tree.map(jnp.asarray, back)}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# ViTamin
# ---------------------------------------------------------------------------

def test_vitamin_roundtrip():
    from xtagclip_tpu.models.vitamin import ViTaminTrunk

    trunk = ViTaminTrunk(conv_channels=(8, 16), conv_depths=(1, 2),
                         width=32, depth=2, heads=2)
    params = randomize(trunk.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)))["params"])
    sd = export_vitamin_sd(params)
    assert "patch_embed.backbone.stem.conv1.weight" in sd
    assert "patch_embed.backbone.stages.1.blocks.1.conv2_kxk.weight" in sd
    assert "blocks.0.mlp.fc1_g.weight" in sd
    assert detect_trunk_family(sd.keys()) == "vitamin"
    back = convert_vitamin_sd(sd)
    assert_tree_equal(params, back)


def test_vitamin_accepts_w012_alias():
    from xtagclip_tpu.models.vitamin import ViTaminTrunk

    trunk = ViTaminTrunk(conv_channels=(8, 16), conv_depths=(1, 1),
                         width=32, depth=1, heads=2)
    params = randomize(trunk.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 32, 32, 3)))["params"])
    sd = export_vitamin_sd(params)
    aliased = {}
    for k, v in sd.items():
        k = (k.replace("mlp.fc1_g", "mlp.w0").replace("mlp.fc1_x", "mlp.w1")
             .replace("mlp.fc2", "mlp.w2"))
        aliased[k] = v
    back = convert_vitamin_sd(aliased)
    assert_tree_equal(params, back)


# ---------------------------------------------------------------------------
# FastViT (reparameterized)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_fastvit():
    from xtagclip_tpu.models.fastvit import FastVitTrunk

    trunk = FastVitTrunk(dims=(8, 16), depths=(1, 2))
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 64, 64, 3)).astype(np.float32))
    variables = trunk.init(jax.random.PRNGKey(0), x)
    params = randomize(variables["params"])
    # perturb running stats so the BN fusion math is non-trivial
    rng = np.random.default_rng(3)
    stats = jax.tree.map(
        lambda v: jnp.asarray(
            np.abs(rng.standard_normal(v.shape)).astype(np.float32) + 0.5),
        variables["batch_stats"])
    return trunk, params, stats, x


def test_fastvit_roundtrip_forward(tiny_fastvit):
    trunk, params, stats, x = tiny_fastvit
    ref_out = trunk.apply({"params": params, "batch_stats": stats}, x,
                          deterministic=True)
    sd = export_fastvit_sd(params, stats)
    assert "stem.0.reparam_conv.weight" in sd
    assert "stages.1.pos_emb.reparam_conv.weight" in sd
    assert "stages.1.blocks.0.norm.running_mean" in sd
    assert detect_trunk_family(sd.keys()) == "fastvit"
    back = convert_fastvit_sd(sd)
    bn = back.pop("__batch_stats__")
    # converted tree must cover the init param tree exactly
    assert set(tree_paths(back)) == set(tree_paths(params))

    def overlay(init, upd):
        if isinstance(init, dict):
            return {k: overlay(v, upd.get(k))
                    if isinstance(upd, dict) and k in upd else v
                    for k, v in init.items()}
        return jnp.asarray(upd)

    # flax init stats are mean 0 / var 1 — exactly what the identity-BN
    # construction requires for the fused convs; real stats overlay on top
    fresh = trunk.init(jax.random.PRNGKey(0), x)["batch_stats"]
    merged = overlay(fresh, bn)
    out = trunk.apply(
        {"params": jax.tree.map(jnp.asarray, back), "batch_stats": merged},
        x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-4)


def test_fastvit_train_form_rejected(tiny_fastvit):
    with pytest.raises(UnmappedKeysError, match="reparameterize"):
        detect_trunk_family(["stem.0.rbr_conv.0.conv.weight"])


# ---------------------------------------------------------------------------
# dispatcher + strictness
# ---------------------------------------------------------------------------

def test_dispatcher_routes_by_signature(tiny_fastvit):
    trunk, params, stats, _ = tiny_fastvit
    sd = {f"visual.trunk.{k}": v
          for k, v in export_fastvit_sd(params, stats).items()}
    tree = convert_timm_trunk(sd)
    assert "__batch_stats__" in tree


def test_unknown_keys_raise():
    from xtagclip_tpu.models.eva import EvaTrunk

    trunk = EvaTrunk(patch_size=8, width=32, layers=1, heads=2, mlp_hidden=64)
    params = trunk.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]
    sd = export_eva_sd(params, qkv_fused=True)
    sd["blocks.0.gamma_1"] = np.ones(32, np.float32)  # layer-scale: unsupported
    with pytest.raises(UnmappedKeysError, match="gamma_1"):
        convert_eva_sd(sd)


def test_unrecognized_family_raises():
    with pytest.raises(UnmappedKeysError, match="unrecognized"):
        detect_trunk_family(["stages.0.blocks.0.conv_dw.weight"])

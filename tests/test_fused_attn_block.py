"""Fused attention half-block (ops/fused_attn_block.py): kernel parity vs
the composed-op chain (interpret mode — runs on any backend), gradients
through the custom_vjp, the shape/VMEM gate, and the ResidualAttentionBlock
wiring (param-tree compatibility with the unfused path).

The kernel computes y = x + out_proj(MHA(LN(x))) — the attention half of
the pre-norm block (reference transformer.py:213-269) — in one Pallas
kernel. Measured on-chip it is bit-identical to the composed XLA path and
+43% end-to-end on ViT-L GAP (PERF.md round 3, "the whole-block kernel").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flax.core import unfreeze

from xtagclip_tpu.models.layers import ResidualAttentionBlock
from xtagclip_tpu.ops import fused_attn_block as fab


def _interpret():
    import jax.experimental.pallas.tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def _inputs(b=2, l=32, d=128, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda s, dt=jnp.bfloat16: jnp.asarray(rng.standard_normal(s), dt)
    return (f((b, l, d)),
            f(d, jnp.float32), f(d, jnp.float32),
            f((d, 3 * d)) * 0.2, f(3 * d, jnp.float32),
            f((d, d)) * 0.2, f(d, jnp.float32))


def test_kernel_matches_composed_chain():
    x, g, b_, wqkv, bqkv, wout, bout = _inputs()
    ref = fab._reference_chain(x, g, b_, wqkv, bqkv, wout, bout, 2, 1e-5)
    with _interpret():
        out = fab.fused_attn_half(x, g, b_, wqkv, bqkv, wout, bout, None,
                                  2, 1e-5)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_gradients_match_composed_chain():
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=1, l=16, d=128, seed=1)

    args = (x, g, b_, wqkv, bqkv, wout, bout)
    g_ref = jax.grad(
        lambda *a: (fab._reference_chain(*a, 2, 1e-5).astype(jnp.float32)
                    ** 2).sum(), argnums=tuple(range(7)))(*args)
    with _interpret():
        g_out = jax.grad(
            lambda *a: (fab.fused_attn_half(*a, None, 2, 1e-5).astype(
                jnp.float32) ** 2).sum(), argnums=tuple(range(7)))(*args)
    for a, r in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   atol=1e-4, rtol=1e-4)


def test_shape_gate():
    # verified-on-chip families (PERF.md): B/32, B/16, L/14 (+GAP, +336)
    assert fab.supported((256, 50, 768), 12)
    assert fab.supported((256, 197, 768), 12)
    assert fab.supported((128, 256, 1024), 16)
    assert fab.supported((128, 257, 1024), 16)
    assert fab.supported((64, 577, 1024), 16)
    # ViT-H (dh=80): cls towers only — the lane-aligned GAP lengths crash
    # the Mosaic compiler (deterministic, PERF.md)
    assert fab.supported((64, 257, 1280), 16)
    assert fab.supported((32, 577, 1280), 16)
    assert not fab.supported((64, 256, 1280), 16)
    assert not fab.supported((32, 576, 1280), 16)
    # ViT-g / ViT-bigG head dims 88/104: taken via lane-padded heads —
    # all four production shapes measured full-tower winners (round 5)
    assert fab.supported((32, 257, 1408), 16)
    assert fab.supported((16, 257, 1664), 16)
    # fp32 streams stay on the XLA path
    assert not fab.supported((128, 256, 1024), 16, jnp.float32)
    # working-set budget: the >=448px giants are untested and rejected
    assert not fab.supported((16, 1025, 1024), 16)


def test_block_wiring_param_compat(monkeypatch):
    """The fused branch declares the exact same param tree as the unfused
    block (ln_1/attn names and shapes), and its output matches."""
    b, l, d, h = 1, 32, 128, 2
    x = jnp.asarray(np.random.default_rng(2).standard_normal((b, l, d)),
                    jnp.bfloat16)
    block = ResidualAttentionBlock(num_heads=h, dtype=jnp.bfloat16)

    monkeypatch.delenv("XTAG_FUSED_BLOCK", raising=False)
    v_ref = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(v_ref, x)

    monkeypatch.setenv("XTAG_FUSED_BLOCK", "1")
    monkeypatch.setattr(fab, "supported", lambda *a, **k: True)
    with _interpret():
        v_fused = block.init(jax.random.PRNGKey(0), x)
        ref_tree = jax.tree.map(lambda a: a.shape, unfreeze(v_ref))
        fused_tree = jax.tree.map(lambda a: a.shape, unfreeze(v_fused))
        assert ref_tree == fused_tree
        out = block.apply(v_ref, x)   # unfused params drive the fused path
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def _mlp_inputs(b=2, l=32, d=128, h=512, seed=3):
    rng = np.random.default_rng(seed)
    f = lambda s, dt=jnp.bfloat16: jnp.asarray(rng.standard_normal(s), dt)
    return (f((b, l, d)), f(d, jnp.float32), f(d, jnp.float32),
            f((d, h)) * 0.1, f(h, jnp.float32),
            f((h, d)) * 0.1, f(d, jnp.float32))


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_mlp_half_matches_composed_chain(act):
    args = _mlp_inputs()
    ref = fab._reference_mlp_chain(*args, act, 1e-5)
    with _interpret():
        out = fab.fused_mlp_half(*args, act, 1e-5)
    # quick_gelu is op-for-op identical; exact gelu uses the rational erf
    # (max abs err 1.5e-7 pre-rounding — can flip a single bf16 rounding,
    # observed 1/8192 elements off by one ULP)
    tol = 0.0 if act == "quick_gelu" else 1e-3
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_mlp_half_pads_ragged_rows():
    # 2*50 = 100 rows: not a multiple of the 256-row tile
    args = _mlp_inputs(b=2, l=50)
    ref = fab._reference_mlp_chain(*args, "quick_gelu", 1e-5)
    with _interpret():
        out = fab.fused_mlp_half(*args, "quick_gelu", 1e-5)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_mlp_half_gradients_match():
    args = _mlp_inputs(b=1, l=16, seed=4)

    def loss(fn, *a):
        y = fn(*a, "quick_gelu", 1e-5).astype(jnp.float32)
        return (y * y).sum()

    g_ref = jax.grad(lambda *a: loss(fab._reference_mlp_chain, *a),
                     argnums=tuple(range(7)))(*args)
    with _interpret():
        g_out = jax.grad(lambda *a: loss(fab.fused_mlp_half, *a),
                         argnums=tuple(range(7)))(*args)
    for a, r in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   atol=1e-4, rtol=1e-4)


def test_mlp_gate():
    # verified widths: ViT-B (768/3072) and ViT-L (1024/4096)
    assert fab.supported_mlp((256, 50, 768), 3072, "quick_gelu")
    assert fab.supported_mlp((128, 257, 1024), 4096, "gelu")
    # ViT-H width: resident c_fc/c_proj exceed the ~32 MB VMEM ceiling
    # (crashes the compiler, probed on-chip)
    assert not fab.supported_mlp((64, 257, 1280), 5120, "gelu")
    # unknown activations and fp32 streams stay on the XLA path
    assert not fab.supported_mlp((256, 50, 768), 3072, "relu")
    assert not fab.supported_mlp((256, 50, 768), 3072, "quick_gelu",
                                 jnp.float32)


def test_causal_mask_matches_composed_chain():
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=2, l=24, d=128, seed=5)
    causal = jnp.triu(jnp.full((24, 24), -jnp.inf, jnp.float32), k=1)
    ref = fab._reference_chain(x, g, b_, wqkv, bqkv, wout, bout, 2, 1e-5,
                               mask=causal)
    with _interpret():
        out = fab.fused_attn_half(x, g, b_, wqkv, bqkv, wout, bout, causal,
                                  2, 1e-5)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_mask_gate():
    assert fab.supported((64, 77, 512), 8, mask_shape=(77, 77))
    assert not fab.supported((64, 77, 512), 8, mask_shape=(77, 64))


def test_alignment_pad_policy():
    # ViT-H/14 @224 GAP: 256 tokens, dh=80 -> pad 1 into the verified set
    assert fab.alignment_pad(256, 1280, 16) == 1
    # ViT-H @336 GAP
    assert fab.alignment_pad(576, 1280, 16) == 1
    # cls towers already verified — no pad
    assert fab.alignment_pad(257, 1280, 16) == 0
    # dh != 80 never pads (those lengths compile directly)
    assert fab.alignment_pad(256, 1024, 16) == 0
    assert fab.alignment_pad(50, 768, 12) == 0


def test_alignment_mask_hides_pad_keys():
    m = np.asarray(fab.alignment_mask(4, 2))
    assert m.shape == (6, 6)
    assert np.all(m[:, :4] == 0.0)
    assert np.all(np.isneginf(m[:, 4:]))


def test_alignment_pad_kernel_exactness():
    """Padded+masked kernel == unpadded chain for the real tokens."""
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=2, l=16, d=128, seed=7)
    ref = fab._reference_chain(x, g, b_, wqkv, bqkv, wout, bout, 2, 1e-5)
    pad_tok = jnp.mean(x, axis=1, keepdims=True)
    xp = jnp.concatenate([x, pad_tok], axis=1)
    mask = fab.alignment_mask(16, 1)
    with _interpret():
        out = fab.fused_attn_half(xp, g, b_, wqkv, bqkv, wout, bout, mask,
                                  2, 1e-5)[:, :16]
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_vit_alignment_pad_plumbing(monkeypatch):
    """The VisionTransformer pad/mask/slice plumbing reproduces the no-pad
    output exactly (exercised through the XLA fallback so it runs fast on
    CPU; the kernel-side exactness is the test above)."""
    from xtagclip_tpu.factory import create_model

    lb = create_model(
        "ViT-B-32", precision="bf16", skip_init=True,
        vision_cfg={"width": 128, "layers": 2, "heads": 2, "patch_size": 16,
                    "image_size": 64, "no_class_token": True,
                    "pool_type": "avg", "final_ln_after_pool": True},
        text_cfg={"width": 64, "layers": 2, "heads": 2, "vocab_size": 512})
    v = lb.module.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                       jnp.zeros((1, 77), jnp.int32), deterministic=True)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((2, 64, 64, 3)),
                    jnp.bfloat16)

    def enc(p, x):
        f, _ = lb.module.apply({"params": p}, x, True,
                               method=lb.module.encode_image)
        return np.asarray(f, np.float32)

    a = enc(v["params"], x)
    monkeypatch.setattr(fab, "enabled", lambda *A, **K: True)
    monkeypatch.setattr(fab, "alignment_pad",
                        lambda l, d, h: 1 if l % 16 == 0 else 0)
    monkeypatch.setattr(fab, "supported", lambda *A, **K: False)
    b = enc(v["params"], x)
    np.testing.assert_array_equal(a, b)


def test_shard_map_composition():
    """The multi-device recipe: a pallas_call is not auto-shardable under
    GSPMD (hence enabled() requires device_count == 1), but under
    `jax.shard_map` over the data axis the kernel runs per-shard and
    matches the unsharded chain exactly — batch-parallel multi-chip eval
    can opt in this way (XTAG_FUSED_BLOCK=1 inside the shard_map region)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=len(devs), l=16, d=128,
                                               seed=6)
    mesh = Mesh(np.array(devs), ("data",))
    fn = jax.shard_map(
        lambda x, g, b, wq, bq, wo, bo: fab.fused_attn_half(
            x, g, b, wq, bq, wo, bo, None, 2, 1e-5),
        mesh=mesh,
        in_specs=(P("data"), P(), P(), P(), P(), P(), P()),
        out_specs=P("data"), check_vma=False)
    ref = fab._reference_chain(x, g, b_, wqkv, bqkv, wout, bout, 2, 1e-5)
    with _interpret():
        out = jax.jit(fn)(x, g, b_, wqkv, bqkv, wout, bout)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_mesh_auto_shard_map(monkeypatch):
    """With a data-only mesh registered via mesh_context, the block's
    fused path auto-wraps the kernels in jax.shard_map: forward matches
    the direct kernel exactly, and the train path (Pallas backward under
    the shard_map transpose) produces psum'ed weight grads that match the
    unfused XLA path."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = Mesh(np.array(devs), ("data",))
    b, l, d, h = len(devs), 16, 128, 2
    x = jnp.asarray(np.random.default_rng(30).standard_normal((b, l, d)),
                    jnp.bfloat16)
    block = ResidualAttentionBlock(num_heads=h, dtype=jnp.bfloat16)
    monkeypatch.setenv("XTAG_FUSED_BLOCK", "1")
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
    monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "1")
    # PLAIN interpret mode (XTAG_PALLAS_INTERPRET, kernels inlined as
    # traced ops) rather than the TPU-semantics simulator: the simulator
    # runs each grid step in an io_callback that itself allocates jax
    # arrays, and 8 shards x 2 kernels of concurrent callbacks starve this
    # 1-core host's XLA threadpool into deadlock under shard_map. Real-TPU
    # execution has no callbacks — purely a test-environment constraint.
    monkeypatch.setenv("XTAG_PALLAS_INTERPRET", "1")
    v = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(v, x)                         # direct kernel
    with fab.mesh_context(mesh):
        assert fab._mesh_qualifies()
        out = block.apply(v, x)                     # shard_mapped kernel
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))

    def loss(p, fused):
        monkeypatch.setenv("XTAG_FUSED_BLOCK", "1" if fused else "0")
        with fab.mesh_context(mesh):
            y = block.apply({"params": p}, x, deterministic=False)
        return (y.astype(jnp.float32) ** 2).sum()

    g_fused = jax.grad(lambda p: loss(p, True))(v["params"])
    g_ref = jax.grad(lambda p: loss(p, False))(v["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_out = dict(jax.tree_util.tree_leaves_with_path(g_fused))
    assert {k for k, _ in flat_ref} == set(flat_out)
    for k, r in flat_ref:
        a = np.asarray(flat_out[k], np.float32)
        r = np.asarray(r, np.float32)
        denom = max(1.0, float(np.abs(r).max()))
        err = float(np.abs(a - r).max()) / denom
        # 2e-2 wiring tolerance (see test_block_train_gradients_match_
        # unfused): interpret-mode kernel fwd differs from the XLA chain
        # by 1 bf16 ULP at some entries, which sum(y^2) amplifies
        assert err <= 2e-2, (jax.tree_util.keystr(k), err)


def test_mesh_gate_rejects_tp_and_ragged(monkeypatch):
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    # model axis > 1 → stays on the XLA path (TP shards the weights)
    tp = Mesh(np.array(devs).reshape(len(devs) // 2, 2), ("data", "model"))
    with fab.mesh_context(tp):
        assert not fab._mesh_qualifies()
        assert fab._shard_mesh(len(devs)) is None
    # batch not divisible by the data axis → direct call
    dp = Mesh(np.array(devs), ("data",))
    with fab.mesh_context(dp):
        assert fab._mesh_qualifies()
        assert fab._shard_mesh(len(devs) + 1) is None
        assert fab._shard_mesh(2 * len(devs)) is dp
    assert fab._shard_mesh(8) is None  # no mesh registered


def test_env_gate(monkeypatch):
    auto = (jax.default_backend() == "tpu" and jax.device_count() == 1)
    monkeypatch.delenv("XTAG_FUSED_BLOCK", raising=False)
    assert fab.enabled() == auto  # default IS auto (bit-identical + faster)
    monkeypatch.setenv("XTAG_FUSED_BLOCK", "1")
    assert fab.enabled()
    monkeypatch.setenv("XTAG_FUSED_BLOCK", "0")
    assert not fab.enabled()
    monkeypatch.setenv("XTAG_FUSED_BLOCK", "auto")
    assert fab.enabled() == auto


# ---------------------------------------------------------------------------
# round-4 TRAIN-variant kernels: the forward under differentiation is the
# kernel itself (emitting q/k/v / the pre-activation as residuals), the
# backward a split vjp with no projection recompute.


def test_train_gate(monkeypatch):
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "1")
    assert fab.train_enabled()
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
    assert not fab.train_enabled()
    # auto follows the eval gate (off on the CPU test backend)
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "auto")
    assert fab.train_enabled() == fab.enabled()
    # the train kernels take a subset of the eval set (extra residual VMEM)
    assert fab.supported_train((256, 50, 768), 12)
    assert fab.supported_train((128, 257, 1024), 16)
    assert not fab.supported_train((16, 1025, 1024), 16)
    assert fab.supported_mlp_train((256, 50, 768), 3072, "quick_gelu")
    assert not fab.supported_mlp_train((64, 257, 1280), 5120, "gelu")


def test_train_attn_forward_value_unchanged(monkeypatch):
    """The emit_qkv kernel's primal output must be bit-identical to the
    eval kernel — the residual outputs must not perturb the primal. (Not
    compared to the composed chain: interpret-mode accumulation order can
    differ from the XLA einsum by one bf16 ULP at some seeds.)"""
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=2, l=16, d=128, seed=9)
    args = (x, g, b_, wqkv, bqkv, wout, bout)
    with _interpret():
        monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
        ref = fab.fused_attn_half(*args, None, 2, 1e-5)
        monkeypatch.setenv("XTAG_FUSED_TRAIN", "1")
        out, _ = jax.vjp(
            lambda *a: fab.fused_attn_half(*a, None, 2, 1e-5), *args)
        # the kernel-saved residuals are exactly the chain's q/k/v
        q, k, v = fab._fused_attn_half_fwd(*args, None, 2, 1e-5,
                                           emit_qkv=True)[1:]
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))
    qh, kh, vh = fab._qkv_head(x.astype(jnp.float32), g, b_, wqkv, bqkv,
                               1e-5, x.dtype)
    for a, r in ((q, qh), (k, kh), (v, vh)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(r, np.float32))


def test_train_attn_gradients_match_chain(monkeypatch):
    """Split backward from kernel-saved q/k/v == autodiff of the composed
    chain. q/k/v round-trip at bf16 in both paths, so this is tight."""
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "1")
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=1, l=16, d=128, seed=10)
    args = (x, g, b_, wqkv, bqkv, wout, bout)

    g_ref = jax.grad(
        lambda *a: (fab._reference_chain(*a, 2, 1e-5).astype(jnp.float32)
                    ** 2).sum(), argnums=tuple(range(7)))(*args)
    with _interpret():
        g_out = jax.grad(
            lambda *a: (fab.fused_attn_half(*a, None, 2, 1e-5).astype(
                jnp.float32) ** 2).sum(), argnums=tuple(range(7)))(*args)
    for a, r in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   atol=1e-4, rtol=1e-4)


def test_train_attn_gradients_with_causal_mask(monkeypatch):
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "1")
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=1, l=16, d=128, seed=11)
    causal = jnp.triu(jnp.full((16, 16), -jnp.inf, jnp.float32), k=1)
    args = (x, g, b_, wqkv, bqkv, wout, bout)

    g_ref = jax.grad(
        lambda *a: (fab._reference_chain(*a, 2, 1e-5, mask=causal).astype(
            jnp.float32) ** 2).sum(), argnums=tuple(range(7)))(*args)
    with _interpret():
        g_out = jax.grad(
            lambda *a: (fab.fused_attn_half(*a, causal, 2, 1e-5).astype(
                jnp.float32) ** 2).sum(), argnums=tuple(range(7)))(*args)
    for a, r in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(r, np.float32),
                                   atol=1e-4, rtol=1e-4)


def test_train_bwd_gate(monkeypatch):
    # default OFF: measured 0.86x vs XLA autodiff in the full train step
    # (module doc) — opting in must be explicit
    monkeypatch.delenv("XTAG_FUSED_TRAIN_BWD", raising=False)
    assert not fab.train_bwd_enabled()
    monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "1")
    assert fab.train_bwd_enabled()
    assert fab.train_path_enabled()
    monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "0")
    assert not fab.train_bwd_enabled()
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
    assert not fab.train_path_enabled()
    # auto follows the eval gate (off on the CPU test backend)
    monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "auto")
    assert fab.train_bwd_enabled() == fab.enabled()
    # the backward kernel's working set is larger than the forward's
    assert fab.supported_bwd((256, 50, 768), 12)
    assert fab.supported_bwd((128, 197, 768), 12)
    assert fab.supported_bwd((128, 257, 768), 12)
    assert fab.supported_bwd((128, 197, 1024), 16)
    # d=1024 at l>=256 crashes the Mosaic compiler (probed on-chip) —
    # ViT-L/14 attention training stays on XLA autodiff
    assert not fab.supported_bwd((128, 256, 1024), 16)
    assert not fab.supported_bwd((128, 257, 1024), 16)
    assert not fab.supported_bwd((16, 1025, 1024), 16)


def _assert_grads_close(g_out, g_ref, tol=1e-3):
    """The <=1e-3 backward contract: max abs error normalized by the
    reference gradient's scale, per tensor (the kernel's hand-written LN
    vjp uses the analytic formula — autodiff's graph rounds the same
    math differently, so a handful of SMALL dx entries land ~2 bf16 ULP
    apart; elementwise rtol would flag those spuriously)."""
    for a, r in zip(g_out, g_ref):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        denom = max(1.0, float(np.abs(r).max()))
        err = float(np.abs(a - r).max()) / denom
        assert err <= tol, err


@pytest.mark.parametrize("b,l,d,h,seed", [(1, 16, 128, 2, 20),
                                          (3, 16, 128, 4, 21)])
def test_train_bwd_kernel_gradients_match_chain(b, l, d, h, seed,
                                                monkeypatch):
    """Pallas backward kernel vs autodiff of the composed chain. b=3
    exercises the cross-grid fp32 accumulators (dwout/dbout/dls/dlb)."""
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
    monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "1")
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=b, l=l, d=d, seed=seed)
    args = (x, g, b_, wqkv, bqkv, wout, bout)

    g_ref = jax.grad(
        lambda *a: (fab._reference_chain(*a, h, 1e-5).astype(jnp.float32)
                    ** 2).sum(), argnums=tuple(range(7)))(*args)
    with _interpret():
        g_out = jax.grad(
            lambda *a: (fab.fused_attn_half(*a, None, h, 1e-5).astype(
                jnp.float32) ** 2).sum(), argnums=tuple(range(7)))(*args)
    _assert_grads_close(g_out, g_ref)


def test_train_bwd_kernel_gradients_with_causal_mask(monkeypatch):
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
    monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "1")
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=2, l=16, d=128, seed=22)
    causal = jnp.triu(jnp.full((16, 16), -jnp.inf, jnp.float32), k=1)
    args = (x, g, b_, wqkv, bqkv, wout, bout)

    g_ref = jax.grad(
        lambda *a: (fab._reference_chain(*a, 2, 1e-5, mask=causal).astype(
            jnp.float32) ** 2).sum(), argnums=tuple(range(7)))(*args)
    with _interpret():
        g_out = jax.grad(
            lambda *a: (fab.fused_attn_half(*a, causal, 2, 1e-5).astype(
                jnp.float32) ** 2).sum(), argnums=tuple(range(7)))(*args)
    _assert_grads_close(g_out, g_ref)


def test_train_bwd_forward_is_eval_kernel(monkeypatch):
    """Under the train_bwd gate the primal output IS the eval kernel's —
    bit-identical to XTAG_FUSED_TRAIN_BWD=0 eval."""
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=2, l=16, d=128, seed=23)
    args = (x, g, b_, wqkv, bqkv, wout, bout)
    with _interpret():
        monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "0")
        ref = fab.fused_attn_half(*args, None, 2, 1e-5)
        monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
        monkeypatch.setenv("XTAG_FUSED_TRAIN_BWD", "1")
        out, _ = jax.vjp(
            lambda *a: fab.fused_attn_half(*a, None, 2, 1e-5), *args)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_train_mlp_forward_value_unchanged(monkeypatch):
    """emit_pre must not perturb the primal (vs the eval kernel)."""
    args = _mlp_inputs(b=1, l=16, seed=12)
    with _interpret():
        monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
        ref = fab.fused_mlp_half(*args, "quick_gelu", 1e-5)
        monkeypatch.setenv("XTAG_FUSED_TRAIN", "1")
        out, _ = jax.vjp(
            lambda *a: fab.fused_mlp_half(*a, "quick_gelu", 1e-5), *args)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_train_mlp_gradients_match_chain(act, monkeypatch):
    """Split backward from the kernel-saved (fp32) pre-activation vs
    autodiff of the composed chain, under an IDENTICAL cotangent — this
    isolates the backward; the forward's rational-erf deviation (gelu,
    <=1e-3, covered by the forward tests) would otherwise leak into the
    loss cotangent and dominate."""
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "1")
    args = _mlp_inputs(b=1, l=16, seed=13)
    ct = jnp.asarray(
        np.random.default_rng(99).standard_normal((1, 16, 128)),
        jnp.bfloat16)

    _, vjp_ref = jax.vjp(
        lambda *a: fab._reference_mlp_chain(*a, act, 1e-5), *args)
    g_ref = vjp_ref(ct)
    with _interpret():
        _, vjp_out = jax.vjp(
            lambda *a: fab.fused_mlp_half(*a, act, 1e-5), *args)
        g_out = vjp_out(ct)
    for a, r in zip(g_out, g_ref):
        denom = max(1.0, float(np.abs(np.asarray(r, np.float32)).max()))
        err = float(np.abs(np.asarray(a, np.float32)
                           - np.asarray(r, np.float32)).max()) / denom
        assert err <= 1e-3, err


def test_block_train_gradients_match_unfused(monkeypatch):
    """ResidualAttentionBlock with deterministic=False takes the fused
    train path (XTAG_FUSED_TRAIN=1) and its parameter gradients match the
    round-3 train path — the same custom_vjp module with the composed-
    chain fallback (XTAG_FUSED_TRAIN=0).

    Tolerance: 2e-2, NOT the 1e-3 backward contract — in interpret mode
    the kernel forward differs from the composed chain by 1 bf16 ULP at
    some entries (accumulation order), so the two branches' loss
    cotangents differ before the backward even runs; sum(y^2) amplifies
    that into ~6e-3 on the bias grads. The <=1e-3 backward contract is
    pinned by the identical-cotangent kernel-level tests above; on-chip
    the kernel forward is bit-identical to the XLA chain (PERF.md), so
    this noise term is zero there. This test's job is the WIRING: the
    fused train path engages at deterministic=False and every param
    receives a gradient."""
    b, l, d, h = 1, 16, 128, 2
    x = jnp.asarray(np.random.default_rng(14).standard_normal((b, l, d)),
                    jnp.bfloat16)
    block = ResidualAttentionBlock(num_heads=h, dtype=jnp.bfloat16)
    monkeypatch.setenv("XTAG_FUSED_BLOCK", "1")
    monkeypatch.setenv("XTAG_FUSED_TRAIN", "0")
    with _interpret():
        v = block.init(jax.random.PRNGKey(0), x)

        def loss(p):
            y = block.apply({"params": p}, x, deterministic=False)
            return (y.astype(jnp.float32) ** 2).sum()

        g_ref = jax.grad(loss)(v["params"])
        monkeypatch.setenv("XTAG_FUSED_TRAIN", "1")
        g_out = jax.grad(loss)(v["params"])

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_out = dict(jax.tree_util.tree_leaves_with_path(g_out))
    assert {k for k, _ in flat_ref} == set(flat_out)
    for k, r in flat_ref:
        a = np.asarray(flat_out[k], np.float32)
        r = np.asarray(r, np.float32)
        denom = max(1.0, float(np.abs(r).max()))
        err = float(np.abs(a - r).max()) / denom
        assert err <= 2e-2, (jax.tree_util.keystr(k), err)


# ---------------------------------------------------------------------------
# round-4 head-padding: dh 88/104 (ViT-g / ViT-bigG) run with each head
# zero-padded to a 128-lane block in the weights — exact by construction
# (zero k/v columns contribute nothing to scores/outputs; zero wout rows
# kill the pad columns of att).


def test_head_pad_gate():
    # ViT-g geometry: width 1408, 16 heads, dh 88
    assert fab.head_pad(1408, 16) == 128
    assert fab.supported((8, 257, 1408), 16)
    # all four padded production shapes are measured full-tower winners
    # (PERF.md round 5: g +28.9% @224 / +22.7% @336, bigG +25.2% @224 /
    # +7.0% @336) — admitted via the 56 MiB _PADDED_VMEM_BUDGET
    assert fab.supported((8, 577, 1408), 16)
    assert fab.head_pad(1664, 16) == 128
    assert fab.supported((8, 257, 1664), 16)
    assert fab.supported((8, 577, 1664), 16)
    # unpadded dims unchanged
    assert fab.head_pad(768, 12) == 64
    assert fab.head_pad(1280, 16) == 80
    # padded towers: eval only — both train variants stay on XLA
    assert not fab.supported_train((8, 257, 1408), 16)
    assert not fab.supported_bwd((8, 257, 1408), 16)


def test_head_pad_weights_round_trip():
    rng = np.random.default_rng(40)
    d, h, dh, dhp = 352, 4, 88, 128  # 4*88=352... not lane-aligned stream
    # use a lane-aligned synthetic: h=16 is the only real geometry, but the
    # pad/unpad pair is shape math only — exercise it at h=4
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)), jnp.bfloat16)
    bqkv = jnp.asarray(rng.standard_normal(3 * d), jnp.float32)
    wout = jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16)
    wq, bq, wo = fab._pad_head_weights(wqkv, bqkv, wout, h, dhp)
    assert wq.shape == (d, 3 * h * dhp)
    assert bq.shape == (3 * h * dhp,)
    assert wo.shape == (h * dhp, d)
    # pad slots are zero; unpad recovers the originals exactly
    uq, ub, uo = fab._unpad_head_grads(wq, bq, wo, h, dh)
    np.testing.assert_array_equal(np.asarray(uq, np.float32),
                                  np.asarray(wqkv, np.float32))
    np.testing.assert_array_equal(np.asarray(ub, np.float32),
                                  np.asarray(bqkv, np.float32))
    np.testing.assert_array_equal(np.asarray(uo, np.float32),
                                  np.asarray(wout, np.float32))


@pytest.mark.parametrize("d,h", [(1408, 16), (1664, 16)])
def test_head_pad_kernel_bit_identical_to_unpadded(d, h, monkeypatch):
    """Padding is exact in exact arithmetic (zero k/v columns add nothing
    to any sum; zero wout rows kill the pad columns of att) — in floating
    point the longer contractions may REASSOCIATE the same nonzero terms
    (XLA picks reduction trees by size), so the padded kernel can differ
    from the unpadded one by 1 bf16 ULP on isolated elements (observed
    4/22528). The unpadded dh-88/104 kernel only exists in interpret mode
    — on-chip it crashes Mosaic, which is why the pad exists. Real ViT-g /
    ViT-bigG widths; L kept small for the CPU interpreter."""
    monkeypatch.setenv("XTAG_PALLAS_INTERPRET", "1")
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=1, l=16, d=d, seed=41)
    args = (x, g, b_, wqkv, bqkv, wout, bout, None, h, 1e-5)
    out = fab.fused_attn_half(*args)
    monkeypatch.setattr(fab, "_HEAD_PAD", {})
    ref = fab.fused_attn_half(*args)     # unpadded kernel, interpret-only
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    tol = float(np.abs(ref).max()) / 128        # 1 bf16 ULP at scale
    np.testing.assert_allclose(out, ref, atol=tol, rtol=1e-2)
    assert (out != ref).mean() < 1e-3           # ...and only isolated ones


@pytest.mark.parametrize("mask", [False, True])
def test_head_pad_close_to_chain(mask, monkeypatch):
    """vs the composed chain the usual kernel contract applies: same
    fp32-accumulation math, bf16 rounding boundaries — at width 1408 the
    einsum order differs enough for ~1-ULP bf16 diffs (also true of the
    UNPADDED kernel; not a padding artifact — the padded kernel is
    bit-identical to it, see above)."""
    monkeypatch.setenv("XTAG_PALLAS_INTERPRET", "1")
    d, h = 1408, 16
    x, g, b_, wqkv, bqkv, wout, bout = _inputs(b=1, l=16, d=d, seed=42)
    causal = (jnp.triu(jnp.full((16, 16), -jnp.inf, jnp.float32), k=1)
              if mask else None)
    ref = fab._reference_chain(x, g, b_, wqkv, bqkv, wout, bout, h, 1e-5,
                               mask=causal)
    out = fab.fused_attn_half(x, g, b_, wqkv, bqkv, wout, bout, causal, h,
                              1e-5)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    # 1 bf16 ULP relative to the output scale
    tol = float(np.abs(ref).max()) / 128
    np.testing.assert_allclose(out, ref, atol=tol, rtol=1e-2)

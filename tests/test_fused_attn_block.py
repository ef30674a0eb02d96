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
    # ViT-g / ViT-bigG head dims (88/104): crash — rejected
    assert not fab.supported((32, 257, 1408, ), 16)
    assert not fab.supported((16, 257, 1664), 16)
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

"""Flash-attention backend (ops/flash_attn.py): kernel parity vs dense
attention (interpret mode, so it runs on any backend), the shape gate, and
the attention fast-path wiring.

The op routes lane-aligned no-mask self-attention (the cls-free GAP towers,
L = (size/patch)^2) through the Pallas TPU flash kernel — exact softmax
attention with fp32 running stats, the same numerics contract as
``dot_product_attention`` (reference transformer.py:92-188 math).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.models.layers import dot_product_attention, fused_attention
from xtagclip_tpu.ops import flash_attn


def _rand(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


def _interpret():
    import jax.experimental.pallas.tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def test_matches_dense_attention_interpret():
    b, h, l, dh = 1, 2, 128, 64
    q, k, v = (_rand((b, h, l, dh), s) for s in (0, 1, 2))
    with jax.default_matmul_precision("highest"):
        ref, _ = jax.jit(dot_product_attention)(q, k, v)
        with _interpret():
            out = flash_attn.flash_mha(q, k, v, layout="bhld")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_blhd_layout_matches_bhld():
    b, h, l, dh = 1, 2, 128, 64
    q, k, v = (_rand((b, h, l, dh), s) for s in (3, 4, 5))
    with jax.default_matmul_precision("highest"), _interpret():
        a = flash_attn.flash_mha(q, k, v, layout="bhld")
        bl = flash_attn.flash_mha(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), layout="blhd").transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(bl), np.asarray(a),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match_dense():
    b, h, l, dh = 1, 1, 128, 64
    q, k, v = (_rand((b, h, l, dh), s) for s in (6, 7, 8))

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v)
        return (out * out).sum()

    def loss_flash(q, k, v):
        out = flash_attn.flash_mha(q, k, v, layout="bhld")
        return (out * out).sum()

    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        with _interpret():
            g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-5, rtol=5e-5)


def test_shape_gate():
    # lane-aligned, no mask, square, known head dims -> supported
    assert flash_attn.supported(256, 256, None, 64)
    assert flash_attn.supported(256, 256, None, 128)
    # the ragged cls sequence (ViT default) is NOT the flash path
    assert not flash_attn.supported(257, 257, None, 64)
    # masks (text causal path) are not taken
    assert not flash_attn.supported(256, 256, jnp.zeros((256, 256)), 64)
    # cross-attention shapes are not taken
    assert not flash_attn.supported(256, 128, None, 64)
    # sub-lane sequences (ViT-B-32's L=50) are not taken
    assert not flash_attn.supported(50, 50, None, 64)


def test_block_size_picks_divide():
    for l in (128, 256, 512, 1024, 384):
        bs = flash_attn._block_sizes(8, l)
        assert l % bs.block_q == 0
        assert l % bs.block_k == 0
    for b in (1, 2, 64, 128, 6):
        assert b % flash_attn._pick_block_b(b) == 0


def test_fast_path_wiring(monkeypatch):
    """fused_attention routes qualifying shapes through flash_mha when the
    env gate is on (counted via a wrapper), and output matches the default
    XLA path."""
    b, l, e, heads = 1, 128, 128, 2
    q, k, v = (_rand((b, l, e), s) for s in (9, 10, 11))

    ref = fused_attention(q, k, v, heads)

    calls = []
    real = flash_attn.flash_mha

    def spy(*a, **kw):
        calls.append(1)
        with _interpret():
            return real(*a, **kw)

    monkeypatch.setenv("XTAG_FLASH_ATTN", "1")
    monkeypatch.setattr(
        "xtagclip_tpu.models.layers.flash_attn.flash_mha", spy)
    with jax.default_matmul_precision("highest"):
        out = fused_attention(q, k, v, heads)
    assert calls, "flash path was not taken with XTAG_FLASH_ATTN=1"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_env_gate(monkeypatch):
    monkeypatch.delenv("XTAG_FLASH_ATTN", raising=False)
    assert not flash_attn.enabled()  # measured default: OFF (PERF.md)
    monkeypatch.setenv("XTAG_FLASH_ATTN", "1")
    assert flash_attn.enabled()
    monkeypatch.setenv("XTAG_FLASH_ATTN", "0")
    assert not flash_attn.enabled()
    monkeypatch.setenv("XTAG_FLASH_ATTN", "auto")
    assert flash_attn.enabled() == (jax.default_backend() == "tpu")

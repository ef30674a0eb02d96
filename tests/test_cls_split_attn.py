"""Exact-split attention (ops/cls_split_attn.py): reassociation parity,
gradients, the shape gate, and the MultiheadAttention fast-path wiring.

The op is an exact reassociation of softmax attention (reference
transformer.py:92-188 math), built to keep every [L, L] attention matmul
lane-aligned on TPU (PERF.md round 3: the cls token's 257th lane costs ~13%
of the whole ViT-L stack). Correctness must therefore hold on every backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.models.layers import (
    MultiheadAttention,
    dot_product_attention,
)
from xtagclip_tpu.ops.cls_split_attn import (
    cls_split_attention,
    enabled,
    supported,
)


def _rand(shape, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


@pytest.mark.parametrize("l", [257, 260, 513])
def test_matches_dense_attention(l):
    b, h, dh = 2, 3, 32
    q, k, v = (_rand((b, h, l, dh), s) for s in (0, 1, 2))
    with jax.default_matmul_precision("highest"):
        ref, _ = jax.jit(dot_product_attention)(q, k, v)
        out = jax.jit(cls_split_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_blhd_layout_matches_bhld():
    b, h, l, dh = 2, 4, 257, 16
    q, k, v = (_rand((b, h, l, dh), s) for s in (3, 4, 5))
    with jax.default_matmul_precision("highest"):
        a = cls_split_attention(q, k, v, layout="bhld")
        bl = cls_split_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), layout="blhd").transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(bl), np.asarray(a),
                               atol=2e-5, rtol=2e-5)


def test_gradients_match():
    b, h, l, dh = 1, 2, 257, 16
    q, k, v = (_rand((b, h, l, dh), s) for s in (6, 7, 8))

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v)
        return (out * out).sum()

    def loss_split(q, k, v):
        out = cls_split_attention(q, k, v)
        return (out * out).sum()

    with jax.default_matmul_precision("highest"):
        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        g_out = jax.jit(jax.grad(loss_split, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g_ref, g_out):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=5e-5, rtol=5e-4)


def test_bf16_stays_within_half_precision_noise():
    b, h, l, dh = 2, 2, 257, 32
    q32, k32, v32 = (_rand((b, h, l, dh), s) for s in (9, 10, 11))
    with jax.default_matmul_precision("highest"):
        ref, _ = dot_product_attention(q32, k32, v32)
    out = cls_split_attention(q32.astype(jnp.bfloat16),
                              k32.astype(jnp.bfloat16),
                              v32.astype(jnp.bfloat16))
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 0.05


def test_supported_gate():
    # the ViT shapes (L = 128k + small r) qualify; aligned, short, masked,
    # and cross-length shapes do not
    assert supported(257, 257, None)          # ViT @224 (patch 14/16/32)
    assert supported(260, 260, None)
    assert not supported(256, 256, None)      # aligned: plain path is best
    assert not supported(77, 77, None)        # text tower (short + causal)
    assert not supported(577, 577, None)      # r=65: remainder too wide
    assert not supported(257, 256, None)      # cross-attention
    assert not supported(257, 257, jnp.zeros((1, 1, 257, 257)))  # masked


def test_enabled_env(monkeypatch):
    monkeypatch.setenv("XTAG_CLS_SPLIT_ATTN", "1")
    assert enabled()
    monkeypatch.setenv("XTAG_CLS_SPLIT_ATTN", "0")
    assert not enabled()
    monkeypatch.delenv("XTAG_CLS_SPLIT_ATTN")
    # default OFF: measured slower than XLA's fused attention on the
    # current toolchain (module docstring / PERF.md)
    assert not enabled()
    # 'auto' turns on only on TPU backends
    assert enabled("auto") == (jax.default_backend() == "tpu")


def test_multihead_attention_fast_path(monkeypatch):
    """The wired fast path (models/layers.py) produces the same outputs with
    the split on and off — same params, same inputs, L=257."""
    b, l, e, heads = 2, 257, 64, 4
    x = _rand((b, l, e), 12)
    mha = MultiheadAttention(num_heads=heads)
    params = mha.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("XTAG_CLS_SPLIT_ATTN", "0")
    with jax.default_matmul_precision("highest"):
        off = mha.apply(params, x)
    monkeypatch.setenv("XTAG_CLS_SPLIT_ATTN", "1")
    with jax.default_matmul_precision("highest"):
        on = mha.apply(params, x)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               atol=2e-5, rtol=2e-5)

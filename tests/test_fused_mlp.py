"""Fused Pallas MLP: param-layout invariance, fallback numerics, and the
kernel itself (interpret mode — no TPU needed)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.models.layers import MLP, gelu_exact, quick_gelu
from xtagclip_tpu.ops.fused_mlp import _act_fn, _fused_mlp_fwd


def _params_tree(dtype):
    mlp = MLP(mlp_width=256, act=gelu_exact, dtype=dtype)
    x = jnp.zeros((8, 64), dtype)
    return mlp, mlp.init(jax.random.PRNGKey(0), x)


def test_param_layout_identical_between_paths(monkeypatch):
    """The fused branch must declare exactly the nn.Dense param tree."""
    monkeypatch.setenv("XTAG_FUSED_MLP", "1")
    _, fused_vars = _params_tree(jnp.bfloat16)   # fused branch (falls back
    # to plain math on CPU, but the param declaration runs)
    monkeypatch.delenv("XTAG_FUSED_MLP")
    _, plain_vars = _params_tree(jnp.bfloat16)
    fused_shapes = jax.tree.map(lambda a: a.shape, fused_vars)
    plain_shapes = jax.tree.map(lambda a: a.shape, plain_vars)
    assert fused_shapes == plain_shapes
    assert set(fused_vars["params"]) == {"c_fc", "c_proj"}
    assert set(fused_vars["params"]["c_fc"]) == {"kernel", "bias"}


def test_fallback_matches_dense_path(monkeypatch):
    monkeypatch.setenv("XTAG_FUSED_MLP", "1")
    mlp, variables = _params_tree(jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 64)), jnp.bfloat16)
    y_fused_branch = mlp.apply(variables, x)

    monkeypatch.delenv("XTAG_FUSED_MLP")
    plain = MLP(mlp_width=256, act=gelu_exact, dtype=jnp.bfloat16)
    y_plain = plain.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(y_fused_branch, np.float32), np.asarray(y_plain, np.float32),
        rtol=2e-2, atol=2e-2)  # bf16 noise


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_kernel_interpret_mode_matches_reference(act):
    """Run the actual Pallas kernel in interpret mode and compare against
    the plain-math reference, including the in-kernel erf approximation."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    d, h, n = 128, 256, 512
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, h)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(h) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, d)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)

    f = _act_fn(act)
    ref = f(jnp.dot(x, w1, preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32))
    ref = jnp.dot(ref.astype(x.dtype), w2,
                  preferred_element_type=jnp.float32) + b2
    ref = np.asarray(ref.astype(jnp.bfloat16), np.float32)

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_fused_mlp_fwd(x, w1, b1, w2, b2, act), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_in_kernel_erf_accuracy():
    from xtagclip_tpu.ops.fused_mlp import _erf
    import scipy.special

    z = jnp.linspace(-5, 5, 10001)
    approx = np.asarray(_erf(z))
    exact = scipy.special.erf(np.asarray(z))
    # 1.5e-7 approximation bound + fp32 evaluation rounding; three orders
    # below bf16 output resolution either way
    assert np.abs(approx - exact).max() < 1e-6


def test_fused_mlp_gradients(monkeypatch):
    """custom_vjp backward equals autodiff through the plain chain."""
    from xtagclip_tpu.ops.fused_mlp import maybe_fused_mlp

    rng = np.random.default_rng(2)
    d, h, n = 64, 128, 256
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, h)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(h) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, d)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)

    def loss_fused(w1, b1, w2, b2):
        # on CPU this routes through the fallback, which shares the
        # custom_vjp'd fused_mlp only on TPU; exercise the vjp directly
        from xtagclip_tpu.ops.fused_mlp import _bwd, _fwd

        y, res = _fwd(x, w1, b1, w2, b2, "gelu")
        return y, res

    def loss_plain(w1, b1, w2, b2):
        f = _act_fn("gelu")
        hid = f(jnp.dot(x, w1, preferred_element_type=jnp.float32)
                + b1.astype(jnp.float32))
        out = jnp.dot(hid.astype(x.dtype), w2,
                      preferred_element_type=jnp.float32)
        return ((out + b2) ** 2).sum()

    grads_plain = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(w1, b1, w2, b2)

    from xtagclip_tpu.ops.fused_mlp import _bwd

    # cotangent of sum((y+...)^2)-style: use 2*(out+b2) shape match via plain
    f = _act_fn("gelu")
    hid = f(jnp.dot(x, w1, preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32))
    out = jnp.dot(hid.astype(x.dtype), w2,
                  preferred_element_type=jnp.float32) + b2
    g = (2 * out).astype(jnp.bfloat16)
    _, dw1, db1, dw2, db2 = _bwd("gelu", (x, w1, b1, w2, b2), g)
    # bf16 cotangent + bf16 weights: loose tolerances
    for a, b in zip((dw1, db1, dw2, db2), grads_plain):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.5)

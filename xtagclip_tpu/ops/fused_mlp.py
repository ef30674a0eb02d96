"""Pallas fused transformer MLP: out = act(x @ W1 + b1) @ W2 + b2.

One kernel per row tile keeps the hidden activation h [TILE, mlp_width] in
VMEM — h never round-trips HBM (XLA's lowering writes and re-reads it). The
weights use constant-index BlockSpecs so Mosaic keeps them resident across
grid steps. fp32 accumulation on the MXU for both matmuls; bf16 in/out.

Used by models/layers.MLP when enabled (TPU backend + compatible shapes);
everything else falls back to the plain two-Dense implementation. The
backward pass is the standard matmul chain (jnp), defined via custom_vjp so
training through the fused forward stays correct.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TILE = 256


def _supported(x, w1, w2):
    n, d = x.shape
    h = w1.shape[1]
    # VMEM budget: W1+W2 bf16 resident + double-buffered bf16 x/out tiles +
    # the fp32 hidden tile
    vmem = 2 * d * h * 2 + 2 * _TILE * d * 2 * 2 + _TILE * h * 4
    return (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.bfloat16
        and n % _TILE == 0
        and d % 128 == 0
        and h % 128 == 0
        and vmem < 14 * 1024 * 1024
    )


def _erf(z):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below bf16 output resolution). Pallas TPU has no erf/erfc lowering."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _act_fn(name, in_kernel: bool = False):
    if name == "gelu":
        if in_kernel:
            return lambda v: 0.5 * v * (1.0 + _erf(v * (2.0 ** -0.5)))
        return lambda v: jax.nn.gelu(v, approximate=False)
    if name == "quick_gelu":
        return lambda v: v * jax.nn.sigmoid(1.702 * v)
    raise ValueError(name)


@partial(jax.jit, static_argnames=("act",))
def _fused_mlp_fwd(x, w1, b1, w2, b2, act: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = x.shape
    h = w1.shape[1]
    f = _act_fn(act, in_kernel=True)

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        xt = x_ref[:]
        hid = jnp.dot(xt, w1_ref[:], preferred_element_type=jnp.float32)
        hid = f(hid + b1_ref[:].astype(jnp.float32))
        out = jnp.dot(hid.astype(xt.dtype), w2_ref[:],
                      preferred_element_type=jnp.float32)
        o_ref[:] = (out + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        grid=(n // _TILE,),
        in_specs=[
            pl.BlockSpec((_TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * h * 2,
            bytes_accessed=(n * d * 2) * 2 + (d * h * 2) * 2,
            transcendentals=n * h,
        ),
    )(x, w1, b1.reshape(1, h), w2, b2.reshape(1, d))


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, act: str = "gelu"):
    return _fused_mlp_fwd(x, w1, b1, w2, b2, act)


def _fwd(x, w1, b1, w2, b2, act):
    return _fused_mlp_fwd(x, w1, b1, w2, b2, act), (x, w1, b1, w2, b2)


def _bwd(act, res, g):
    x, w1, b1, w2, b2 = res
    f = _act_fn(act)
    # recompute the hidden pre-activation (cheaper than stashing it in HBM)
    pre = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
           + b1.astype(jnp.float32))
    hid = f(pre)
    g32 = g.astype(jnp.float32)
    dhid = jnp.dot(g32.astype(x.dtype), w2.T,
                   preferred_element_type=jnp.float32)
    # activation derivative, computed directly
    if act == "gelu":
        dact = jax.grad(lambda v: jax.nn.gelu(v, approximate=False).sum())
    else:
        dact = jax.grad(lambda v: (v * jax.nn.sigmoid(1.702 * v)).sum())
    dpre = dhid * dact(pre)
    dx = jnp.dot(dpre.astype(x.dtype), w1.T,
                 preferred_element_type=jnp.float32).astype(x.dtype)
    dw1 = jnp.dot(x.T, dpre.astype(x.dtype),
                  preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = dpre.sum(axis=0).astype(b1.dtype)
    dw2 = jnp.dot(hid.astype(x.dtype).T, g32.astype(x.dtype),
                  preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = g32.sum(axis=0).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


fused_mlp.defvjp(_fwd, _bwd)


def maybe_fused_mlp(x, w1, b1, w2, b2, act: str = "gelu"):
    """fused_mlp when the backend/shape qualifies, else the plain chain."""
    if _supported(x, w1, w2):
        return fused_mlp(x, w1, b1, w2, b2, act)
    f = _act_fn(act)
    hid = f(jnp.dot(x, w1, preferred_element_type=jnp.float32)
            + b1.astype(jnp.float32))
    out = jnp.dot(hid.astype(x.dtype), w2,
                  preferred_element_type=jnp.float32)
    return (out + b2.astype(jnp.float32)).astype(x.dtype)

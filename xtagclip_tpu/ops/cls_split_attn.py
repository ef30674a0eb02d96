"""Exact attention with the ragged remainder split off the aligned block.

The ViT sequence is 1 cls token + S^2 patches: L = 257/577/... — one past a
lane-tile multiple. XLA pads every [L, L] attention matmul's lane dimension
to the next multiple of 128 (257 -> 384), a measured ~13% whole-stack tax on
ViT-L/H (PERF.md round 3) and a 1.6x standalone attention gap on this chip
(L=257: 8.8 TFLOP/s, L=256: 14.2).

This module computes EXACT softmax attention (same math as the reference
`torch.nn.MultiheadAttention` path, reference transformer.py:92-188 — just
reassociated) by splitting the keys into a 128-aligned tail block P and the
ragged head r = L mod 128.

**Measured on the real chip and DEFAULT OFF** (PERF.md round 3, "the
cls-token recomposition experiments"): at ViT-L shapes the reassociation
runs 4.87 ms/call vs XLA's fused attention at 3.66, and the full model drops
507 -> 464 img/s — the manual softmax decomposition materializes fp32
intermediates that XLA's fused softmax keeps in registers, costing more than
the lane padding saves. Two further exact variants (Pallas flash over the
aligned 256 block + rank-1 correction; transposed [K, Q] score layout) lost
by larger margins (6.5-6.8 ms). The op stays available behind
XTAG_CLS_SPLIT_ATTN=1 as a correctness-tested baseline for future toolchains
where the fusion/layout trade-off may flip:

  - the P "patch" queries attend the P-key block through a clean [P, P]
    matmul, tracked unnormalized with row max m and row sum l (the
    flash-attention bookkeeping, done once at the XLA level);
  - the r remainder keys (cls + any injected learnable tokens) enter through
    a rank-r correction: m' = max(m, s_r), renormalize, add exp(s_r - m') V_r;
  - the r remainder queries attend all L keys through an [r, L] row — tiny.

Everything is jnp, so the backward is autodiff'd and the op runs on any
backend (CPU tests included). fp32 scores/stats, probabilities cast to the
value dtype for the AV matmul — the same numerics contract as
`dot_product_attention` in models/layers.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_LANE = 128


def enabled(default: str = "0") -> bool:
    """XTAG_CLS_SPLIT_ATTN: '1' opt-in, '0' off (the measured-correct
    default on the current toolchain — see the module docstring), 'auto' =
    on for qualifying shapes on TPU backends."""
    v = os.environ.get("XTAG_CLS_SPLIT_ATTN", default)
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() == "tpu"


def supported(l_q: int, l_k: int, mask) -> bool:
    """Self-attention, no mask, ragged-by-a-sliver sequence: the split pays
    off when the aligned block is large and the remainder is small (the
    cls-token case). Aligned sequences (r == 0) should take the plain path."""
    if mask is not None or l_q != l_k:
        return False
    r = l_q % _LANE
    return l_q >= 2 * _LANE and 0 < r <= 16


def cls_split_attention(q, k, v, scale=None, layout: str = "bhld"):
    """q, k, v with the ragged remainder (cls first) at the FRONT of the
    sequence; layout 'bhld' = [B, H, L, Dh] or 'blhd' = [B, L, H, Dh] (the
    model's transpose-free fast-path layout). Returns the same layout in
    q.dtype — exact softmax attention; softmax over keys is permutation-
    invariant so the split is a pure reassociation."""
    if layout == "bhld":
        seq_ax, dh = 2, q.shape[-1]
        qk, av = "bhqd,bhkd->bhqk", "bhqk,bhkd->bhqd"
    elif layout == "blhd":
        seq_ax, dh = 1, q.shape[-1]
        qk, av = "bqhd,bkhd->bhqk", "bhqk,bkhd->bqhd"
    else:
        raise ValueError(layout)
    l = q.shape[seq_ax]
    r = l % _LANE
    scale = dh ** -0.5 if scale is None else scale

    def split(x):
        return (jax.lax.slice_in_dim(x, 0, r, axis=seq_ax),
                jax.lax.slice_in_dim(x, r, l, axis=seq_ax))

    qr, qp = split(q)
    kr, kp = split(k)
    vr, vp = split(v)

    # scores/stats live in [B, H, Lq, Lk] for both layouts; only the AV
    # output returns to the input layout. Normalization stats must broadcast
    # against that output: [B, H, P, 1] for bhld, [B, P, H, 1] for blhd.
    def to_out(stat):  # [B, H, P, 1] -> broadcastable vs AV output
        return stat if layout == "bhld" else stat.transpose(0, 2, 1, 3)

    # --- P patch queries over the P-key aligned block: unnormalized, with
    # flash-style (m, l) bookkeeping in fp32
    s_pp = jnp.einsum(qk, qp, kp,
                      preferred_element_type=jnp.float32) * scale
    m_pp = jax.lax.stop_gradient(s_pp.max(axis=-1, keepdims=True))
    e_pp = jnp.exp(s_pp - m_pp)
    l_pp = e_pp.sum(axis=-1, keepdims=True)
    o_pp = jnp.einsum(av, e_pp.astype(v.dtype), vp,
                      preferred_element_type=jnp.float32)

    # --- rank-r correction: the remainder keys join the softmax
    s_pr = jnp.einsum(qk, qp, kr,
                      preferred_element_type=jnp.float32) * scale  # [B,H,P,r]
    m_pr = jax.lax.stop_gradient(s_pr.max(axis=-1, keepdims=True))
    m = jnp.maximum(m_pp, m_pr)
    a = jnp.exp(m_pp - m)
    e_pr = jnp.exp(s_pr - m)  # [B,H,P,r]
    o_pr = jnp.einsum(av, e_pr.astype(v.dtype), vr,
                      preferred_element_type=jnp.float32)
    denom = a * l_pp + e_pr.sum(axis=-1, keepdims=True)
    out_p = (to_out(a) * o_pp + o_pr) / to_out(denom)

    # --- r remainder queries over ALL keys: [r, L] rows, tiny
    s_r = jnp.einsum(qk, qr, k,
                     preferred_element_type=jnp.float32) * scale
    p_r = jax.nn.softmax(s_r, axis=-1)
    out_r = jnp.einsum(av, p_r.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)

    return jnp.concatenate([out_r, out_p], axis=seq_ax).astype(q.dtype)

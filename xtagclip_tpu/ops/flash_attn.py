"""Pallas flash-attention backend for lane-aligned attention shapes.

Round-3 measurements (PERF.md, "the cls-token recomposition experiments")
showed the bare Pallas flash kernel at L=256 runs the ViT-L attention call
in 1.92 ms vs 3.62 ms for XLA's fused attention at L=257 and 2.43 ms at
L=256 — the prize exists, but every *exact* recomposition that stitched the
ragged cls token back on at the XLA level lost more than it gained. The
cls-free GAP towers (``vision_cfg.no_class_token``, reference parity N/A —
a from-scratch recipe option) run at exactly L=(size/patch)^2, which is
lane-aligned for the 224px towers (256 tokens): there the flash kernel
applies with no recomposition at all.

This module routes those shapes through
``jax.experimental.pallas.ops.tpu.flash_attention`` (exact softmax
attention, fp32 running stats in-kernel — the same numerics contract as
``dot_product_attention`` in models/layers.py; the kernel's custom VJP
covers training). Everything else falls through to XLA's fused attention.

Gate: ``XTAG_FLASH_ATTN`` — ``1`` opt-in, ``0`` off, ``auto`` = on for
qualifying shapes on TPU backends. Default comes from the measured outcome
on the current toolchain (see PERF.md "flash attention in-model").

Reference anchor: the attention math being replaced is
``torch.nn.MultiheadAttention`` / sdpa in reference transformer.py:92-188.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_LANE = 128
# Pallas/Mosaic sublane tile for fp32 stats is 8; the kernel's own minimum
# block constraints are satisfied by any multiple of 128 on q/k blocks.
_BLOCK_CANDIDATES = (512, 256, 128)


def enabled(default: str = "0") -> bool:
    """XTAG_FLASH_ATTN: '1' opt-in, '0' off, 'auto' = TPU backends only."""
    v = os.environ.get("XTAG_FLASH_ATTN", default)
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() == "tpu"


def supported(l_q: int, l_k: int, mask, head_dim: int) -> bool:
    """Shapes the flash path takes: self-attention-like (Lq == Lk), no
    additive mask (the ViT eval path), lane-aligned sequence, and a head
    dim the kernel tiles without waste beyond the unavoidable 64->128 pad.
    """
    if mask is not None:
        return False
    if l_q != l_k:
        return False
    if l_q % _LANE != 0 or l_q < _LANE:
        return False
    return head_dim in (64, 128, 256)


def _pick_block(length: int) -> int:
    for b in _BLOCK_CANDIDATES:
        if length % b == 0:
            return b
    return _LANE


def _pick_block_b(batch: int) -> int:
    for b in (8, 4, 2, 1):
        if batch % b == 0:
            return b
    return 1


@functools.lru_cache(maxsize=None)
def _block_sizes(batch: int, length: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    blk = _pick_block(length)
    bb = _pick_block_b(batch)
    return BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=bb,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )


def flash_mha(q, k, v, *, layout: str = "blhd"):
    """Exact multi-head attention via the Pallas TPU flash kernel.

    q/k/v: [B, L, H, Dh] ("blhd", the model's layout) or [B, H, L, Dh]
    ("bhld"). Returns attention output in the same layout, q's dtype.
    Scale is the standard Dh^-0.5 (callers with custom scales pre-scale q).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention,
    )

    if layout == "blhd":
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    elif layout != "bhld":
        raise ValueError(f"unknown layout: {layout!r}")
    b, h, l, dh = q.shape
    out = flash_attention(
        q, k, v, sm_scale=dh**-0.5,
        block_sizes=_block_sizes(b, l),
    )
    if layout == "blhd":
        out = out.transpose(0, 2, 1, 3)
    return out.astype(q.dtype)

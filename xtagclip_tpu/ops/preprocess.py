"""On-device image normalization: uint8 HWC -> normalized compute-dtype.

The host ships uint8 bytes (2-4x less PCIe traffic than fp32/bf16); the
uint8 -> float -> (x/255 - mean)/std conversion happens on device where XLA
fuses it into the patch-embed matmul. This replaces the reference's
torchvision ToTensor+Normalize host chain (transform.py:334-355) as the
production input path; a Pallas fused variant lives below for the hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xtagclip_tpu.utils.constants import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD


def normalize_images(
    images_u8,
    mean=OPENAI_DATASET_MEAN,
    std=OPENAI_DATASET_STD,
    dtype=jnp.float32,
):
    """[B,H,W,3] uint8 -> normalized dtype. Scale/bias are folded so the whole
    op is one fused multiply-add on the VPU."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    scale = (1.0 / (255.0 * std)).astype(np.float32)
    bias = (-mean / std).astype(np.float32)
    x = images_u8.astype(jnp.float32) * scale + bias
    return x.astype(dtype)


def normalize_images_pallas(
    images_u8,
    mean=OPENAI_DATASET_MEAN,
    std=OPENAI_DATASET_STD,
    dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Pallas fused uint8->bf16 normalize, gridded one image per step.

    One VMEM pass per image: cast, FMA, downcast. Kept simple — XLA's own
    fusion is already near-bandwidth-bound for this op; the kernel exists to
    guarantee the fusion and as the attachment point for future crop/resize
    fusion. `interpret=True` runs the kernel in interpreter mode (CPU tests).
    """
    from jax.experimental import pallas as pl

    b, h, w, c = images_u8.shape
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    n = h * w * c
    scale = jnp.asarray(1.0 / (255.0 * std), jnp.float32).reshape(1, 3)
    bias = jnp.asarray(-mean / std, jnp.float32).reshape(1, 3)

    flat = images_u8.reshape(b, n)

    def kernel(x_ref, scale_ref, bias_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        s = jnp.tile(scale_ref[...], (1, n // 3))
        t = jnp.tile(bias_ref[...], (1, n // 3))
        o_ref[...] = (x * s + t).astype(dtype)

    # one image per grid step: a 224px image is ~600 KB of fp32 intermediate,
    # comfortably inside VMEM; un-gridded, a whole batch would blow it
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, n), dtype),
        in_specs=[
            pl.BlockSpec((1, n), lambda i: (i, 0)),
            pl.BlockSpec((1, 3), lambda i: (0, 0)),
            pl.BlockSpec((1, 3), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n), lambda i: (i, 0)),
        interpret=interpret,
    )(flat, scale, bias)
    return out.reshape(b, h, w, c)

"""On-device image preprocessing: uint8 HWC -> normalized compute-dtype.

The host ships uint8 bytes (2-4x less PCIe traffic than fp32/bf16); the
uint8 -> float -> (x/255 - mean)/std conversion happens on device where XLA
fuses it into the patch-embed matmul. This replaces the reference's
torchvision ToTensor+Normalize host chain (transform.py:334-355) as the
production input path; a Pallas fused variant lives below for the hot path.

``resize_crop_normalize`` moves the REST of the eval chain on-device too
(reference transform.py:360-383: Resize(shortest) -> CenterCrop ->
ToTensor -> Normalize): the host stage shrinks to JPEG decode only, and
the resample runs as two dense matmuls on the MXU. The trick that makes
this TPU-native: a separable PIL-style resize IS a linear map per axis, so
instead of gather/scatter sampling (dynamic, XLA-hostile) we build the
[out, in] filter-weight matrices from traced per-image sizes with
broadcasted iota — static shapes, one compile per padded input bucket,
batch handled by vmap.
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


# ---------------------------------------------------------------------------
# Device-side eval resize + center-crop + normalize (SURVEY §7 step 3).


def _filter_kernel(x, interpolation: str):
    """PIL's resample filters (Resample.c): bicubic = Keys a=-0.5, support 2;
    bilinear = triangle, support 1. Vectorized over x (fp32)."""
    ax = jnp.abs(x)
    if interpolation == "bicubic":
        a = -0.5
        return jnp.where(
            ax < 1.0,
            ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
            jnp.where(ax < 2.0,
                      (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a,
                      0.0),
        )
    if interpolation == "bilinear":
        return jnp.maximum(0.0, 1.0 - ax)
    raise ValueError(f"unsupported device interpolation: {interpolation}")


_FILTER_SUPPORT = {"bicubic": 2.0, "bilinear": 1.0}


def _resample_matrix(out_size: int, in_pad: int, true_size, resized_size,
                     crop_offset, interpolation: str):
    """[out_size, in_pad] fp32 weights for one axis of a PIL-style resize
    composed with a crop: output index i samples resized index i+crop_offset,
    whose source center is (i + crop_offset + 0.5) * true/resized (PIL
    precompute_coeffs). Downscale widens the filter by the scale factor
    (PIL resizes WITH antialias always); weights at k >= true_size are
    zeroed and each row renormalized — exactly PIL's window clamp at the
    image edge. true_size/resized_size/crop_offset are traced scalars; the
    shape is static, so one compile serves every image in the bucket."""
    if interpolation not in _FILTER_SUPPORT:  # support is implicit in the
        raise ValueError(interpolation)       # kernel's zero set
    scale = true_size.astype(jnp.float32) / resized_size.astype(jnp.float32)
    filterscale = jnp.maximum(scale, 1.0)
    i = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_pad), 0)
    k = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_pad), 1)
    center = (i + crop_offset.astype(jnp.float32) + 0.5) * scale
    w = _filter_kernel((k + 0.5 - center) / filterscale, interpolation)
    # PIL clips the window to the image; renormalizing over the surviving
    # taps is equivalent (the clipped mass is redistributed pro rata)
    w = jnp.where(k < true_size.astype(jnp.float32), w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.where(denom == 0.0, 1.0, denom)


def _resized_geometry(h, w, out_hw, resize_mode: str):
    """Traced replica of the host sizing rules (data/transforms.py):
    shortest: torchvision Resize(int) — shortest edge -> target, long edge
    int-truncated; squash: straight to (th, tw). Returns (nh, nw)."""
    th, tw = out_hw
    if resize_mode == "squash":
        return jnp.int32(th), jnp.int32(tw)
    if resize_mode != "shortest" or th != tw:
        raise ValueError(
            f"device path supports shortest/squash square targets, got "
            f"{resize_mode} {out_hw}")
    long_new = (th * jnp.maximum(h, w)) // jnp.minimum(h, w)  # int(t*l/s)
    nh = jnp.where(h <= w, jnp.int32(th), long_new.astype(jnp.int32))
    nw = jnp.where(h <= w, long_new.astype(jnp.int32), jnp.int32(tw))
    return nh, nw


@partial(jax.jit, static_argnames=("out_size", "resize_mode",
                                   "interpolation", "mean", "std", "dtype"))
def resize_crop_normalize(
    images_u8,
    sizes,
    out_size: int = 224,
    resize_mode: str = "shortest",
    interpolation: str = "bicubic",
    mean=OPENAI_DATASET_MEAN,
    std=OPENAI_DATASET_STD,
    dtype=jnp.bfloat16,
):
    """[B, Hp, Wp, 3] uint8 (zero-padded to a static bucket) + [B, 2] true
    (h, w) -> [B, out_size, out_size, 3] normalized dtype — the reference
    eval chain (transform.py:360-383) run entirely on device.

    Per image: out = Wy @ img @ Wx^T with [out, in] separable filter
    matrices built from the traced true size (_resample_matrix), then the
    folded (x/255 - mean)/std FMA. torchvision center_crop's int(round(d/2))
    offset (banker's at .5) is reproduced with jnp.round. FLOPs/image at
    512px: ~0.5 GFLOP — noise next to any tower, and it rides the MXU.

    Matches the host PIL chain within quantization tolerance (PIL rounds
    the horizontal pass to uint8 before the vertical pass and runs int16
    fixed-point filters; this path stays fp32 end to end) — pinned by
    tests/test_preprocess_goldens.py::test_device_resize_crop_*.
    """
    if images_u8.dtype != jnp.uint8:
        raise ValueError("resize_crop_normalize takes uint8 images")
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    scale = jnp.asarray(1.0 / (255.0 * std_a), jnp.float32)
    bias = jnp.asarray(-mean_a / std_a, jnp.float32)
    _, hp, wp, _ = images_u8.shape
    out_hw = (out_size, out_size)

    def one(img, hw):
        h = hw[0].astype(jnp.int32)
        w = hw[1].astype(jnp.int32)
        nh, nw = _resized_geometry(h, w, out_hw, resize_mode)
        top = jnp.round((nh - out_size).astype(jnp.float32) / 2.0)
        left = jnp.round((nw - out_size).astype(jnp.float32) / 2.0)
        wy = _resample_matrix(out_size, hp, h, nh, top, interpolation)
        wx = _resample_matrix(out_size, wp, w, nw, left, interpolation)
        x = img.astype(jnp.float32)
        # PIL resamples horizontally FIRST and rounds/clamps each pass back
        # to uint8; bicubic overshoots by up to ~9% of range at edges, so
        # reproducing the per-pass clamp (and round) is load-bearing for
        # parity — a single final clip diverges by up to 18/255 on
        # high-frequency content
        t = jnp.einsum("tw,hwc->htc", wx, x,
                       preferred_element_type=jnp.float32)
        t = jnp.clip(jnp.round(t), 0.0, 255.0)
        u = jnp.einsum("sh,htc->stc", wy, t,
                       preferred_element_type=jnp.float32)
        u = jnp.clip(jnp.round(u), 0.0, 255.0)
        return (u * scale + bias).astype(dtype)

    return jax.vmap(one)(images_u8, sizes)


def pad_images_for_device(arrs, bucket: int = 64, max_side: int = 1024):
    """Host-side collate for the device preprocess path: a list of native
    [h, w, 3] uint8 arrays -> (padded [B, Hp, Wp, 3] uint8, [B, 2] int32
    sizes). Hp/Wp are the batch maxima rounded up to `bucket` (bounded
    compile count: one executable per (Hp, Wp) pair). Images larger than
    max_side on a side should be pre-shrunk by the decoder (DCT
    scale-on-decode keeps this cheap) — oversize inputs raise."""
    if not arrs:
        raise ValueError("empty batch")
    hs = [a.shape[0] for a in arrs]
    ws = [a.shape[1] for a in arrs]
    if max(hs) > max_side or max(ws) > max_side:
        raise ValueError(
            f"image exceeds max_side={max_side}; shrink at decode time")
    hp = -(-max(hs) // bucket) * bucket
    wp = -(-max(ws) // bucket) * bucket
    out = np.zeros((len(arrs), hp, wp, 3), np.uint8)
    sizes = np.empty((len(arrs), 2), np.int32)
    for i, a in enumerate(arrs):
        if a.ndim != 3 or a.shape[2] != 3 or a.dtype != np.uint8:
            raise ValueError(f"batch item {i}: expected uint8 [h, w, 3]")
        out[i, : a.shape[0], : a.shape[1]] = a
        sizes[i] = (a.shape[0], a.shape[1])
    return out, sizes

"""Native data-plane: decode correctness vs PIL, batching, corruption."""

import io

import numpy as np
import pytest
from PIL import Image

from xtagclip_tpu.data import native


def _jpeg(h=96, w=128, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    # smooth image so JPEG loss is small and PIL/native agree closely
    x = rng.standard_normal((h // 8, w // 8, 3))
    img = np.asarray(
        Image.fromarray(
            ((x - x.min()) / (np.ptp(x) + 1e-9) * 255).astype("uint8")
        ).resize((w, h), Image.BILINEAR)
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib not built"
)


def test_native_matches_pil_closely():
    data = _jpeg()
    got = native.decode_resize(data, 64)
    want = native._pil_decode_resize(data, 64)
    assert got.shape == want.shape == (64, 64, 3)
    # different decoders/resamplers: require close agreement, not bit-equality
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.median(diff) <= 3, float(np.median(diff))


def test_batch_and_corruption():
    jpegs = [_jpeg(seed=i) for i in range(6)] + [b"corrupt bytes"]
    out = native.decode_batch(jpegs, 48, n_threads=2)
    assert out.shape == (7, 48, 48, 3)
    assert out[:6].mean() > 10  # real content
    assert out[6].sum() == 0  # corrupt slot zeroed


def test_resize_crop_raw():
    import ctypes

    lib = native._load()
    src = np.full((100, 60, 3), 200, np.uint8)
    out = np.empty((32, 32, 3), np.uint8)
    rc = lib.xtag_resize_crop_u8(
        src.ctypes.data_as(ctypes.c_void_p), 100, 60, 32,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    assert rc == 0
    assert np.abs(out.astype(int) - 200).max() <= 1


def test_decode_rrc_full_box_matches_resize():
    """RRC with the full-image box == a plain squash resize (no crop)."""
    from xtagclip_tpu.data.native import decode_rrc, native_available

    if not native_available():
        import pytest

        pytest.skip("native lib unavailable")
    data = _jpeg(h=128, w=128, seed=3)
    full = decode_rrc(data, 64, (0.0, 0.0, 1.0, 1.0))
    assert full is not None and full.shape == (64, 64, 3)
    assert full.dtype == np.uint8
    # a strict crop differs from the full image
    crop = decode_rrc(data, 64, (0.25, 0.25, 0.5, 0.5))
    assert np.abs(full.astype(int) - crop.astype(int)).mean() > 1.0
    # horizontal flip mirrors columns
    flipped = decode_rrc(data, 64, (0.0, 0.0, 1.0, 1.0), flip=True)
    np.testing.assert_array_equal(flipped, full[:, ::-1])


def test_decode_rrc_batch_and_pil_agree_roughly():
    from xtagclip_tpu.data.native import (
        _pil_decode_rrc,
        decode_rrc_batch,
        native_available,
        sample_rrc_boxes,
    )

    rng = np.random.default_rng(0)
    jpegs = [_jpeg(h=100, w=140, seed=i) for i in range(6)]
    boxes = sample_rrc_boxes(rng, 6)
    assert boxes.shape == (6, 4)
    assert (boxes[:, 2] > 0).all() and (boxes[:, :2] >= 0).all()
    assert (boxes[:, 0] + boxes[:, 2] <= 1.0001).all()
    out = decode_rrc_batch(jpegs, 64, boxes)
    assert out.shape == (6, 64, 64, 3)
    assert out.any(axis=(1, 2, 3)).all()  # every slot decoded
    if native_available():
        pil = _pil_decode_rrc(jpegs[0], 64, boxes[0], False)
        diff = np.abs(out[0].astype(float) - pil.astype(float)).mean()
        assert diff < 16.0, diff  # bilinear + IFAST DCT vs PIL


def test_rrc_box_scale_distribution():
    from xtagclip_tpu.data.native import sample_rrc_boxes

    rng = np.random.default_rng(1)
    boxes = sample_rrc_boxes(rng, 500)
    areas = boxes[:, 2] * boxes[:, 3]
    # reference RandomResizedCrop(scale=(0.9, 1.0)) on unit area
    assert areas.min() > 0.85 and areas.max() <= 1.0001
    ratios = boxes[:, 2] / boxes[:, 3]
    assert ratios.min() > 0.70 and ratios.max() < 1.40


def test_decode_native_batch_device_chain():
    """Decode-only host stage + device resize_crop_normalize == the full
    eval chain with the host stage reduced to JPEG decode. The decoded
    native crop run through the device resample must agree with PIL
    Resize(bicubic)+CenterCrop+Normalize on the same decoded pixels to
    quantization tolerance (the chain is pinned in
    tests/test_preprocess_goldens.py; this pins the decode handoff)."""
    import jax.numpy as jnp

    from xtagclip_tpu.data.transforms import EvalTransform, PreprocessCfg
    from xtagclip_tpu.ops.preprocess import resize_crop_normalize

    jpegs = [_jpeg(240, 320, seed=1), _jpeg(400, 300, seed=2)]
    out, sizes = native.decode_native_batch(jpegs, 224, (448, 448))
    assert out.shape == (2, 448, 448, 3)
    got = np.asarray(
        resize_crop_normalize(jnp.asarray(out), jnp.asarray(sizes),
                              dtype=jnp.float32))
    host = EvalTransform(PreprocessCfg(size=224), normalize_host=True)
    std = np.asarray(PreprocessCfg(size=224).std, np.float32)
    for i in range(2):
        h, w = sizes[i]
        img = Image.fromarray(out[i, :h, :w])
        want = host(img)
        err01 = np.abs(got[i] - want) * std
        assert err01.max() <= 3.5 / 255, float(err01.max())


def test_decode_square_batch_device_chain():
    """Minimum-bytes host stage (round-4 VERDICT item 5): M/8 DCT-scaled
    decode + square center-crop by memcpy, then the device resampler
    produces the final crop. Pins (a) the M/8 side arithmetic vs libjpeg,
    (b) device-path output vs the pinned host chain on the same square,
    (c) end-to-end agreement with the full-host PIL chain on the original
    image (decode-scale + crop-order effects stay within decoder noise)."""
    import jax.numpy as jnp

    from xtagclip_tpu.data.native import decode_square_batch, jpeg_dims, \
        scaled_square_side
    from xtagclip_tpu.data.transforms import EvalTransform, PreprocessCfg
    from xtagclip_tpu.ops.preprocess import resize_crop_normalize

    jpegs = [_jpeg(480, 640, seed=1), _jpeg(400, 300, seed=2)]
    out, sides = decode_square_batch(jpegs, 224)
    # 480x640: m=ceil(8*224/480)=4 -> 240; 400x300: m=6 -> ceil(300*6/8)=225
    for j, want_side in zip(jpegs, (240, 225)):
        h, w = jpeg_dims(j)
        assert scaled_square_side(h, w, 224) == want_side
    if native.native_available():  # PIL draft() does power-of-2 only
        assert list(sides) == [240, 225]
        assert out.shape == (2, 256, 256, 3)  # bucketed to /32

    sizes = np.stack([sides, sides], axis=1)
    got = np.asarray(
        resize_crop_normalize(jnp.asarray(out), jnp.asarray(sizes),
                              dtype=jnp.float32))
    cfg = PreprocessCfg(size=224)
    host = EvalTransform(cfg, normalize_host=True)
    std = np.asarray(cfg.std, np.float32)
    for i in range(2):
        s = sides[i]
        # (b) same square through the pinned host chain
        want = host(Image.fromarray(out[i, :s, :s]))
        err01 = np.abs(got[i] - want) * std
        assert err01.max() <= 3.5 / 255, float(err01.max())
        # (c) full-host chain on the full-resolution decode
        full = host(Image.open(io.BytesIO(jpegs[i])).convert("RGB"))
        diff = np.abs(got[i] - full) * std * 255
        assert np.median(diff) <= 4.0, float(np.median(diff))


def test_decode_square_batch_corrupt():
    from xtagclip_tpu.data.native import decode_square_batch

    out, sides = decode_square_batch([b"corrupt", _jpeg(96, 128)], 64)
    assert sides[0] == 0 and out[0].sum() == 0
    # 96x128 at target 64: m=ceil(8*64/96)=6 -> side=ceil(96*6/8)=72
    want = 72 if native.native_available() else 96
    assert sides[1] == want and out[1, :want, :want].mean() > 10


def test_decode_native_batch_corrupt_and_oversize():
    out, sizes = native.decode_native_batch(
        [b"corrupt", _jpeg(100, 2000, seed=3, quality=90)], 224, (640, 640))
    assert (sizes[0] == 0).all() and out[0].sum() == 0
    h, w = sizes[1]
    assert w == 640 and h == 32  # shrink-to-fit keeps aspect
    assert out[1, h:, :].sum() == 0

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

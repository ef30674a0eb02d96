"""Eval-preprocessing parity vs committed torchvision-semantics goldens.

The goldens (tests/fixtures/preprocess/, built by make_preprocess_goldens.py)
are an independent transcription of the reference transform chain
(reference transform.py:360-383 + the torchvision PIL backend): shortest /
longest / squash resize modes, bicubic + bilinear, center-crop(-or-pad),
sources chosen to hit the rounding corners (truncated long edge, round-to-even
crop offsets, pad path). Our EvalTransform must reproduce the uint8 crops
BIT-EXACTLY, and the normalize step to fp32 round-off.
"""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from xtagclip_tpu.data.transforms import (
    EvalTransform,
    PreprocessCfg,
    _normalize,
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "preprocess")

IMAGES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "img_*.png")))
assert IMAGES, "run tests/make_preprocess_goldens.py first"


def _golden(i):
    return np.load(os.path.join(FIXTURE_DIR, f"golden_{i}.npz"))


@pytest.mark.parametrize("i", range(len(IMAGES)))
@pytest.mark.parametrize("key,mode,interp", [
    ("shortest_bicubic", "shortest", "bicubic"),
    ("longest_bicubic", "longest", "bicubic"),
    ("squash_bicubic", "squash", "bicubic"),
    ("shortest_bilinear", "shortest", "bilinear"),
])
def test_eval_crop_bit_exact(i, key, mode, interp):
    img = Image.open(IMAGES[i])
    cfg = PreprocessCfg(size=224, resize_mode=mode, interpolation=interp)
    out = EvalTransform(cfg, normalize_host=False)(img)
    golden = _golden(i)[key]
    assert out.dtype == np.uint8 and out.shape == (224, 224, 3)
    mismatch = int((out != golden).sum())
    np.testing.assert_array_equal(
        out, golden, err_msg=f"{key} on {os.path.basename(IMAGES[i])}: "
                             f"{mismatch} byte mismatches")


def test_normalize_matches_totensor_normalize():
    """ToTensor (/255) + Normalize((x-mean)/std), OPENAI constants
    (reference constants.py:1-2, transform.py:305)."""
    golden = _golden(0)["shortest_bicubic"]
    cfg = PreprocessCfg(size=224)
    ours = _normalize(golden, cfg.mean, cfg.std)
    expected = (golden.astype(np.float64) / 255.0
                - np.asarray(cfg.mean)) / np.asarray(cfg.std)
    np.testing.assert_allclose(ours, expected, atol=1e-6)
    # and the full host-normalized transform path agrees with crop+normalize
    img = Image.open(IMAGES[0])
    full = EvalTransform(cfg, normalize_host=True)(img)
    np.testing.assert_allclose(full, ours, atol=1e-6)


def test_pallas_normalize_matches_reference_impl():
    """Gridded Pallas normalize kernel (one image per grid step) matches the
    plain jnp implementation (regression: the un-gridded kernel put the whole
    batch in one VMEM block, which cannot compile at production sizes)."""
    import jax.numpy as jnp
    import numpy as np

    from xtagclip_tpu.ops.preprocess import (
        normalize_images,
        normalize_images_pallas,
    )

    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(4, 32, 32, 3)).astype(np.uint8)
    a = np.asarray(normalize_images(jnp.asarray(x), dtype=jnp.float32))
    b = np.asarray(normalize_images_pallas(jnp.asarray(x), dtype=jnp.float32,
                                           interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Device-side resize+crop+normalize (ops/preprocess.resize_crop_normalize):
# the whole eval chain (reference transform.py:360-383) on device, leaving
# the host decode-only.

_DEVICE_SIZES = [(320, 480), (500, 375), (224, 224), (100, 80), (513, 511),
                 (224, 931)]


def _rand_img(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("interp", ["bicubic", "bilinear"])
@pytest.mark.parametrize("mode", ["shortest", "squash"])
def test_device_resize_crop_matches_host_chain(interp, mode):
    """Device path vs the bit-exact host EvalTransform across native sizes
    (down/up-scale, odd dims, extreme aspect). Tolerance 3/255 on the 0..1
    scale before /std: PIL rounds the horizontal pass to uint8 and runs
    int16 fixed-point filters, the device path is fp32 end-to-end — every
    disagreement is quantization, and the MEAN disagreement must stay well
    under one uint8 step."""
    import jax.numpy as jnp

    from xtagclip_tpu.ops.preprocess import (
        pad_images_for_device,
        resize_crop_normalize,
    )

    cfg = PreprocessCfg(size=224, resize_mode=mode, interpolation=interp)
    host = EvalTransform(cfg, normalize_host=True)
    arrs = [_rand_img(h, w, 7 * i) for i, (h, w) in enumerate(_DEVICE_SIZES)]
    want = np.stack([host(Image.fromarray(a)) for a in arrs])

    padded, sizes = pad_images_for_device(arrs)
    got = np.asarray(
        resize_crop_normalize(jnp.asarray(padded), jnp.asarray(sizes),
                              out_size=224, resize_mode=mode,
                              interpolation=interp, dtype=jnp.float32))
    assert got.shape == want.shape == (len(arrs), 224, 224, 3)
    std = np.asarray(cfg.std, np.float32)
    err01 = np.abs(got - want) * std  # back to the 0..1 pixel scale
    assert err01.max() <= 3.5 / 255, float(err01.max())
    assert err01.mean() <= 0.35 / 255, float(err01.mean())


def test_device_resize_identity_is_exact():
    """A 224x224 input under shortest mode skips the resample on the host
    (short side already at target); the device filter matrix reduces to the
    identity (bicubic interpolates exactly on the grid), so the outputs
    must agree to fp32 round-off, not just quantization tolerance."""
    import jax.numpy as jnp

    from xtagclip_tpu.ops.preprocess import (
        pad_images_for_device,
        resize_crop_normalize,
    )

    a = _rand_img(224, 224, 3)
    cfg = PreprocessCfg(size=224)
    want = EvalTransform(cfg, normalize_host=True)(Image.fromarray(a))
    padded, sizes = pad_images_for_device([a])
    got = np.asarray(
        resize_crop_normalize(jnp.asarray(padded), jnp.asarray(sizes),
                              dtype=jnp.float32))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_device_resize_padding_invariant():
    """Zero-padding rows/cols beyond the true size must not leak into the
    output: the same image padded into two different buckets produces
    identical crops."""
    import jax.numpy as jnp

    from xtagclip_tpu.ops.preprocess import resize_crop_normalize

    a = _rand_img(300, 260, 11)
    outs = []
    for hp, wp in [(320, 320), (448, 512)]:
        padded = np.zeros((1, hp, wp, 3), np.uint8)
        padded[0, :300, :260] = a
        sizes = np.asarray([[300, 260]], np.int32)
        outs.append(np.asarray(
            resize_crop_normalize(jnp.asarray(padded), jnp.asarray(sizes),
                                  dtype=jnp.float32)))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_pad_images_for_device_contract():
    from xtagclip_tpu.ops.preprocess import pad_images_for_device

    padded, sizes = pad_images_for_device(
        [_rand_img(100, 130, 0), _rand_img(65, 64, 1)])
    assert padded.shape == (2, 128, 192, 3)  # maxima rounded to 64
    assert sizes.tolist() == [[100, 130], [65, 64]]
    assert padded[1, 65:, :].sum() == 0
    with pytest.raises(ValueError):
        pad_images_for_device([_rand_img(8, 2000, 2)])
    with pytest.raises(ValueError):
        pad_images_for_device([])

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

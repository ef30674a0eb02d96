"""Generate preprocessing golden fixtures (committed to tests/fixtures/).

This is an INDEPENDENT transcription of the reference eval preprocessing
chain's math (reference transform.py:360-383 + the torchvision PIL backend it
delegates to), kept deliberately separate from xtagclip_tpu.data.transforms so
the committed goldens are an oracle for it, not an echo of it:

- shortest (square): torchvision Resize(int) — shortest edge to target, long
  edge int-TRUNCATED (torchvision _compute_resized_output_size), then
  torchvision CenterCrop — pad floor/ceil split if small, crop offsets
  int(round(diff/2)).
- longest: reference ResizeKeepRatio(longest=1) (transform.py:126-143) —
  ratio = max(h/th, w/tw), size = round(dim/ratio) — then center_crop_or_pad
  (transform.py:167-205).
- squash: torchvision Resize((h, w)) exact.

torchvision's PIL code path performs these with PIL.Image.resize / crop /
ImageOps.expand, which is what runs here; the goldens are therefore valid
reference outputs for any environment with the same PIL (this image).

Run: python tests/make_preprocess_goldens.py    (rewrites the fixtures)
"""

import os

import numpy as np
from PIL import Image, ImageOps

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "preprocess")

# (height, width) source shapes — odd sizes chosen to exercise the rounding
# corners: truncation on the resized long edge, round-to-even crop offsets,
# and the pad path (sources smaller than target)
SOURCE_SHAPES = [(197, 283), (311, 150), (224, 224), (375, 500), (80, 100)]
TARGET = 224


def make_image(h, w, seed):
    """Deterministic smooth-ish RGB test image (compresses well as PNG)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            127 + 90 * np.sin(xx / 17.0 + seed) * np.cos(yy / 23.0),
            127 + 90 * np.cos(xx / 29.0) * np.sin(yy / 13.0 + seed),
            (255.0 * (xx + yy) / (h + w)),
        ],
        axis=-1,
    )
    noise = rng.normal(0, 12, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# --- literal torchvision-on-PIL transcriptions ------------------------------

def tv_resize_shortest(img: Image.Image, size: int, resample) -> Image.Image:
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == size:
        return img
    new_short, new_long = size, int(size * long / short)
    nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((nw, nh), resample)


def tv_center_crop(img: Image.Image, size: int, fill=0) -> Image.Image:
    w, h = img.size
    if size > w or size > h:
        ltrb = (
            (size - w) // 2 if size > w else 0,
            (size - h) // 2 if size > h else 0,
            (size - w + 1) // 2 if size > w else 0,
            (size - h + 1) // 2 if size > h else 0,
        )
        img = ImageOps.expand(img, ltrb, fill=fill)
        w, h = img.size
        if w == size and h == size:
            return img
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def ref_keep_ratio_longest(img: Image.Image, size: int, resample) -> Image.Image:
    w, h = img.size
    ratio = max(h / size, w / size)
    nh, nw = round(h / ratio), round(w / ratio)
    return img.resize((nw, nh), resample)


def eval_chain(img: Image.Image, mode: str, size: int, resample) -> np.ndarray:
    if mode == "shortest":
        out = tv_center_crop(tv_resize_shortest(img, size, resample), size)
    elif mode == "longest":
        out = tv_center_crop(ref_keep_ratio_longest(img, size, resample), size)
    elif mode == "squash":
        out = img.resize((size, size), resample)
    else:
        raise ValueError(mode)
    return np.asarray(out.convert("RGB"), dtype=np.uint8)


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    manifest = {}
    for i, (h, w) in enumerate(SOURCE_SHAPES):
        arr = make_image(h, w, seed=i)
        img_path = os.path.join(FIXTURE_DIR, f"img_{i}_{h}x{w}.png")
        Image.fromarray(arr).save(img_path)
        img = Image.open(img_path)  # golden from the DECODED png, like the test
        goldens = {}
        for mode in ("shortest", "longest", "squash"):
            goldens[f"{mode}_bicubic"] = eval_chain(
                img, mode, TARGET, Image.BICUBIC)
        goldens["shortest_bilinear"] = eval_chain(
            img, "shortest", TARGET, Image.BILINEAR)
        np.savez_compressed(
            os.path.join(FIXTURE_DIR, f"golden_{i}.npz"), **goldens)
        manifest[f"img_{i}"] = dict(shape=(h, w), file=os.path.basename(img_path))
        print(f"img_{i}: {h}x{w} -> 4 goldens")
    print("fixtures written to", FIXTURE_DIR)


if __name__ == "__main__":
    main()

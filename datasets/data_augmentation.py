"""Class-balancing offline augmentation (reference datasets/data_augmentation.py):
per-image-deterministic spatial augmentation (h/v flips p=0.5, rotation ±30°,
scale 0.8-1.2 with center-crop/pad back) applied until every class reaches the
target count; writes augmented images + a '*_augmented.csv'. Pure PIL/numpy.

Usage:
  python datasets/data_augmentation.py --csv labels.csv --img-dir data/ \
      --output-dir data_aug/ [--target-per-class N] [--seed 42]
"""

from __future__ import annotations

import argparse
import os
import random
import zlib
from collections import Counter

import numpy as np
import pandas as pd
from PIL import Image


class SpatialAugmentation:
    """Deterministic per-(seed, index) spatial transform."""

    def __init__(self, flip_prob=0.5, rotation_degrees=30,
                 scale_range=(0.8, 1.2), seed=None):
        self.flip_prob = flip_prob
        self.rotation_degrees = rotation_degrees
        self.scale_range = scale_range
        self.seed = seed

    def __call__(self, img: Image.Image, index: int = 0) -> Image.Image:
        rng = random.Random(None if self.seed is None else self.seed + index)
        if rng.random() < self.flip_prob:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if rng.random() < self.flip_prob:
            img = img.transpose(Image.FLIP_TOP_BOTTOM)
        angle = rng.uniform(-self.rotation_degrees, self.rotation_degrees)
        img = img.rotate(angle, resample=Image.BILINEAR, expand=False)
        scale = rng.uniform(*self.scale_range)
        w, h = img.size
        nw, nh = int(w * scale), int(h * scale)
        img = img.resize((nw, nh), Image.BILINEAR)
        if scale >= 1.0:
            left, top = (nw - w) // 2, (nh - h) // 2
            img = img.crop((left, top, left + w, top + h))
        else:
            canvas = Image.new(img.mode, (w, h))
            canvas.paste(img, ((w - nw) // 2, (h - nh) // 2))
            img = canvas
        return img


def class_balanced_augment_and_save(
    csv_file: str,
    img_dir: str,
    output_dir: str,
    target_samples_per_class=None,
    max_augment_per_img: int = 10,
    output_csv=None,
    seed=None,
    class_column: str = "Class",
    name_column: str = "Name",
):
    os.makedirs(output_dir, exist_ok=True)
    df = pd.read_csv(csv_file)
    counts = Counter(df[class_column])
    target = target_samples_per_class or max(counts.values())
    print(f"class counts: {dict(counts)}; target per class: {target}")

    aug = SpatialAugmentation(seed=seed)
    new_rows = []
    for cls, count in counts.items():
        needed = max(0, target - count)
        if needed == 0:
            continue
        class_rows = df[df[class_column] == cls].reset_index(drop=True)
        rng = random.Random(seed)
        produced = 0
        per_img = Counter()
        while produced < needed:
            ridx = rng.randrange(len(class_rows))
            row = class_rows.iloc[ridx]
            if per_img[ridx] >= max_augment_per_img:
                if all(per_img[i] >= max_augment_per_img
                       for i in range(len(class_rows))):
                    print(f"class {cls}: max_augment_per_img cap hit "
                          f"({produced}/{needed})")
                    break
                continue
            per_img[ridx] += 1
            name = str(row[name_column])
            src = os.path.join(img_dir, name)
            try:
                img = Image.open(src).convert("RGB")
            except OSError as e:
                print(f"skip {src}: {e}")
                continue
            # stable hash: builtin hash() is salted per process, which would
            # break the per-image-deterministic (--seed) contract
            name_h = zlib.crc32(str(name).encode()) % 10_000
            out = aug(img, index=produced + name_h)
            stem, ext = os.path.splitext(name)
            new_name = f"{stem}_aug{per_img[ridx]}{ext or '.png'}"
            out.save(os.path.join(output_dir, new_name))
            new_row = row.copy()
            new_row[name_column] = new_name
            new_rows.append(new_row)
            produced += 1
        print(f"class {cls}: +{produced} augmented")

    out_df = pd.concat([df, pd.DataFrame(new_rows)], ignore_index=True)
    if output_csv is None:
        stem, ext = os.path.splitext(csv_file)
        output_csv = f"{stem}_augmented{ext}"
    out_df.to_csv(output_csv, index=False)
    print(f"wrote {output_csv} ({len(out_df)} rows)")
    return output_csv


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--img-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--target-per-class", type=int, default=None)
    p.add_argument("--max-augment-per-img", type=int, default=10)
    p.add_argument("--output-csv", default=None)
    p.add_argument("--seed", type=int, default=None)
    a = p.parse_args()
    class_balanced_augment_and_save(
        a.csv, a.img_dir, a.output_dir, a.target_per_class,
        a.max_augment_per_img, a.output_csv, a.seed,
    )

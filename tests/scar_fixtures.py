"""Generate a tiny on-disk scar dataset (images + CSV + label_info.json)
matching the reference data contract (dataloader_other.py:63-253)."""

import json
import os

import numpy as np
from PIL import Image

LABEL_INFO = {
    "Width": ["Linear", "Widened", "Linear bulging"],
    "Color": ["Normal", "Pink", "Red", "Purple"],
    "Pigmentation": ["Normal", "Pigmented", "Hypopigmented"],
    "Surface": ["Flat", "Hypertrophic", "Keloid", "Atrophic"],
    "Irregular_color": ["no", "mild", "moderate", "severe"],
    "Irregular_height": ["no", "mild", "moderate", "severe"],
}


def make_scar_dataset(root, n: int = 12, image_size: int = 48, seed: int = 0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    with open(os.path.join(root, "label_info.json"), "w") as f:
        json.dump(LABEL_INFO, f)
    rows = ["Name,Class,Use,Width,Color,Pigmentation,Surface,"
            "Irregular_color,Irregular_height"]
    for i in range(n):
        name = f"scar_{i:03d}.png"
        img = rng.integers(0, 256, (image_size, image_size, 3)).astype("uint8")
        Image.fromarray(img).save(os.path.join(root, name))
        cls = int(rng.integers(1, 4))
        attrs = [str(LABEL_INFO[k][rng.integers(0, len(LABEL_INFO[k]))])
                 for k in LABEL_INFO]
        rows.append(f"{name},{cls},yes," + ",".join(attrs))
    # one row filtered out by Use != yes, one with missing attrs dropped by dropna
    rows.append(f"scar_skip.png,1,no," + ",".join(["Linear", "Normal", "Normal",
                                                   "Flat", "no", "no"]))
    csv_path = os.path.join(root, "labels.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return csv_path

"""Generic datasets: CSV (img+caption), synthetic, image-folder, PathMNIST.

Contracts mirror reference open_clip_train/data.py:29-47 (CsvDataset),
:476-523 (SyntheticDataset) and others/dataloader_other.py:16-60
(PathMNISTDataset '{class}-{id}.ext' directory listing).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp",
)


def default_loader(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


class CsvDataset:
    """CSV of (image path, caption); returns (image, token_row)."""

    def __init__(self, input_filename, transforms, img_key, caption_key,
                 sep="\t", tokenizer=None):
        import pandas as pd

        df = pd.read_csv(input_filename, sep=sep)
        self.images = df[img_key].tolist()
        self.captions = df[caption_key].tolist()
        self.transforms = transforms
        self.tokenize = tokenizer

    def __len__(self):
        return len(self.captions)

    def __getitem__(self, idx):
        image = self.transforms(default_loader(str(self.images[idx])))
        texts = self.tokenize([str(self.captions[idx])])[0]
        return image, np.asarray(texts, dtype=np.int32)


class SyntheticDataset:
    """Blank image + 'Dummy caption' fake backend (reference data.py:476-523):
    the train-loop smoke test that needs no data on disk."""

    def __init__(self, transform=None, image_size=(224, 224), caption="Dummy caption",
                 dataset_size: int = 100, tokenizer=None):
        self.transform = transform
        self.image_size = image_size
        self.caption = caption
        self.dataset_size = dataset_size
        self.tokenize = tokenizer
        self.image = Image.new("RGB", image_size)
        self.preprocessed = (
            transform(self.image) if transform is not None else None
        )

    def __len__(self):
        return self.dataset_size

    def __getitem__(self, idx):
        img = self.preprocessed
        if img is None:
            img = np.zeros((*self.image_size, 3), np.float32)
        texts = self.tokenize([self.caption])[0]
        return img, np.asarray(texts, dtype=np.int32)


class ImageFolderDataset:
    """torchvision.ImageFolder equivalent: root/class_x/img.ext."""

    def __init__(self, root, transform=None, loader=default_loader):
        self.root = root
        self.transform = transform
        self.loader = loader
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.classes = classes
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fname in sorted(os.listdir(cdir)):
                if fname.lower().endswith(IMG_EXTENSIONS):
                    self.samples.append((os.path.join(cdir, fname),
                                         self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        path, target = self.samples[idx]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        return img, target


class PathMNISTDataset:
    """Flat directory of '{class}-{id}.tif' files (dataloader_other.py:16-60)."""

    def __init__(self, root, transform=None, target_transform=None,
                 loader=default_loader):
        self.root = root
        self.transform = transform
        self.target_transform = target_transform
        self.loader = loader
        samples = []
        for fname in os.listdir(root):
            if fname.lower().endswith(IMG_EXTENSIONS) and "-" in fname:
                samples.append((os.path.join(root, fname), fname.split("-")[0]))
        if not samples:
            raise RuntimeError(
                f"Found 0 files in {root}. Supported: {','.join(IMG_EXTENSIONS)}"
            )
        classes = sorted({s[1] for s in samples})
        self.classes = classes
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.imgs = [(p, self.class_to_idx[c]) for p, c in samples]

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, idx):
        path, target = self.imgs[idx]
        img = self.loader(path)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target

"""Offline data-prep tooling (reference datasets/train_val.py:5-74 and
datasets/data_augmentation.py): stratified split invariants and
class-balanced augmentation output contract."""

import importlib.util
import os

import numpy as np
import pandas as pd
from PIL import Image

# the repo's datasets/ dir is shadowed by the installed HF `datasets`
# package; load the tool modules by file path
_DSDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "datasets")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"xtag_{name}", os.path.join(_DSDIR, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_aug_mod = _load("data_augmentation")
SpatialAugmentation = _aug_mod.SpatialAugmentation
class_balanced_augment_and_save = _aug_mod.class_balanced_augment_and_save
split_csv_by_class = _load("train_val").split_csv_by_class


def _make_csv(path, counts):
    rows = []
    for cls, n in counts.items():
        for i in range(n):
            rows.append({"Name": f"c{cls}_{i}.png", "Class": cls,
                         "Use": "yes"})
    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df


def test_split_is_stratified_and_disjoint(tmp_path):
    src = tmp_path / "labels.csv"
    _make_csv(src, {1: 20, 2: 10, 3: 5})
    train_csv, val_csv = tmp_path / "train.csv", tmp_path / "val.csv"
    train_df, val_df = split_csv_by_class(str(src), str(train_csv),
                                          str(val_csv), test_size=0.2)
    # per-class 80/20 (floor on the val side, matching the reference)
    for cls, n in {1: 20, 2: 10, 3: 5}.items():
        v = (val_df["Class"] == cls).sum()
        t = (train_df["Class"] == cls).sum()
        assert v == int(n * 0.2), (cls, v)
        assert t + v == n
    # no row lost or duplicated across the two files
    names = pd.concat([train_df, val_df])["Name"]
    assert names.is_unique and len(names) == 35
    assert train_csv.exists() and val_csv.exists()


def test_split_deterministic_same_seed(tmp_path):
    src = tmp_path / "labels.csv"
    _make_csv(src, {1: 16, 2: 8})
    a_tr, a_va = split_csv_by_class(str(src), str(tmp_path / "a_tr.csv"),
                                    str(tmp_path / "a_va.csv"),
                                    random_seed=42)
    b_tr, b_va = split_csv_by_class(str(src), str(tmp_path / "b_tr.csv"),
                                    str(tmp_path / "b_va.csv"),
                                    random_seed=42)
    pd.testing.assert_frame_equal(a_tr, b_tr)
    pd.testing.assert_frame_equal(a_va, b_va)


def test_spatial_augmentation_deterministic_and_shape_preserving():
    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 256, (40, 56, 3)).astype("uint8"))
    aug = SpatialAugmentation(seed=7)
    a = np.asarray(aug(img, index=3))
    b = np.asarray(aug(img, index=3))
    c = np.asarray(aug(img, index=4))
    assert a.shape == (40, 56, 3)  # scale crop/pad restores the input size
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_class_balanced_augment_and_save(tmp_path):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.default_rng(1)
    csv_path = tmp_path / "labels.csv"
    df = _make_csv(csv_path, {1: 6, 2: 2, 3: 1})
    for name in df["Name"]:
        Image.fromarray(
            rng.integers(0, 256, (32, 32, 3)).astype("uint8")
        ).save(img_dir / name)

    out_dir = tmp_path / "aug"
    out_csv = class_balanced_augment_and_save(
        str(csv_path), str(img_dir), str(out_dir), seed=42,
    )
    out_df = pd.read_csv(out_csv)
    # every class equalized to the majority count
    assert dict(out_df["Class"].value_counts()) == {1: 6, 2: 6, 3: 6}
    # augmented rows point at files that exist in the output dir
    new = out_df[~out_df["Name"].isin(df["Name"])]
    assert len(new) == 9
    for name in new["Name"]:
        assert (out_dir / name).exists(), name
        assert "_aug" in name
    # originals kept verbatim at the head of the CSV
    pd.testing.assert_frame_equal(out_df.iloc[: len(df)].reset_index(drop=True),
                                  df)


def test_augment_respects_per_image_cap(tmp_path, capsys):
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    csv_path = tmp_path / "labels.csv"
    df = _make_csv(csv_path, {1: 5, 2: 1})
    rng = np.random.default_rng(2)
    for name in df["Name"]:
        Image.fromarray(
            rng.integers(0, 256, (16, 16, 3)).astype("uint8")
        ).save(img_dir / name)
    out_csv = class_balanced_augment_and_save(
        str(csv_path), str(img_dir), str(tmp_path / "aug"),
        max_augment_per_img=2, seed=0,
    )
    out_df = pd.read_csv(out_csv)
    # class 2 has one source image capped at 2 augmentations: 1 + 2 = 3 < 5
    assert (out_df["Class"] == 2).sum() == 3
    assert "cap hit" in capsys.readouterr().out

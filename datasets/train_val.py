"""Stratified train/val CSV splitter (reference datasets/train_val.py:5-74):
per-class shuffle with seed 42, 80/20 split, two output CSVs.

Usage:
  python datasets/train_val.py --input labels.csv --train train.csv --val val.csv
"""

from __future__ import annotations

import argparse
import random

import pandas as pd


def split_csv_by_class(input_csv_path, train_csv_path, val_csv_path,
                       test_size: float = 0.2, random_seed: int = 42,
                       class_column: str = "Class"):
    random.seed(random_seed)
    df = pd.read_csv(input_csv_path)
    if class_column not in df.columns:
        raise ValueError(
            f"class column {class_column!r} not found; have {list(df.columns)}"
        )

    counts = df[class_column].value_counts()
    print("samples per class:")
    for cls, count in counts.items():
        print(f"- class {cls}: {count}")

    train_dfs, val_dfs = [], []
    for cls in df[class_column].unique():
        class_df = df[df[class_column] == cls].reset_index(drop=True)
        indices = list(range(len(class_df)))
        random.shuffle(indices)
        val_size = int(len(indices) * test_size)
        val_dfs.append(class_df.iloc[indices[:val_size]].reset_index(drop=True))
        train_dfs.append(
            class_df.iloc[indices[val_size:]].reset_index(drop=True)
        )

    train_df = pd.concat(train_dfs, ignore_index=True)
    val_df = pd.concat(val_dfs, ignore_index=True)
    train_df.to_csv(train_csv_path, index=False)
    val_df.to_csv(val_csv_path, index=False)
    print(f"split {len(df)} rows -> train {len(train_df)} "
          f"({len(train_df) / len(df) * 100:.1f}%), "
          f"val {len(val_df)} ({len(val_df) / len(df) * 100:.1f}%)")
    return train_df, val_df


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--train", required=True)
    p.add_argument("--val", required=True)
    p.add_argument("--test-size", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--class-column", default="Class")
    a = p.parse_args()
    split_csv_by_class(a.input, a.train, a.val, a.test_size, a.seed,
                       a.class_column)

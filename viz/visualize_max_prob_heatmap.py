"""Per-(class, tag-group) mean max-probability heatmap.

Equivalent of reference visualize_max_prob_heatmap.py: consumes the class
output (with per-sample score vectors) and tagging output, computes the mean
of the per-sample max softmax probability per (gt class, tag group) cell, and
writes a heatmap PNG + CSV.

Usage:
  python viz/visualize_max_prob_heatmap.py \
      --class-file val_data_class_output.txt \
      --tag-file val_data_tagging_output.txt --output-dir viz_out
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_outputs import TAG_GROUPS, parse_class_data, parse_tagging_data  # noqa: E402


def softmax(x):
    x = np.asarray(x, np.float64)
    x = x - x.max()
    e = np.exp(x)
    return e / e.sum()


def build_heatmap(class_data, tagging_data):
    groups = list(TAG_GROUPS)
    cells = defaultdict(list)  # (cls, group) -> [max prob]
    classes = sorted({c["gt_class"] for c in class_data})
    for c, t in zip(class_data, tagging_data):
        if c["scores"] is None:
            continue
        p = float(softmax(c["scores"]).max())
        for group in groups:
            if t["pred_tags"].get(group) is not None:
                cells[(c["gt_class"], group)].append(p)
    mat = np.full((len(classes), len(groups)), np.nan)
    for i, cls in enumerate(classes):
        for j, g in enumerate(groups):
            vals = cells.get((cls, g))
            if vals:
                mat[i, j] = float(np.mean(vals))
    return classes, groups, mat


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--class-file", required=True)
    p.add_argument("--tag-file", required=True)
    p.add_argument("--output-dir", default="viz_output")
    p.add_argument("--class-start", type=int, default=0)
    p.add_argument("--class-end", type=int, default=None)
    p.add_argument("--tag-start", type=int, default=0)
    p.add_argument("--tag-end", type=int, default=None)
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    class_data = parse_class_data(args.class_file, args.class_start,
                                  args.class_end)
    tagging_data = parse_tagging_data(args.tag_file, args.tag_start,
                                      args.tag_end)
    n = min(len(class_data), len(tagging_data))
    classes, groups, mat = build_heatmap(class_data[:n], tagging_data[:n])

    csv_path = os.path.join(args.output_dir, "max_prob_heatmap.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["class"] + groups)
        for i, cls in enumerate(classes):
            w.writerow([cls] + [f"{v:.4f}" if np.isfinite(v) else ""
                                for v in mat[i]])
    print(f"saved {csv_path}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(np.nan_to_num(mat), cmap="viridis", vmin=0, vmax=1)
    ax.set_xticks(range(len(groups)))
    ax.set_xticklabels(groups, rotation=25, ha="right", fontsize=8)
    ax.set_yticks(range(len(classes)))
    ax.set_yticklabels(classes, fontsize=8)
    for i in range(len(classes)):
        for j in range(len(groups)):
            if np.isfinite(mat[i, j]):
                ax.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center",
                        color="w", fontsize=7)
    fig.colorbar(im, ax=ax, shrink=0.8)
    ax.set_title("Mean max class probability per (class, tag group)")
    fig.tight_layout()
    png_path = os.path.join(args.output_dir, "max_prob_heatmap.png")
    fig.savefig(png_path, dpi=120)
    plt.close(fig)
    print(f"saved {png_path}")


if __name__ == "__main__":
    main()

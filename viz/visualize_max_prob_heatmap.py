"""Per-(class, tag-group) tag-accuracy heatmap.

Chart-for-chart equivalent of reference visualize_max_prob_heatmap.py: despite
the name, the reference computes the MEAN PER-GROUP TAG ACCURACY — for every
sample whose GT and predicted tag sets both carry a group, score 1 if they
agree, 0 otherwise, averaged per (gt class, group) (reference :217-249).
Emits

  scar_tag_max_prob_heatmap.png   (classes x 6 groups, annotated, [0,1])
  scar_tag_max_prob_data.csv      (same matrix, pandas-style: index=class)

Usage:
  python viz/visualize_max_prob_heatmap.py \
      --class-file val_data_class_output.txt \
      --tag-file val_data_tagging_output.txt --output-dir viz_out
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_outputs import (  # noqa: E402
    merge_data,
    parse_class_data,
    parse_tagging_data,
    tag_accuracy_matrix,
)


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
    merged = merge_data(class_data, tagging_data)
    acc, classes, groups = tag_accuracy_matrix(merged)
    classes = classes[:3]  # the reference caps the heatmap at 3 classes
    mat = np.array([[acc[c][g] for g in groups] for c in classes])

    csv_path = os.path.join(args.output_dir, "scar_tag_max_prob_data.csv")
    with open(csv_path, "w", newline="") as f:
        f.write("," + ",".join(groups) + "\n")
        for i, cls in enumerate(classes):
            f.write(cls + "," + ",".join(str(v) for v in mat[i]) + "\n")
    print(f"saved {csv_path}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 7))
    ax.imshow(mat, cmap="YlGnBu", vmin=0, vmax=1, aspect="auto")
    ax.set_xticks(range(len(groups)))
    ax.set_xticklabels(groups, fontsize=15)
    ax.set_yticks(range(len(classes)))
    ax.set_yticklabels(classes, fontsize=15)
    for i in range(len(classes)):
        for j in range(len(groups)):
            ax.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center",
                    fontsize=15,
                    color="white" if mat[i, j] > 0.6 else "black")
    fig.tight_layout()
    png_path = os.path.join(args.output_dir, "scar_tag_max_prob_heatmap.png")
    fig.savefig(png_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {png_path}")


if __name__ == "__main__":
    main()

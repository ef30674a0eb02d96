"""Tag/class distribution charts from eval text artifacts.

Chart-for-chart equivalent of reference visualize_tag_class_distribution.py:
consumes the "gt - pred" class/tagging output files and emits

  scar_class_distribution_by_{category}.png  (x6, reference :161-296)
      per tag value: a GT bar (stacked by GT class) beside a Pred bar
      (stacked by predicted class)
  combined_scar_class_distribution.png       (reference :298-428)
      the same chart over all 22 category:tag values on one axis

Usage:
  python viz/visualize_tag_class_distribution.py \
      --tag-file val_data_tagging_output.txt \
      --class-file val_data_class_output.txt --output-dir viz_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_outputs import (  # noqa: E402
    SCAR_CLASSES,
    TAG_GROUPS,
    class_distribution_by_category,
    merge_data,
    parse_class_data,
    parse_tagging_data,
)


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


# file names use underscores for the two Irregular categories (reference
# tag_categories keys 'Irregular_Color'/'Irregular_Height')
def _file_key(category: str) -> str:
    return category.replace(" ", "_")


def _wrap_tag_name(tag_name: str) -> str:
    """Two-line x labels for long names (reference :186-202)."""
    if ":" in tag_name:
        category, tag = tag_name.split(":", 1)
    else:
        category, tag = "", tag_name
    if len(tag) > 12 and " " in tag:
        parts = tag.split(" ")
        if len(parts) >= 3:
            return f"{category}:\n{parts[0]} {parts[1]}\n{' '.join(parts[2:])}"
        return f"{category}:\n" + "\n".join(parts)
    return f"{category}:\n{tag}"


def _paired_colors():
    plt = _plt()
    pal = plt.cm.Paired.colors  # matches seaborn's "Paired"
    return [pal[0], pal[2], pal[6]], [pal[1], pal[3], pal[7]]


def _plot_gt_pred_stacked(gt_dist, pred_dist, tag_values, out_path,
                          figsize, rotation=0, fontsize=10):
    plt = _plt()
    import numpy as np

    gt_colors, pred_colors = _paired_colors()
    plt.figure(figsize=figsize)
    w = 0.4
    idx = np.arange(len(tag_values))
    bottoms_gt = np.zeros(len(tag_values))
    bottoms_pred = np.zeros(len(tag_values))
    for i, cls in enumerate(SCAR_CLASSES):
        vals = [gt_dist[t][cls] for t in tag_values]
        plt.bar(idx - w / 2, vals, w, label=f"GT {cls}", bottom=bottoms_gt,
                color=gt_colors[i])
        bottoms_gt += vals
    for i, cls in enumerate(SCAR_CLASSES):
        vals = [pred_dist[t][cls] for t in tag_values]
        plt.bar(idx + w / 2, vals, w, label=f"Pred {cls}",
                bottom=bottoms_pred, color=pred_colors[i])
        bottoms_pred += vals
    plt.xlabel("feature", fontsize=12)
    plt.ylabel("number", fontsize=12)
    plt.xticks(idx, [_wrap_tag_name(t) for t in tag_values],
               rotation=rotation, ha="right" if rotation else "center",
               fontsize=fontsize)
    plt.ylim(bottom=0)
    if bottoms_gt.max() == 0 and bottoms_pred.max() == 0:
        plt.ylim(top=1)
    plt.legend(fontsize=10)
    plt.tight_layout()
    plt.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close()
    print(f"saved {out_path}")


def create_stacked_bar_charts(merged, output_dir, prefix=""):
    """One GT/Pred stacked chart per tag category (reference :161-296)."""
    paths = []
    for category in TAG_GROUPS:
        gt_dist, pred_dist = class_distribution_by_category(merged, category)
        name = f"scar_class_distribution_by_{_file_key(category)}.png"
        if prefix:
            name = f"{prefix}_{name}"
        path = os.path.join(output_dir, name)
        _plot_gt_pred_stacked(gt_dist, pred_dist, list(TAG_GROUPS[category]),
                              path, figsize=(14, 8))
        paths.append(path)
    return paths


def create_combined_chart(merged, output_dir, prefix=""):
    """All 22 category:tag values on one axis (reference :298-428)."""
    all_tags, gt_dist, pred_dist = [], {}, {}
    for category in TAG_GROUPS:
        g, p = class_distribution_by_category(merged, category)
        for tag in TAG_GROUPS[category]:
            key = f"{category.replace(' ', '_')}:{tag}"
            all_tags.append(key)
            gt_dist[key], pred_dist[key] = g[tag], p[tag]
    name = "combined_scar_class_distribution.png"
    if prefix:
        name = f"{prefix}_{name}"
    path = os.path.join(output_dir, name)
    _plot_gt_pred_stacked(gt_dist, pred_dist, all_tags, path,
                          figsize=(24, 12), rotation=45, fontsize=8)
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tag-file", required=True)
    p.add_argument("--class-file", required=True)
    p.add_argument("--output-dir", default="viz_output")
    p.add_argument("--tag-start", type=int, default=0)
    p.add_argument("--tag-end", type=int, default=None)
    p.add_argument("--class-start", type=int, default=0)
    p.add_argument("--class-end", type=int, default=None)
    p.add_argument("--prefix", default="")
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    class_data = parse_class_data(args.class_file, args.class_start,
                                  args.class_end)
    tagging_data = parse_tagging_data(args.tag_file, args.tag_start,
                                      args.tag_end)
    merged = merge_data(class_data, tagging_data)
    print(f"parsed {len(merged)} aligned samples")

    create_stacked_bar_charts(merged, args.output_dir, args.prefix)
    create_combined_chart(merged, args.output_dir, args.prefix)


if __name__ == "__main__":
    main()

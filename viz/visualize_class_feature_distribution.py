"""Class-wise feature (tag) distribution charts with severity ordering.

Chart-for-chart equivalent of reference
visualize_class_feature_distribution.py (1,025 LoC, hardcoded paths — here
argparse-driven). Emits the reference's artifact set:

  analysis_results.txt                         top-10 GT/pred tags per class
  tag_distribution_{cls}.png                   per class: all 22 tags, GT vs
                                               Pred grouped bars (:260-307)
  combined_tag_distribution.png                per-class subplots of the
                                               merged top-5 GT + top-5 pred
                                               tags (:309-373)
  tag_distribution.png                         overall GT vs Pred frequency
                                               with group separators (:377-478)
  tag_group_stacked_distribution.png           per group: GT/Pred bars stacked
  tag_group_stacked_distribution_20c.png         by tag severity (:480-728;
                                               _20c = tab20c color variant)
  normalized_tag_group_distribution.png        the same stacked bars as
  normalized_tag_group_distribution_labeled.png  fractions of the group total,
                                               _labeled adds % annotations
                                               (:730-1023)

Usage:
  python viz/visualize_class_feature_distribution.py \
      --tag-file val_data_tagging_output.txt \
      --class-file val_data_class_output.txt --output-dir analysis_results
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_outputs import (  # noqa: E402
    SEVERITY_SORTED_GROUPS,
    class_tag_frequencies,
    find_tag_group,
    merge_data,
    overall_tag_frequencies,
    parse_class_data,
    parse_tagging_data,
    severity_sorted_tags,
    tag_severity_level,
)


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _wrap(tag):
    if " " in tag and len(tag) > 12:
        words = tag.split()
        if len(words) >= 3:
            return f"{words[0]} {words[1]}\n{' '.join(words[2:])}"
        return "\n".join(words)
    return tag


def get_top_tags(tag_dict, n=5):
    return sorted(tag_dict.items(), key=lambda x: x[1], reverse=True)[:n]


def write_analysis_txt(freq, classes, n_samples, out_path):
    with open(out_path, "w") as f:
        f.write("Data analysis results\n")
        f.write(f"Generated: {datetime.now():%Y-%m-%d %H:%M:%S}\n\n")
        f.write(f"Samples analyzed: {n_samples}\n")
        f.write(f"Unique classes: {len(classes)}\n")
        f.write(f"Classes: {', '.join(classes)}\n\n")
        for cls in classes:
            f.write(f"\n--- class: {cls} ---\n")
            f.write("Top 10 GT tags:\n")
            for i, (tag, c) in enumerate(get_top_tags(freq[cls]["gt"], 10), 1):
                f.write(f"  {i}. {tag}: {c}\n")
            f.write("Top 10 predicted tags:\n")
            for i, (tag, c) in enumerate(get_top_tags(freq[cls]["pred"], 10), 1):
                f.write(f"  {i}. {tag}: {c}\n")
    print(f"saved {out_path}")


def _severity_colors(plt, tags):
    blue = plt.cm.tab20c(np.array([3, 2, 1, 0]))
    green = plt.cm.tab20c(np.array([11, 10, 9, 8]))
    gt = [blue[min(tag_severity_level(t), 3)] for t in tags]
    pred = [green[min(tag_severity_level(t), 3)] for t in tags]
    return gt, pred


def _gt_pred_bars(ax, tags, gt_vals, pred_vals, gt_colors, pred_colors,
                  fontsize=10):
    x = np.arange(len(tags))
    w = 0.35
    ax.bar(x - w / 2, gt_vals, w, label="Ground Truth", color=gt_colors)
    ax.bar(x + w / 2, pred_vals, w, label="Prediction", color=pred_colors)
    ax.set_xticks(x)
    ax.set_xticklabels([_wrap(t) for t in tags], rotation=45, ha="right",
                       fontsize=fontsize)
    ax.set_xlabel("Tags", fontsize=14)
    ax.set_ylabel("Frequency", fontsize=14)


def plot_per_class(freq, classes, out_dir):
    plt = _plt()
    tags = severity_sorted_tags()
    gt_c, pred_c = _severity_colors(plt, tags)
    paths = []
    for cls in classes:
        fig, ax = plt.subplots(figsize=(12, 4))
        _gt_pred_bars(ax, tags,
                      [freq[cls]["gt"].get(t, 0) for t in tags],
                      [freq[cls]["pred"].get(t, 0) for t in tags],
                      gt_c, pred_c)
        ax.set_title(cls, fontsize=16)
        ax.legend(fontsize=12)
        fig.tight_layout()
        path = os.path.join(out_dir,
                            f"tag_distribution_{cls.replace(' ', '_')}.png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
        print(f"saved {path}")
    return paths


def plot_combined(freq, classes, out_dir):
    """Per-class subplots over the merged top-5 GT + top-5 pred tags."""
    plt = _plt()
    fig, axs = plt.subplots(len(classes), 1, figsize=(14, 6 * len(classes)),
                            squeeze=False)
    for i, cls in enumerate(classes):
        ax = axs[i][0]
        top = [t for t, _ in get_top_tags(freq[cls]["gt"], 5)]
        for t, _ in get_top_tags(freq[cls]["pred"], 5):
            if t not in top:
                top.append(t)
        top = sorted(top, key=lambda t: (find_tag_group(t) or "",
                                         tag_severity_level(t)))
        gt_c, pred_c = _severity_colors(plt, top)
        _gt_pred_bars(ax, top,
                      [freq[cls]["gt"].get(t, 0) for t in top],
                      [freq[cls]["pred"].get(t, 0) for t in top],
                      gt_c, pred_c)
        ax.set_title(cls, fontsize=14)
        ax.legend(fontsize=10)
    fig.tight_layout(pad=3.0)
    fig.subplots_adjust(hspace=0.5)
    path = os.path.join(out_dir, "combined_tag_distribution.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {path}")
    return path


def plot_overall(tag_freq, out_dir):
    """Overall GT vs Pred frequency over all 22 tags with group separators."""
    plt = _plt()
    tags = severity_sorted_tags()
    fig, ax = plt.subplots(figsize=(18, 10))
    group_ids = {g: i for i, g in enumerate(SEVERITY_SORTED_GROUPS)}
    colors = [plt.cm.tab10(group_ids[find_tag_group(t)] % 10) for t in tags]
    x = np.arange(len(tags))
    w = 0.4
    gt_vals = [tag_freq[t]["gt"] for t in tags]
    pred_vals = [tag_freq[t]["pred"] for t in tags]
    ax.bar(x - w / 2, gt_vals, w, color=colors, alpha=0.7,
           label="Ground Truth")
    ax.bar(x + w / 2, pred_vals, w, color=colors, hatch="///", alpha=0.7,
           label="Prediction")
    ax.set_xticks(x)
    ax.set_xticklabels([_wrap(t) for t in tags], rotation=45, ha="right",
                       fontsize=9)
    # group boundary separators
    prev = None
    for i, t in enumerate(tags):
        g = find_tag_group(t)
        if prev is not None and g != prev:
            ax.axvline(x=i - 0.5, color="gray", linestyle="--", alpha=0.3)
        prev = g
    ax.set_xlabel("Tags", fontsize=14)
    ax.set_ylabel("Frequency", fontsize=14)
    ax.set_title("Tag Distribution (Ground Truth vs Prediction)", fontsize=16)
    ax.legend(loc="upper right", fontsize=12, ncol=2)
    ax.grid(axis="y", linestyle="--", alpha=0.3)
    fig.tight_layout()
    path = os.path.join(out_dir, "tag_distribution.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {path}")
    return path


def plot_group_stacked(tag_freq, out_dir, normalized=False, labeled=False,
                       suffix=""):
    """Per feature group: GT and Pred bars stacked by tag severity; the
    normalized variants show fractions of the group total."""
    plt = _plt()
    groups = list(SEVERITY_SORTED_GROUPS)
    fig, ax = plt.subplots(figsize=(16, 9))
    x = np.arange(len(groups))
    w = 0.35
    max_tags = max(len(v) for v in SEVERITY_SORTED_GROUPS.values())
    cmap = plt.cm.viridis
    colors = [cmap(i / max(max_tags - 1, 1)) for i in range(max_tags)]

    def totals(kind):
        return {
            g: sum(tag_freq[t][kind] for t in SEVERITY_SORTED_GROUPS[g]) or 1
            for g in groups
        }

    gt_tot, pred_tot = totals("gt"), totals("pred")
    gt_bot = np.zeros(len(groups))
    pred_bot = np.zeros(len(groups))
    for level in range(max_tags):
        gt_vals, pred_vals = [], []
        for g in groups:
            members = SEVERITY_SORTED_GROUPS[g]
            if level < len(members):
                t = members[level]
                gv, pv = tag_freq[t]["gt"], tag_freq[t]["pred"]
                if normalized:
                    gv, pv = gv / gt_tot[g], pv / pred_tot[g]
            else:
                gv = pv = 0
            gt_vals.append(gv)
            pred_vals.append(pv)
        ax.bar(x - w / 2, gt_vals, w, bottom=gt_bot, color=colors[level])
        ax.bar(x + w / 2, pred_vals, w, bottom=pred_bot, color=colors[level],
               hatch="///")
        if labeled:
            for xi, (gv, pv) in enumerate(zip(gt_vals, pred_vals)):
                if gv > 0.04:
                    ax.text(xi - w / 2, gt_bot[xi] + gv / 2, f"{gv:.0%}",
                            ha="center", va="center", fontsize=8)
                if pv > 0.04:
                    ax.text(xi + w / 2, pred_bot[xi] + pv / 2, f"{pv:.0%}",
                            ha="center", va="center", fontsize=8)
        gt_bot += gt_vals
        pred_bot += pred_vals
    ax.set_xticks(x)
    ax.set_xticklabels(groups, fontsize=12)
    ax.set_xlabel("Feature Groups", fontsize=14)
    ax.set_ylabel("Fraction" if normalized else "Frequency", fontsize=14)
    title = ("Normalized Tag Group Distribution" if normalized
             else "Tag Distribution by Feature Groups")
    ax.set_title(title, fontsize=16)
    ax.bar(0, 0, color="gray", label="Ground Truth")
    ax.bar(0, 0, color="gray", hatch="///", label="Prediction")
    ax.legend(fontsize=12)
    fig.tight_layout()
    name = ("normalized_tag_group_distribution" if normalized
            else "tag_group_stacked_distribution") + suffix
    if labeled:
        name += "_labeled"
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {path}")
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tag-file", required=True)
    p.add_argument("--class-file", required=True)
    p.add_argument("--output-dir", default="analysis_results")
    p.add_argument("--tag-start", type=int, default=0)
    p.add_argument("--tag-end", type=int, default=None)
    p.add_argument("--class-start", type=int, default=0)
    p.add_argument("--class-end", type=int, default=None)
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    class_data = parse_class_data(args.class_file, args.class_start,
                                  args.class_end)
    tagging_data = parse_tagging_data(args.tag_file, args.tag_start,
                                      args.tag_end)
    merged = merge_data(class_data, tagging_data)
    freq, classes = class_tag_frequencies(merged)
    tag_freq = overall_tag_frequencies(merged)

    write_analysis_txt(freq, classes, len(merged),
                       os.path.join(args.output_dir, "analysis_results.txt"))
    plot_per_class(freq, classes, args.output_dir)
    plot_combined(freq, classes, args.output_dir)
    plot_overall(tag_freq, args.output_dir)
    plot_group_stacked(tag_freq, args.output_dir)
    plot_group_stacked(tag_freq, args.output_dir, suffix="_20c")
    plot_group_stacked(tag_freq, args.output_dir, normalized=True)
    plot_group_stacked(tag_freq, args.output_dir, normalized=True,
                       labeled=True)


if __name__ == "__main__":
    main()

"""Tag/class distribution charts from eval text artifacts.

Equivalent of reference visualize_tag_class_distribution.py: consumes the
"gt - pred" class/tagging output files and renders per-class stacked-bar tag
distributions plus a combined gt-vs-pred chart.

Usage:
  python viz/visualize_tag_class_distribution.py \
      --tag-file val_data_tagging_output.txt \
      --class-file val_data_class_output.txt --output-dir viz_out
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_outputs import TAG_GROUPS, parse_class_data, parse_tagging_data  # noqa: E402


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def tag_distribution_by_class(class_data, tagging_data, use_pred: bool):
    """-> {class: {group: Counter(tag -> count)}}"""
    dist = defaultdict(lambda: defaultdict(Counter))
    key_cls = "pred_class" if use_pred else "gt_class"
    key_tag = "pred_tags" if use_pred else "gt_tags"
    for c, t in zip(class_data, tagging_data):
        cls = c[key_cls]
        for group, tag in t[key_tag].items():
            if tag is not None:
                dist[cls][group][tag] += 1
    return dist


def plot_stacked_bars(dist, title, out_path):
    plt = _plt()
    classes = sorted(dist)
    groups = list(TAG_GROUPS)
    fig, axes = plt.subplots(2, 3, figsize=(18, 9))
    for gi, group in enumerate(groups):
        ax = axes[gi // 3][gi % 3]
        members = TAG_GROUPS[group]
        bottom = [0.0] * len(classes)
        for tag in members:
            vals = [dist[c][group].get(tag, 0) for c in classes]
            ax.bar(classes, vals, bottom=bottom, label=tag.split(" ")[0])
            bottom = [b + v for b, v in zip(bottom, vals)]
        ax.set_title(group)
        ax.tick_params(axis="x", rotation=20, labelsize=8)
        ax.legend(fontsize=7)
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    print(f"saved {out_path}")


def plot_combined(class_data, out_path):
    plt = _plt()
    gt = Counter(c["gt_class"] for c in class_data)
    pred = Counter(c["pred_class"] for c in class_data)
    classes = sorted(set(gt) | set(pred))
    x = range(len(classes))
    w = 0.38
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar([i - w / 2 for i in x], [gt.get(c, 0) for c in classes], w,
           label="GT")
    ax.bar([i + w / 2 for i in x], [pred.get(c, 0) for c in classes], w,
           label="Pred")
    ax.set_xticks(list(x))
    ax.set_xticklabels(classes, rotation=15)
    ax.set_title("Class distribution: GT vs predicted")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    print(f"saved {out_path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tag-file", required=True)
    p.add_argument("--class-file", required=True)
    p.add_argument("--output-dir", default="viz_output")
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
    n = min(len(class_data), len(tagging_data))
    class_data, tagging_data = class_data[:n], tagging_data[:n]
    print(f"parsed {n} aligned samples")

    for use_pred, label in ((False, "gt"), (True, "pred")):
        dist = tag_distribution_by_class(class_data, tagging_data, use_pred)
        plot_stacked_bars(
            dist, f"Tag distribution per class ({label})",
            os.path.join(args.output_dir, f"tag_distribution_{label}.png"),
        )
    plot_combined(class_data,
                  os.path.join(args.output_dir, "class_distribution.png"))


if __name__ == "__main__":
    main()

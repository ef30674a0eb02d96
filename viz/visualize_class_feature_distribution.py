"""Class-wise feature (tag) distribution charts with severity ordering.

Equivalent of reference visualize_class_feature_distribution.py: frequency of
each attribute value per class, ordered by severity, rendered per group and as
a summary grid; also emits a frequency CSV.

Usage:
  python viz/visualize_class_feature_distribution.py \
      --tag-file val_data_tagging_output.txt \
      --class-file val_data_class_output.txt --output-dir viz_out
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_outputs import (  # noqa: E402
    SEVERITY_ORDER,
    TAG_GROUPS,
    parse_class_data,
    parse_tagging_data,
)


def feature_frequencies(class_data, tagging_data, use_pred=False):
    """-> {class: {group: Counter(short_value -> count)}} ordered by severity."""
    key_cls = "pred_class" if use_pred else "gt_class"
    key_tag = "pred_tags" if use_pred else "gt_tags"
    freq = defaultdict(lambda: defaultdict(Counter))
    for c, t in zip(class_data, tagging_data):
        for group, tag in t[key_tag].items():
            if tag is None:
                continue
            # 'mild Irregular Color' -> 'mild'
            short = tag.replace(group, "").strip()
            freq[c[key_cls]][group][short] += 1
    return freq


def write_csv(freq, out_path):
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["class", "group", "value", "count"])
        for cls in sorted(freq):
            for group in TAG_GROUPS:
                order = SEVERITY_ORDER[group]
                for val in order:
                    w.writerow([cls, group, val,
                                freq[cls][group].get(val, 0)])
    print(f"saved {out_path}")


def plot_distributions(freq, out_dir, label):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    classes = sorted(freq)
    groups = list(TAG_GROUPS)
    fig, axes = plt.subplots(len(classes) or 1, len(groups),
                             figsize=(3 * len(groups), 2.4 * max(len(classes), 1)),
                             squeeze=False)
    for ci, cls in enumerate(classes):
        for gi, group in enumerate(groups):
            ax = axes[ci][gi]
            order = SEVERITY_ORDER[group]
            vals = [freq[cls][group].get(v, 0) for v in order]
            ax.bar(range(len(order)), vals,
                   color=plt.cm.viridis([i / max(len(order) - 1, 1)
                                         for i in range(len(order))]))
            ax.set_xticks(range(len(order)))
            ax.set_xticklabels(order, rotation=30, fontsize=6, ha="right")
            if gi == 0:
                ax.set_ylabel(cls, fontsize=8)
            if ci == 0:
                ax.set_title(group, fontsize=9)
    fig.suptitle(f"Feature distribution per class ({label})")
    fig.tight_layout()
    path = os.path.join(out_dir, f"class_feature_distribution_{label}.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"saved {path}")


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

    for use_pred, label in ((False, "gt"), (True, "pred")):
        freq = feature_frequencies(class_data, tagging_data, use_pred)
        plot_distributions(freq, args.output_dir, label)
        write_csv(freq, os.path.join(args.output_dir,
                                     f"class_feature_freq_{label}.csv"))


if __name__ == "__main__":
    main()

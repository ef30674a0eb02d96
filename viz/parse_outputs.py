"""Shared parsers for the eval text artifacts.

Input contract (reference visualize_tag_class_distribution.py:52-110):
- class file lines:   "gt_class - pred_class[ - [s0, s1, ...]]"
- tagging file lines: "gt_tag,gt_tag,... - pred_tag,pred_tag,..."
Metric footers (non " - " lines) are ignored.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

TAG_GROUPS = {
    "Width": ["Linear Width", "Widened Width", "Linear bulging Width"],
    "Color": ["Normal Color", "Pink Color", "Red Color", "Purple Color"],
    "Pigmentation": ["Normal Pigmentation", "Pigmented Pigmentation",
                     "Hypopigmented Pigmentation"],
    "Surface": ["Flat Surface", "Hypertrophic Surface", "Keloid Surface",
                "Atrophic Surface"],
    "Irregular Color": ["no Irregular Color", "mild Irregular Color",
                        "moderate Irregular Color", "severe Irregular Color"],
    "Irregular Height": ["no Irregular Height", "mild Irregular Height",
                         "moderate Irregular Height", "severe Irregular Height"],
}

# severity ordering (reference visualize_class_feature_distribution.py:40-91)
SEVERITY_ORDER = {
    "Width": ["Linear", "Linear bulging", "Widened"],
    "Color": ["Normal", "Pink", "Red", "Purple"],
    "Pigmentation": ["Normal", "Hypopigmented", "Pigmented"],
    "Surface": ["Flat", "Atrophic", "Hypertrophic", "Keloid"],
    "Irregular Color": ["no", "mild", "moderate", "severe"],
    "Irregular Height": ["no", "mild", "moderate", "severe"],
}

# full tag names per group, severity-sorted (reference tag_groups post-sort)
SEVERITY_SORTED_GROUPS = {
    group: [f"{v} {group}" for v in order]
    for group, order in SEVERITY_ORDER.items()
}

SCAR_CLASSES = ["Hypertrophic scar", "Keloid scar", "Others"]


def find_tag_group(tag: str) -> Optional[str]:
    for group, members in TAG_GROUPS.items():
        if tag in members:
            return group
    return None


def tag_severity_level(tag: str) -> int:
    group = find_tag_group(tag)
    if group:
        return SEVERITY_SORTED_GROUPS[group].index(tag)
    return 0


def severity_sorted_tags() -> List[str]:
    """All 22 tags ordered by (group name, severity) — the x-axis ordering the
    reference uses for every per-tag chart."""
    tags = [t for members in TAG_GROUPS.values() for t in members]
    return sorted(tags, key=lambda t: (find_tag_group(t) or "",
                                       tag_severity_level(t)))


def merge_data(class_data, tagging_data):
    """Align the two artifact streams sample-by-sample (reference
    visualize_tag_class_distribution.py:140-159)."""
    n = min(len(class_data), len(tagging_data))
    return [
        {**class_data[i], **tagging_data[i]} for i in range(n)
    ]


def class_distribution_by_category(merged, category: str):
    """(gt_dist, pred_dist): {tag_value: {class: count}} — GT tags counted
    under the GT class, predicted tags under the predicted class, restricted
    to samples whose GT class is a scar class (reference :205-228)."""
    values = TAG_GROUPS[category]
    gt_dist = {v: {c: 0 for c in SCAR_CLASSES} for v in values}
    pred_dist = {v: {c: 0 for c in SCAR_CLASSES} for v in values}
    for item in merged:
        if item["gt_class"] not in SCAR_CLASSES:
            continue
        gt_v = item["gt_tags"].get(category)
        if gt_v in values:
            gt_dist[gt_v][item["gt_class"]] += 1
        pred_v = item["pred_tags"].get(category)
        if pred_v in values and item["pred_class"] in SCAR_CLASSES:
            pred_dist[pred_v][item["pred_class"]] += 1
    return gt_dist, pred_dist


def tag_accuracy_matrix(merged, classes=None):
    """{gt_class: {group: mean(gt tag == pred tag)}} over samples where both
    sides carry the group (reference visualize_max_prob_heatmap.py:217-249).
    Groups with no data score 0.0."""
    classes = classes or sorted({m["gt_class"] for m in merged})
    groups = list(TAG_GROUPS)
    acc = {c: {g: [] for g in groups} for c in classes}
    for item in merged:
        cls = item["gt_class"]
        if cls not in acc:
            continue
        for g in groups:
            gt, pred = item["gt_tags"].get(g), item["pred_tags"].get(g)
            if gt is not None and pred is not None:
                acc[cls][g].append(1.0 if gt == pred else 0.0)
    return {
        c: {g: (sum(v) / len(v) if v else 0.0) for g, v in row.items()}
        for c, row in acc.items()
    }, classes, groups


def class_tag_frequencies(merged, classes=None):
    """{class: {'gt': {tag: n}, 'pred': {tag: n}}} — GT tags under the GT
    class, predicted tags under the predicted class (reference
    visualize_class_feature_distribution.py:193-218)."""
    classes = classes or sorted(
        {m["gt_class"] for m in merged} | {m["pred_class"] for m in merged}
    )
    freq = {c: {"gt": {}, "pred": {}} for c in classes}
    for item in merged:
        for tag in item["raw_gt_tags"]:
            if item["gt_class"] in freq:
                d = freq[item["gt_class"]]["gt"]
                d[tag] = d.get(tag, 0) + 1
        for tag in item["raw_pred_tags"]:
            if item["pred_class"] in freq:
                d = freq[item["pred_class"]]["pred"]
                d[tag] = d.get(tag, 0) + 1
    return freq, classes


def overall_tag_frequencies(merged):
    """{tag: {'gt': n, 'pred': n}} over all 22 tags (reference :379-395)."""
    freq = {t: {"gt": 0, "pred": 0}
            for members in TAG_GROUPS.values() for t in members}
    for item in merged:
        for tag in item["raw_gt_tags"]:
            if tag in freq:
                freq[tag]["gt"] += 1
        for tag in item["raw_pred_tags"]:
            if tag in freq:
                freq[tag]["pred"] += 1
    return freq


def read_lines_in_range(path: str, start: int = 0, end: Optional[int] = None):
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        lines = [line.rstrip("\n") for line in f]
    return lines[start:end]


def categorize_tags(tags: List[str]) -> Dict[str, Optional[str]]:
    out: Dict[str, Optional[str]] = {g: None for g in TAG_GROUPS}
    for tag in tags:
        tag = tag.strip()
        for group, members in TAG_GROUPS.items():
            if tag in members:
                out[group] = tag
    return out


def parse_class_data(path: str, start_line: int = 0, end_line=None):
    data = []
    for line in read_lines_in_range(path, start_line, end_line):
        if " - " not in line:
            continue
        parts = line.split(" - ")
        if len(parts) < 2:
            continue
        gt, pred = parts[0].strip(), parts[1]
        scores = None
        if "[" in pred:
            m = re.search(r"\[([^\]]*)\]", line)
            if m:
                try:
                    scores = [float(s) for s in m.group(1).split(",")]
                except ValueError:
                    scores = None
            pred = pred.split("[")[0].strip()
        elif len(parts) >= 3 and "[" in parts[2]:
            m = re.search(r"\[([^\]]*)\]", parts[2])
            if m:
                try:
                    scores = [float(s) for s in m.group(1).split(",")]
                except ValueError:
                    scores = None
        data.append({"gt_class": gt, "pred_class": pred.strip(),
                     "scores": scores})
    return data


def parse_tagging_data(path: str, start_line: int = 0, end_line=None):
    data = []
    for line in read_lines_in_range(path, start_line, end_line):
        if " - " not in line:
            continue
        parts = line.split(" - ")
        if len(parts) != 2:
            continue
        gt_tags = [t.strip() for t in parts[0].split(",") if t.strip()]
        pred_tags = [t.strip() for t in parts[1].split(",") if t.strip()]
        data.append({
            "gt_tags": categorize_tags(gt_tags),
            "pred_tags": categorize_tags(pred_tags),
            "raw_gt_tags": gt_tags,
            "raw_pred_tags": pred_tags,
        })
    return data

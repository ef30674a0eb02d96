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

# severity ordering used by the class-feature-distribution tool
SEVERITY_ORDER = {
    "Width": ["Linear", "Widened", "Linear bulging"],
    "Color": ["Normal", "Pink", "Red", "Purple"],
    "Pigmentation": ["Normal", "Pigmented", "Hypopigmented"],
    "Surface": ["Flat", "Hypertrophic", "Keloid", "Atrophic"],
    "Irregular Color": ["no", "mild", "moderate", "severe"],
    "Irregular Height": ["no", "mild", "moderate", "severe"],
}


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

"""Viz tool parity: aggregation math and artifact surface vs the reference
scripts (visualize_tag_class_distribution.py, visualize_max_prob_heatmap.py,
visualize_class_feature_distribution.py) on a golden artifact fixture."""

import csv
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "viz"))

from parse_outputs import (  # noqa: E402
    class_distribution_by_category,
    class_tag_frequencies,
    merge_data,
    overall_tag_frequencies,
    parse_class_data,
    parse_tagging_data,
    severity_sorted_tags,
    tag_accuracy_matrix,
)

pytestmark = pytest.mark.e2e  # matplotlib import makes these slow-ish

# 6 golden samples: (gt_class, pred_class, gt_tags, pred_tags, scores)
GOLDEN = [
    ("Hypertrophic scar", "Hypertrophic scar",
     "Linear Width, Normal Color", "Linear Width, Pink Color",
     [2.0, 1.0, 0.5]),
    ("Hypertrophic scar", "Keloid scar",
     "Widened Width", "Widened Width", [1.0, 3.0, 0.1]),
    ("Keloid scar", "Keloid scar",
     "Keloid Surface, severe Irregular Height",
     "Keloid Surface, severe Irregular Height", [0.2, 2.5, 0.4]),
    ("Keloid scar", "Others",
     "Flat Surface", "Atrophic Surface", [0.1, 0.9, 1.4]),
    ("Others", "Others",
     "no Irregular Color", "no Irregular Color", [0.3, 0.2, 2.2]),
    ("Others", "Hypertrophic scar",
     "Pink Color", "Pink Color", [1.9, 0.4, 0.6]),
]


@pytest.fixture()
def golden_files(tmp_path):
    class_lines = [
        f"{g} - {p} - [{', '.join(f'{s:.6f}' for s in sc)}]"
        for g, p, _, _, sc in GOLDEN
    ]
    tag_lines = [f"{gt} - {pt}" for _, _, gt, pt, _ in GOLDEN]
    class_file = tmp_path / "val_data_class_output.txt"
    tag_file = tmp_path / "val_data_tagging_output.txt"
    # metric footers must be skipped by the parsers (reference writes
    # Korean-labelled footers after the per-sample lines)
    class_file.write_text("\n".join(class_lines) + "\n\n전체 정확도: 0.5000\n")
    tag_file.write_text("\n".join(tag_lines) +
                        "\n\n전체 태그 정확도: 0.7\n정밀도: 0.7 재현율: 0.7 F1: 0.7\n")
    return str(class_file), str(tag_file)


def _merged(golden_files):
    class_file, tag_file = golden_files
    return merge_data(parse_class_data(class_file),
                      parse_tagging_data(tag_file))


def test_parsers_skip_footers_and_read_scores(golden_files):
    class_file, tag_file = golden_files
    cd = parse_class_data(class_file)
    td = parse_tagging_data(tag_file)
    assert len(cd) == len(td) == 6
    assert cd[0]["gt_class"] == "Hypertrophic scar"
    assert cd[0]["scores"] == [2.0, 1.0, 0.5]
    assert td[0]["gt_tags"]["Width"] == "Linear Width"
    assert td[0]["pred_tags"]["Color"] == "Pink Color"


def test_tag_accuracy_matrix_hand_computed(golden_files):
    """Reference analyze_tag_max_probabilities (:217-249): mean gt==pred per
    (gt class, group), 0.0 where no sample carries the group."""
    acc, classes, groups = tag_accuracy_matrix(_merged(golden_files))
    assert classes == ["Hypertrophic scar", "Keloid scar", "Others"]
    assert acc["Hypertrophic scar"]["Width"] == 1.0     # s1 + s2 both match
    assert acc["Hypertrophic scar"]["Color"] == 0.0     # s1 Normal vs Pink
    assert acc["Keloid scar"]["Surface"] == 0.5         # s3 match, s4 miss
    assert acc["Keloid scar"]["Irregular Height"] == 1.0
    assert acc["Others"]["Irregular Color"] == 1.0
    assert acc["Others"]["Color"] == 1.0                # s6
    assert acc["Others"]["Width"] == 0.0                # no data -> 0.0


def test_class_distribution_by_category(golden_files):
    """Reference create_stacked_bar_chart (:205-228): GT tags under GT class,
    pred tags under pred class."""
    gt, pred = class_distribution_by_category(_merged(golden_files), "Width")
    assert gt["Linear Width"]["Hypertrophic scar"] == 1
    assert gt["Widened Width"]["Hypertrophic scar"] == 1
    assert pred["Linear Width"]["Hypertrophic scar"] == 1  # s1 pred class H
    assert pred["Widened Width"]["Keloid scar"] == 1       # s2 pred class K
    assert sum(sum(d.values()) for d in gt.values()) == 2


def test_class_tag_frequencies(golden_files):
    freq, classes = class_tag_frequencies(_merged(golden_files))
    assert freq["Hypertrophic scar"]["gt"]["Linear Width"] == 1
    # s1 (pred H, Pink Color) + s6 (pred H, Pink Color)
    assert freq["Hypertrophic scar"]["pred"]["Pink Color"] == 2
    assert freq["Others"]["pred"]["Atrophic Surface"] == 1  # s4 pred O


def test_overall_tag_frequencies_and_ordering(golden_files):
    freq = overall_tag_frequencies(_merged(golden_files))
    assert freq["Pink Color"] == {"gt": 1, "pred": 2}
    assert freq["Keloid Surface"] == {"gt": 1, "pred": 1}
    tags = severity_sorted_tags()
    assert len(tags) == 22
    # severity ordering inside a group (reference :40-91)
    assert tags.index("Linear Width") < tags.index("Linear bulging Width")
    assert tags.index("Linear bulging Width") < tags.index("Widened Width")
    assert tags.index("Flat Surface") < tags.index("Atrophic Surface")
    assert tags.index("Normal Pigmentation") < tags.index(
        "Hypopigmented Pigmentation")


def test_heatmap_tool_artifacts_and_csv(golden_files, tmp_path):
    import visualize_max_prob_heatmap as tool

    class_file, tag_file = golden_files
    out = tmp_path / "out_heatmap"
    tool.main(["--class-file", class_file, "--tag-file", tag_file,
               "--output-dir", str(out)])
    assert (out / "scar_tag_max_prob_heatmap.png").exists()
    csv_path = out / "scar_tag_max_prob_data.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0][1:] == ["Width", "Color", "Pigmentation", "Surface",
                           "Irregular Color", "Irregular Height"]
    by_class = {r[0]: r[1:] for r in rows[1:]}
    assert float(by_class["Hypertrophic scar"][0]) == 1.0   # Width
    assert float(by_class["Keloid scar"][3]) == 0.5         # Surface


def test_tag_class_distribution_tool_artifacts(golden_files, tmp_path):
    import visualize_tag_class_distribution as tool

    class_file, tag_file = golden_files
    out = tmp_path / "out_dist"
    tool.main(["--class-file", class_file, "--tag-file", tag_file,
               "--output-dir", str(out)])
    for cat in ("Width", "Color", "Pigmentation", "Surface",
                "Irregular_Color", "Irregular_Height"):
        assert (out / f"scar_class_distribution_by_{cat}.png").exists(), cat
    assert (out / "combined_scar_class_distribution.png").exists()


def test_class_feature_distribution_tool_artifacts(golden_files, tmp_path):
    import visualize_class_feature_distribution as tool

    class_file, tag_file = golden_files
    out = tmp_path / "out_feat"
    tool.main(["--class-file", class_file, "--tag-file", tag_file,
               "--output-dir", str(out)])
    expected = [
        "analysis_results.txt",
        "tag_distribution_Hypertrophic_scar.png",
        "tag_distribution_Keloid_scar.png",
        "tag_distribution_Others.png",
        "combined_tag_distribution.png",
        "tag_distribution.png",
        "tag_group_stacked_distribution.png",
        "tag_group_stacked_distribution_20c.png",
        "normalized_tag_group_distribution.png",
        "normalized_tag_group_distribution_labeled.png",
    ]
    for name in expected:
        assert (out / name).exists(), name
    txt = (out / "analysis_results.txt").read_text()
    assert "Top 10 GT tags" in txt and "Hypertrophic scar" in txt

#!/bin/bash
# Post-hoc visualization of eval artifacts (reference run_visualize_tags.sh).
set -e
TAG_FILE="${1:?usage: run_visualize_tags.sh <tagging_output.txt> <class_output.txt> [out_dir]}"
CLASS_FILE="${2:?}"
OUT="${3:-viz_output}"
python viz/visualize_tag_class_distribution.py --tag-file "$TAG_FILE" --class-file "$CLASS_FILE" --output-dir "$OUT"
python viz/visualize_max_prob_heatmap.py --tag-file "$TAG_FILE" --class-file "$CLASS_FILE" --output-dir "$OUT"
python viz/visualize_class_feature_distribution.py --tag-file "$TAG_FILE" --class-file "$CLASS_FILE" --output-dir "$OUT"

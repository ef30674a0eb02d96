"""Locate packaged data assets (model configs, BPE vocab, tag lists).

The reference resolves these as CWD-relative paths ("tagging/scar_tag_list.txt",
reference model.py:277) which only works when run from src/; here every asset is
a package resource resolved relative to this file.
"""

from __future__ import annotations

from pathlib import Path

_ASSET_DIR = Path(__file__).resolve().parent.parent / "assets"


def asset_path(*parts: str) -> Path:
    p = _ASSET_DIR.joinpath(*parts)
    if not p.exists():
        raise FileNotFoundError(f"packaged asset not found: {p}")
    return p


def read_tag_list(name: str = "scar_tag_list.txt") -> list[str]:
    with open(asset_path("tagging", name), "r", encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]

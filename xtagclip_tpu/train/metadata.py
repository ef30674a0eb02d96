"""Zero-shot class names + prompt templates.

Constants extracted to assets/zero_shot_metadata.json (same values as
reference zero_shot_metadata.py:88-270 and zero_shot_metadata_other.py:88-117).
Templates are '{}'-format strings; `format_template(t, classname)` applies.
"""

from __future__ import annotations

import json
from functools import lru_cache

from xtagclip_tpu.utils.assets import asset_path


@lru_cache()
def _meta() -> dict:
    with open(asset_path("zero_shot_metadata.json")) as f:
        return json.load(f)


def __getattr__(name: str):
    mapping = {
        "OPENAI_IMAGENET_TEMPLATES": "openai_imagenet_templates",
        "SIMPLE_IMAGENET_TEMPLATES": "simple_imagenet_templates",
        "IMAGENET_CLASSNAMES": "imagenet_classnames",
        "SIMPLE_MEDICALMNIST_TEMPLATES": "simple_medicalmnist_templates",
        "SIMPLE_SCAR_TEMPLATES": "simple_scar_templates",
        "MEDICALMNIST_CLASSNAMES": "medicalmnist_classnames",
        "PATHMNIST_CLASSNAMES": "pathmnist_classnames",
        "SCAR_CLASSNAMES": "scar_classnames",
    }
    if name in mapping:
        return _meta()[mapping[name]]
    raise AttributeError(name)


def format_template(template: str, classname: str) -> str:
    return template.format(classname) if "{}" in template else template + classname

"""Public package surface parity with the reference open_clip __init__."""

import xtagclip_tpu as oc

REFERENCE_EXPORTS = [
    # factory / registry (reference factory.py, __init__.py)
    "create_model", "create_model_and_transforms",
    "create_model_from_pretrained", "create_loss", "add_model_config",
    "get_model_config", "get_tokenizer", "list_models", "list_openai_models",
    "load_checkpoint", "load_openai_model", "get_cast_dtype",
    "get_input_dtype", "get_model_preprocess_cfg", "set_model_preprocess_cfg",
    "get_model_tokenize_cfg",
    # models / cfgs
    "CLIP", "CustomTextCLIP", "CoCa", "CLIPVisionCfg", "CLIPTextCfg",
    # losses
    "ClipLoss", "CoCaLoss", "DistillClipLoss", "SigLipLoss",
    # transforms
    "AugmentationCfg", "image_transform",
    # pretrained registry
    "list_pretrained", "list_pretrained_models_by_tag",
    "list_pretrained_tags_by_model", "get_pretrained_cfg", "get_pretrained_url",
    "is_pretrained_cfg",
    # tokenizer
    "SimpleTokenizer", "tokenize", "decode",
    # zero-shot
    "build_zero_shot_classifier", "build_zero_shot_classifier_legacy",
    "IMAGENET_CLASSNAMES", "OPENAI_IMAGENET_TEMPLATES",
    "SIMPLE_IMAGENET_TEMPLATES",
    # hub
    "push_to_hf_hub", "push_pretrained_to_hf_hub",
    # constants
    "OPENAI_DATASET_MEAN", "OPENAI_DATASET_STD",
    "__version__",
]


def test_reference_exports_resolve():
    missing = [n for n in REFERENCE_EXPORTS
               if getattr(oc, n, None) is None]
    assert not missing, missing


def test_cfg_dataclasses_build_models():
    from dataclasses import asdict

    v = oc.CLIPVisionCfg(layers=2, width=64, head_width=32, patch_size=8,
                         image_size=32)
    t = oc.CLIPTextCfg(context_length=16, vocab_size=100, width=64, heads=4,
                       layers=2)
    import json
    import os
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinycfg-",
                                     delete=False) as f:
        json.dump({"embed_dim": 64, "vision_cfg": asdict(v),
                   "text_cfg": asdict(t)}, f)
        path = f.name
    oc.add_model_config(path)
    bundle = oc.create_model(os.path.basename(path)[:-5], skip_init=True)
    assert bundle.module.visual.width == 64


def test_custom_text_clip_is_single_assembly():
    assert oc.CustomTextCLIP is oc.CLIP

"""xtagclip_tpu: TPU-native (JAX/XLA/Pallas) framework with the capabilities
of XTag-CLIP — CLIP training/eval, tag-recognition head, TQN fusion, medical
data paths. Public surface mirrors the reference open_clip __init__."""

from xtagclip_tpu.factory import (
    ModelBundle,
    add_model_config,
    create_loss,
    create_model,
    create_model_and_transforms,
    create_model_from_pretrained,
    list_openai_models,
    load_checkpoint,
    load_openai_model,
    get_cast_dtype,
    get_input_dtype,
    get_model_config,
    get_model_preprocess_cfg,
    get_model_tokenize_cfg,
    set_model_preprocess_cfg,
    get_tokenizer,
    list_models,
)
from xtagclip_tpu.losses import (
    AsymmetricLoss,
    ClipLoss,
    DistillClipLoss,
    DQNCOSLoss,
    SigLipLoss,
)
from xtagclip_tpu.losses.coca import CoCaLoss
from xtagclip_tpu.models.clip import CLIP, CustomTextCLIP
from xtagclip_tpu.models.coca import CoCa
from xtagclip_tpu.models.config import CLIPTextCfg, CLIPVisionCfg
from xtagclip_tpu.data.transforms import (
    AugmentationCfg,
    PreprocessCfg,
    image_transform,
)
from xtagclip_tpu.pretrained import (
    get_pretrained_cfg,
    get_pretrained_url,
    is_pretrained_cfg,
    list_pretrained,
    list_pretrained_models_by_tag,
    list_pretrained_tags_by_model,
)
from xtagclip_tpu.tokenize.bpe import SimpleTokenizer, decode, tokenize
from xtagclip_tpu.utils.constants import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
from xtagclip_tpu.version import __version__


def __getattr__(name):
    # lazy surfaces: zero-shot metadata constants + classifier builders +
    # hub push (reference open_clip __init__ exports)
    _meta_names = {
        "IMAGENET_CLASSNAMES", "OPENAI_IMAGENET_TEMPLATES",
        "SIMPLE_IMAGENET_TEMPLATES", "MEDICALMNIST_CLASSNAMES",
        "PATHMNIST_CLASSNAMES", "SCAR_CLASSNAMES",
        "SIMPLE_MEDICALMNIST_TEMPLATES", "SIMPLE_SCAR_TEMPLATES",
    }
    if name in _meta_names:
        from xtagclip_tpu.train import metadata

        return getattr(metadata, name)
    if name in ("build_zero_shot_classifier",
                "build_zero_shot_classifier_legacy"):
        from xtagclip_tpu.train import zero_shot

        return getattr(zero_shot, name)
    if name in ("push_to_hf_hub", "push_pretrained_to_hf_hub"):
        from xtagclip_tpu.convert import export

        return getattr(export, name)
    raise AttributeError(name)


__all__ = [
    "__version__",
    "CLIP",
    "CustomTextCLIP",
    "CoCa",
    "CoCaLoss",
    "CLIPVisionCfg",
    "CLIPTextCfg",
    "AugmentationCfg",
    "PreprocessCfg",
    "image_transform",
    "load_checkpoint",
    "load_openai_model",
    "build_zero_shot_classifier",
    "build_zero_shot_classifier_legacy",
    "push_to_hf_hub",
    "push_pretrained_to_hf_hub",
    "ModelBundle",
    "add_model_config",
    "create_model",
    "create_model_and_transforms",
    "create_model_from_pretrained",
    "create_loss",
    "list_openai_models",
    "get_cast_dtype",
    "get_input_dtype",
    "get_model_config",
    "get_tokenizer",
    "list_models",
    "AsymmetricLoss",
    "ClipLoss",
    "DistillClipLoss",
    "DQNCOSLoss",
    "SigLipLoss",
    "get_pretrained_cfg",
    "get_pretrained_url",
    "is_pretrained_cfg",
    "list_pretrained",
    "list_pretrained_models_by_tag",
    "list_pretrained_tags_by_model",
    "SimpleTokenizer",
    "decode",
    "tokenize",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "OPENAI_DATASET_MEAN",
    "OPENAI_DATASET_STD",
]

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
    get_cast_dtype,
    get_input_dtype,
    get_model_config,
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
from xtagclip_tpu.models.clip import CLIP
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

__all__ = [
    "__version__",
    "CLIP",
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

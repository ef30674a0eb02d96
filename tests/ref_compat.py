"""Import the reference PyTorch implementation (read-only at /root/reference)
for numerical parity tests, stubbing deps absent from this image
(ftfy, torchvision, timm, webdataset). Model math never touches the stubs.
"""

import importlib
import importlib.machinery
import sys
import types

_REF_SRC = "/root/reference/src"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    # transformers probes deps via importlib.util.find_spec, which requires a
    # non-None __spec__ on already-imported modules.
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    import torch.nn as nn

    _stub("ftfy", fix_text=lambda x: x)

    # transformers >=4.30 moved these helpers to pytorch_utils; the reference
    # bert.py still imports them from modeling_utils.
    import transformers.modeling_utils as tmu
    import transformers.pytorch_utils as tpu_utils

    for helper in (
        "apply_chunking_to_forward",
        "find_pruneable_heads_and_indices",
        "prune_linear_layer",
    ):
        if not hasattr(tmu, helper):
            setattr(tmu, helper, getattr(tpu_utils, helper))

    class _Identity(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    tv = _stub("torchvision")
    tv_t = _stub("torchvision.transforms")
    tv_tf = _stub("torchvision.transforms.functional")
    tv_ops = _stub("torchvision.ops")
    tv_ops_misc = _stub("torchvision.ops.misc", FrozenBatchNorm2d=_Identity)
    tv_models = _stub("torchvision.models")
    tv.transforms = tv_t
    tv.ops = tv_ops
    tv.models = tv_models
    tv_ops.misc = tv_ops_misc
    tv_t.functional = tv_tf

    class _InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    for cls_name in (
        "Normalize",
        "Compose",
        "RandomResizedCrop",
        "ToTensor",
        "Resize",
        "CenterCrop",
        "ColorJitter",
        "Grayscale",
        "RandomHorizontalFlip",
        "RandomApply",
        "RandomGrayscale",
    ):
        setattr(tv_t, cls_name, type(cls_name, (), {"__init__": lambda self, *a, **k: None}))
    tv_t.InterpolationMode = _InterpolationMode

    def _na(*a, **k):
        raise NotImplementedError("torchvision stub")

    for fn in ("resize", "center_crop", "pad", "crop", "get_image_size"):
        setattr(tv_tf, fn, _na)


def import_ref_open_clip():
    """Return the reference open_clip package (imported once, cached)."""
    if "open_clip" in sys.modules and hasattr(sys.modules["open_clip"], "CLIP"):
        return sys.modules["open_clip"]
    install_stubs()
    if _REF_SRC not in sys.path:
        sys.path.insert(0, _REF_SRC)
    # The tagging-head BertModel opens CWD-relative config paths; the factory
    # is patched per-test where needed. Plain import here.
    return importlib.import_module("open_clip")

"""Model factory: config registry + tower assembly + checkpoint loading.

Mirrors the reference factory surface (/root/reference/src/open_clip/factory.py):
list_models / get_model_config / add_model_config / create_model /
create_model_and_transforms / get_tokenizer — rebuilt for JAX: a "model" is a
(module, params) pair wrapped in ModelBundle with jitted encode helpers.

117 architecture JSONs ship in assets/model_configs (the reference's 113 + 4
CLIPA CL32-GAP configs its scripts pin; same schema as reference
model_configs/*.json, validated for {embed_dim, vision_cfg, text_cfg}).
"""

from __future__ import annotations

import json
import os
import re
import warnings
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from xtagclip_tpu.models.clip import CLIP
from xtagclip_tpu.models.layers import gelu_exact, quick_gelu
from xtagclip_tpu.models.text import TextTransformer
from xtagclip_tpu.models.vit import VisionTransformer
from xtagclip_tpu.utils.assets import asset_path

_MODEL_CONFIGS: Dict[str, dict] = {}
_BUILTIN_NAMES: Tuple[str, ...] = ()


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s.lower())]


def _scan_config_dir(cfg_dir, configs, strict):
    for f in sorted(Path(cfg_dir).glob("*.json")):
        try:
            with open(f) as fh:
                cfg = json.load(fh)
        except (OSError, ValueError) as e:
            if strict:
                raise
            # user dirs must not break `import xtagclip_tpu` for every
            # entry point over one malformed file
            warnings.warn(f"XTAGCLIP_EXTRA_CONFIGS: skipping {f}: {e}")
            continue
        if "model_cfg" in cfg:  # nested schema (e.g. BiomedCLIP hub cfg)
            flat = dict(cfg["model_cfg"])
            flat["preprocess_cfg"] = cfg.get("preprocess_cfg", {})
            cfg = flat
        if all(k in cfg for k in ("embed_dim", "vision_cfg", "text_cfg")):
            configs[f.stem] = cfg


def _rescan_model_configs():
    global _MODEL_CONFIGS, _BUILTIN_NAMES
    configs = {}
    _scan_config_dir(asset_path("model_configs"), configs, strict=True)
    builtin = tuple(sorted(configs, key=_natural_key))
    # user config dirs via XTAGCLIP_EXTRA_CONFIGS (':'-separated), scanned
    # after the builtin assets so out-of-tree JSONs can extend — or
    # deliberately override — the zoo without touching the package
    # (reference users drop files into src/open_clip/model_configs/ instead)
    for d in os.environ.get("XTAGCLIP_EXTRA_CONFIGS", "").split(":"):
        if d:
            _scan_config_dir(d, configs, strict=False)
    _MODEL_CONFIGS = {
        k: configs[k] for k in sorted(configs, key=_natural_key)
    }
    _BUILTIN_NAMES = builtin


_rescan_model_configs()


def list_models():
    return list(_MODEL_CONFIGS.keys())


def list_builtin_models():
    """Names shipped in assets/model_configs (excludes runtime
    add_model_config registrations)."""
    return list(_BUILTIN_NAMES)


def get_model_config(model_name: str) -> Optional[dict]:
    cfg = _MODEL_CONFIGS.get(model_name)
    return json.loads(json.dumps(cfg)) if cfg is not None else None


def add_model_config(path):
    path = Path(path)
    with open(path) as f:
        cfg = json.load(f)
    _MODEL_CONFIGS[path.stem] = cfg


def get_cast_dtype(precision: str):
    if precision in ("bf16", "pure_bf16"):
        return jnp.bfloat16
    if precision in ("fp16", "pure_fp16"):
        return jnp.float16
    return jnp.float32


def get_input_dtype(precision: str):
    return get_cast_dtype(precision)


@dataclass
class ModelBundle:
    """A built model: module definition + parameter pytree + metadata.

    extra_variables carries non-param collections (BatchNorm batch_stats for
    ResNet towers); empty for pure-transformer models.
    """

    module: Any
    params: Any
    model_cfg: dict
    model_name: str
    preprocess_cfg: dict = field(default_factory=dict)
    quick_gelu: bool = False
    extra_variables: dict = field(default_factory=dict)

    def _variables(self, params=None):
        return {
            "params": params if params is not None else self.params,
            **self.extra_variables,
        }

    def apply(self, *args, method=None, rngs=None, params=None, **kwargs):
        return self.module.apply(
            self._variables(params), *args, method=method, rngs=rngs, **kwargs
        )

    def encode_image(self, images, normalize=True, params=None):
        return self.module.apply(
            self._variables(params), images, normalize,
            method=self.module.encode_image,
        )

    def encode_text(self, text, normalize=True, params=None):
        return self.module.apply(
            self._variables(params), jnp.asarray(text), normalize,
            method=self.module.encode_text,
        )

    def forward_intermediates(self, image=None, text=None, params=None,
                              **kwargs):
        """Per-block intermediate features (reference model.py:395-456)."""
        return self.module.apply(
            self._variables(params), image=image,
            text=None if text is None else jnp.asarray(text),
            method=self.module.forward_intermediates, **kwargs,
        )


def _build_vision_tower(embed_dim: int, vision_cfg: dict, quick: bool,
                        dtype, param_dtype, remat: bool = False,
                        scan_layers: bool = False,
                        bn_axis_name: Optional[str] = None):
    v = dict(vision_cfg)
    act = quick_gelu if quick else gelu_exact
    if v.get("timm_model_name"):
        from xtagclip_tpu.models.timm_vit import build_timm_vision_tower

        return build_timm_vision_tower(
            embed_dim=embed_dim, vision_cfg=v, dtype=dtype,
            param_dtype=param_dtype, remat=remat,
        )
    if isinstance(v.get("layers"), (tuple, list)):
        from xtagclip_tpu.models.resnet import ModifiedResNet

        heads = v.get("width", 64) * 32 // v.get("head_width", 64)
        return ModifiedResNet(
            layers=tuple(v["layers"]), output_dim=embed_dim, heads=heads,
            image_size=v.get("image_size", 224), width=v.get("width", 64),
            bn_axis_name=bn_axis_name,
            dtype=dtype, param_dtype=param_dtype,
        )
    heads = v.get("width", 768) // v.get("head_width", 64)
    norm_eps = (v.get("norm_kwargs") or {}).get("eps", 1e-5)
    return VisionTransformer(
        image_size=v.get("image_size", 224),
        patch_size=v.get("patch_size", 16),
        width=v.get("width", 768),
        layers=v.get("layers", 12),
        heads=heads,
        mlp_ratio=v.get("mlp_ratio", 4.0),
        ls_init_value=v.get("ls_init_value"),
        patch_dropout=v.get("patch_dropout", 0.0),
        attentional_pool=v.get("attentional_pool", False),
        attn_pooler_queries=v.get("attn_pooler_queries", 256),
        attn_pooler_heads=v.get("attn_pooler_heads", 8),
        pos_embed_type=v.get("pos_embed_type", "learnable"),
        no_ln_pre=v.get("no_ln_pre", False),
        final_ln_after_pool=v.get("final_ln_after_pool", False),
        pool_type=v.get("pool_type", "tok"),
        no_class_token=v.get("no_class_token", False),
        output_tokens=True,
        n_learnable_tokens=v.get("n_learnable_tokens", 0),
        insert_position=v.get("insert_position", 1),
        output_dim=embed_dim,
        act=act,
        norm_eps=norm_eps,
        remat=remat,
        scan_layers=scan_layers,
        dtype=dtype,
        param_dtype=param_dtype,
        name="visual",
    )


def _build_text_tower(embed_dim: int, text_cfg: dict, quick: bool,
                      dtype, param_dtype, remat: bool = False,
                      scan_layers: bool = False):
    t = dict(text_cfg)
    if t.get("hf_model_name"):
        from xtagclip_tpu.models.hf_text import HFTextEncoder

        return HFTextEncoder(
            model_name=t["hf_model_name"],
            output_dim=embed_dim,
            proj_type=t.get("hf_proj_type", "mlp"),
            pooler_type=t.get("hf_pooler_type", "mean_pooler"),
            dtype=dtype, param_dtype=param_dtype, name="text",
        )
    act = quick_gelu if quick else gelu_exact
    norm_eps = (t.get("norm_kwargs") or {}).get("eps", 1e-5)
    return TextTransformer(
        context_length=t.get("context_length", 77),
        vocab_size=t.get("vocab_size", 49408),
        width=t.get("width", 512),
        heads=t.get("heads", 8),
        layers=t.get("layers", 12),
        mlp_ratio=t.get("mlp_ratio", 4.0),
        ls_init_value=t.get("ls_init_value"),
        output_dim=embed_dim,
        embed_cls=t.get("embed_cls", False),
        no_causal_mask=t.get("no_causal_mask", False),
        pad_id=t.get("pad_id", 0),
        pool_type=t.get("pool_type", "argmax"),
        proj_type=t.get("proj_type", "linear"),
        proj_bias=t.get("proj_bias", False),
        act=act,
        norm_eps=norm_eps,
        remat=remat,
        scan_layers=scan_layers,
        dtype=dtype,
        param_dtype=param_dtype,
        name="text",
    )


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    force_quick_gelu: bool = False,
    force_image_size: Optional[Any] = None,
    force_custom_text: bool = False,
    use_tagging: bool = False,
    use_fusion: bool = False,
    prompt_template_setting: Optional[str] = None,
    grad_checkpointing: bool = False,
    scan_layers: bool = False,
    use_bn_sync: bool = False,
    cache_dir: Optional[str] = None,
    init_seed: int = 0,
    skip_init: bool = False,
    **model_kwargs,
) -> ModelBundle:
    """Build a model (random init), then optionally load pretrained weights.

    `pretrained` accepts a local path to a torch .pt/.bin checkpoint in
    open_clip layout (no-egress environment: hub/url tags resolve only if the
    file is already cached locally).
    """
    hub_id = None
    if model_name.startswith("hf-hub:"):
        # hub id -> local config name (reference factory.py:294-301; in this
        # no-egress environment the hub repo's config must ship in assets,
        # as BiomedCLIP's does)
        hub_id = model_name[len("hf-hub:"):]
        model_name = hub_id.split("/")[-1]
    model_name = model_name.replace("/", "-")
    cfg = get_model_config(model_name)
    if cfg is None:
        if hub_id is not None:
            raise RuntimeError(
                f"hf-hub model {hub_id!r} has no local config asset "
                f"(looked for {model_name!r} in the registry). This "
                f"environment has no network egress: ship the hub repo's "
                f"open_clip_config.json as assets/model_configs/"
                f"{model_name}.json or register it via add_model_config()."
            )
        raise RuntimeError(f"Model config for {model_name} not found; "
                           f"available: {len(list_models())} configs")

    quick = cfg.get("quick_gelu", False) or force_quick_gelu
    if force_image_size is not None:
        cfg["vision_cfg"]["image_size"] = force_image_size
    cast_dtype = get_cast_dtype(precision)
    param_dtype = (
        jnp.bfloat16 if precision in ("pure_bf16",)
        else jnp.float16 if precision in ("pure_fp16",)
        else jnp.float32
    )

    for k, v in model_kwargs.items():
        if k in ("vision_cfg", "text_cfg") and isinstance(v, dict):
            cfg[k].update(v)  # merge tower overrides (learnable tokens etc.)
        else:
            cfg[k] = v

    visual = _build_vision_tower(
        cfg["embed_dim"], cfg["vision_cfg"], quick, cast_dtype, param_dtype,
        remat=grad_checkpointing, scan_layers=scan_layers,
        bn_axis_name="data" if use_bn_sync else None,
    )
    text = _build_text_tower(
        cfg["embed_dim"], cfg["text_cfg"], quick, cast_dtype, param_dtype,
        remat=grad_checkpointing, scan_layers=scan_layers,
    )
    if "multimodal_cfg" in cfg:  # CoCa family (factory.py:347-348 dispatch)
        from xtagclip_tpu.models.coca import CoCa, MultimodalTransformer
        from xtagclip_tpu.models.layers import gelu_exact as _gelu

        m = cfg["multimodal_cfg"]
        decoder = MultimodalTransformer(
            width=m.get("width", 512), layers=m.get("layers", 12),
            heads=m.get("heads", 8),
            context_length=m.get("context_length", 76),
            mlp_ratio=m.get("mlp_ratio", 4.0),
            ls_init_value=m.get("ls_init_value"),
            output_dim=cfg["text_cfg"].get("vocab_size", 49408),
            act=quick_gelu if quick else _gelu,
            dtype=cast_dtype, param_dtype=param_dtype, name="text_decoder",
        )
        module = CoCa(
            visual=visual, text=text, text_decoder=decoder,
            embed_dim=cfg["embed_dim"],
            init_logit_scale=cfg.get("init_logit_scale",
                                     float(np.log(1 / 0.07))),
            init_logit_bias=cfg.get("init_logit_bias"),
            dtype=cast_dtype, param_dtype=param_dtype,
        )
        params = None
        extra = {}
        if not skip_init:
            image_size = cfg["vision_cfg"].get("image_size", 224)
            ih = iw = image_size if isinstance(image_size, int) else image_size[0]
            ctx = cfg["text_cfg"].get("context_length", 76)
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                variables = jax.jit(module.init)(
                    jax.random.PRNGKey(init_seed),
                    jnp.zeros((1, ih, iw, 3), cast_dtype),
                    jnp.zeros((1, ctx), jnp.int32),
                )
            params = variables["params"]
            extra = {k: v for k, v in variables.items() if k != "params"}
        bundle = ModelBundle(
            module=module, params=params, model_cfg=cfg,
            model_name=model_name, quick_gelu=quick,
            preprocess_cfg=dict(cfg.get("preprocess_cfg", {})),
            extra_variables=extra,
        )
        if pretrained:
            from xtagclip_tpu.convert.loader import load_checkpoint_into

            load_checkpoint_into(bundle, pretrained)
        return bundle

    module = CLIP(
        visual=visual,
        text=text,
        embed_dim=cfg["embed_dim"],
        init_logit_scale=cfg.get("init_logit_scale", float(np.log(1 / 0.07))),
        init_logit_bias=cfg.get("init_logit_bias"),
        nonscalar_logit_scale=cfg.get("nonscalar_logit_scale", False),
        use_tagging=use_tagging,
        use_fusion=use_fusion,
        fusion_dim=cfg.get("fusion_dim", 512),
        dtype=cast_dtype,
        param_dtype=param_dtype,
    )

    params = None
    extra = {}
    if not skip_init:
        image_size = cfg["vision_cfg"].get("image_size", 224)
        if isinstance(image_size, (tuple, list)):
            ih, iw = image_size
        else:
            ih = iw = image_size
        ctx = cfg["text_cfg"].get("context_length", 77)
        dummy_img = jnp.zeros((1, ih, iw, 3), cast_dtype)
        dummy_txt = jnp.zeros((1, ctx), jnp.int32)
        # init on CPU: initialization is trace-once bookkeeping, not worth a
        # (potentially slow, remote) accelerator compile; params transfer to
        # the mesh at training/eval setup.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            variables = jax.jit(module.init, static_argnames=("deterministic",))(
                jax.random.PRNGKey(init_seed), dummy_img, dummy_txt,
                deterministic=True,
            )
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}

    bundle = ModelBundle(
        module=module,
        params=params,
        model_cfg=cfg,
        model_name=model_name,
        quick_gelu=quick,
        preprocess_cfg=dict(cfg.get("preprocess_cfg", {})),
        extra_variables=extra,
    )

    if pretrained:
        import os

        from xtagclip_tpu.convert.loader import load_checkpoint_into

        if pretrained == "openai":
            from xtagclip_tpu.pretrained import resolve_pretrained

            path = resolve_pretrained(model_name, pretrained, cache_dir)
            from xtagclip_tpu.convert.openai import load_openai_state_dict
            from xtagclip_tpu.convert.loader import merge_converted_params
            from xtagclip_tpu.convert.openclip import convert_openclip_state_dict

            sd = load_openai_state_dict(path)
            bundle.params = merge_converted_params(
                bundle.params, convert_openclip_state_dict(sd)
            )
        else:
            if not os.path.exists(pretrained):
                from xtagclip_tpu.pretrained import resolve_pretrained

                pretrained = resolve_pretrained(model_name, pretrained, cache_dir)
            load_checkpoint_into(bundle, pretrained)

    return bundle


def get_model_preprocess_cfg(bundle) -> dict:
    """Preprocess config attached to a built model (reference
    model.py:1131-1146 surface, adapted to ModelBundle)."""
    pp = dict(bundle.preprocess_cfg or {})
    pp.setdefault("size",
                  bundle.model_cfg["vision_cfg"].get("image_size", 224))
    return pp


def set_model_preprocess_cfg(bundle, preprocess_cfg: dict):
    """reference model.py:1149-1153 surface."""
    bundle.preprocess_cfg = dict(preprocess_cfg)


def get_model_tokenize_cfg(bundle) -> dict:
    """reference model.py:1156-1164 surface."""
    t = bundle.model_cfg.get("text_cfg", {})
    return {k: t[k] for k in ("context_length", "vocab_size") if k in t}


def create_loss(args):
    """Pick the training loss from args (reference factory.py:433-469)."""
    from xtagclip_tpu.losses import ClipLoss, DistillClipLoss, SigLipLoss
    from xtagclip_tpu.losses.coca import CoCaLoss

    world = getattr(args, "world_size", 1)
    common = dict(
        local_loss=getattr(args, "local_loss", False),
        gather_with_grad=getattr(args, "gather_with_grad", False),
        cache_labels=True,
        rank=getattr(args, "rank", 0),
        world_size=world,
    )
    if getattr(args, "distill", None) or getattr(args, "distill_model", None):
        return DistillClipLoss(**common)
    if "coca" in getattr(args, "model", "").lower():
        return CoCaLoss(
            caption_loss_weight=getattr(args, "coca_caption_loss_weight", 2.0),
            clip_loss_weight=getattr(args, "coca_contrastive_loss_weight", 1.0),
            **common,
        )
    if getattr(args, "siglip", False):
        return SigLipLoss(
            rank=common["rank"], world_size=world,
            dist_impl=getattr(args, "loss_dist_impl", None),
        )
    return ClipLoss(**common)


def list_openai_models():
    """Names of models with an 'openai' pretrained tag (reference openai.py)."""
    from xtagclip_tpu.pretrained import list_pretrained_models_by_tag

    return list_pretrained_models_by_tag("openai")


def load_openai_model(name: str, precision: str = "fp32", **kwargs):
    """Build a model from an OpenAI JIT-archive checkpoint (reference
    openai.py:24-90 surface). `name` is a registry name with an 'openai'
    pretrained tag, or a local path paired with a model name via kwargs."""
    return create_model(name, pretrained="openai", precision=precision,
                        **kwargs)


def load_checkpoint(bundle, path: str, strict: bool = False):
    """Load a torch/.npz/orbax checkpoint into a built bundle (reference
    factory.py:177-221 surface)."""
    from xtagclip_tpu.convert.loader import load_checkpoint_into

    return load_checkpoint_into(bundle, path, strict=strict)


def create_model_from_pretrained(
    model_name: str,
    pretrained: Optional[str] = None,
    **kwargs,
):
    """Reference factory.py:536-586 surface: returns (bundle, eval_transform)."""
    if model_name.startswith("hf-hub:"):
        model_name = model_name[len("hf-hub:"):].split("/")[-1]
    bundle, _, eval_t = create_model_and_transforms(
        model_name, pretrained, **kwargs
    )
    return bundle, eval_t


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    image_mean=None,
    image_std=None,
    image_interpolation=None,
    image_resize_mode=None,
    aug_cfg=None,
    **kwargs,
):
    from xtagclip_tpu.data.transforms import (
        PreprocessCfg,
        image_transform_train,
        image_transform_eval,
    )

    bundle = create_model(model_name, pretrained, precision=precision, **kwargs)
    pp = PreprocessCfg(
        size=bundle.model_cfg["vision_cfg"].get("image_size", 224),
        mean=image_mean, std=image_std,
        interpolation=image_interpolation or "bicubic",
        resize_mode=image_resize_mode or "shortest",
    )
    train_t = image_transform_train(pp, aug_cfg=aug_cfg)
    eval_t = image_transform_eval(pp)
    return bundle, train_t, eval_t


def get_tokenizer(model_name: str = "", context_length: Optional[int] = None,
                  **kwargs):
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer

    cfg = get_model_config(model_name) if model_name else None
    text_cfg = (cfg or {}).get("text_cfg", {})
    if text_cfg.get("hf_tokenizer_name"):
        from xtagclip_tpu.tokenize.hf import HFTokenizer

        tk = text_cfg.get("tokenizer_kwargs", {}) or {}
        tk.update(kwargs)
        return HFTokenizer(
            text_cfg["hf_tokenizer_name"],
            context_length=context_length or text_cfg.get("context_length", 77),
            **tk,
        )
    tk = dict(text_cfg.get("tokenizer_kwargs", {}) or {})
    tk.update(kwargs)
    return SimpleTokenizer(
        context_length=context_length or text_cfg.get("context_length", 77),
        **tk,
    )

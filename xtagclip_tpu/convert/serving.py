"""AOT serving artifacts via ``jax.export`` — the TPU-native answer to the
reference's torchscript trace (reference model.py:1049-1062 ``trace_model``
+ the ``--torchscript``/``--trace`` flags, training.main:226/462).

Where the reference emits a ``torch.jit.trace_module`` with ``forward`` /
``encode_image`` / ``encode_text`` at one FIXED batch size, this exports the
same three entry points as serialized StableHLO with a SYMBOLIC batch
dimension: one artifact serves any batch size, loads without the model's
Python code, and runs under any jax runtime that can target the exported
platform (jax.export round-trips by contract across jax releases).

The artifact is self-contained: parameters are baked into the module as
constants, exactly like torchscript's traced weights — a loader needs the
``.stablehlo`` blobs and nothing else. Inputs keep the framework-wide
serving convention of uint8 HWC images (normalize runs in-graph; bytes, not
floats, cross PCIe) and int32 token ids.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

from xtagclip_tpu.ops.preprocess import normalize_images

_MANIFEST = "serving_manifest.json"


def _entry_fns(bundle, normalize: bool = True):
    """The three reference trace entry points as pure fns of example args.

    encode_image takes uint8 [b, S, S, 3] (in-graph normalize with the
    preprocess mean/std baked from the bundle's cfg); encode_text takes
    int32 [b, ctx]; forward returns (image_features, text_features,
    logit_scale) like reference CLIP.forward (model.py:478-496).
    """
    module, params = bundle.module, bundle.params
    pp = getattr(bundle, "preprocess_cfg", None) or {}
    mean = tuple(pp.get("mean") or ()) or None
    std = tuple(pp.get("std") or ()) or None
    dtype = getattr(bundle.module, "dtype", jnp.float32)

    def _norm(images_u8):
        kw = {}
        if mean is not None:
            kw["mean"] = mean
        if std is not None:
            kw["std"] = std
        return normalize_images(images_u8, dtype=dtype, **kw)

    def encode_image(images_u8):
        feats, _ = module.apply({"params": params}, _norm(images_u8),
                                normalize, method=module.encode_image)
        return feats

    def encode_text(text_ids):
        feats, _ = module.apply({"params": params}, text_ids,
                                normalize, method=module.encode_text)
        return feats

    def forward(images_u8, text_ids):
        img, _ = module.apply({"params": params}, _norm(images_u8),
                              True, method=module.encode_image)
        txt, _ = module.apply({"params": params}, text_ids,
                              True, method=module.encode_text)
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        return img, txt, scale

    return {"encode_image": encode_image, "encode_text": encode_text,
            "forward": forward}


def export_serving(
    bundle,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    normalize: bool = True,
    entries: Sequence[str] = ("encode_image", "encode_text", "forward"),
) -> Dict[str, "jexport.Exported"]:
    """Export encode_image/encode_text/forward as jax.export Exported
    objects. batch_size=None (default) exports a symbolic batch dim `b`
    (any batch at serving time); an int pins it like the reference's
    trace_model(batch_size=256). platforms defaults to the current backend
    (pass e.g. ("tpu", "cpu") to emit a multi-platform blob).

    Each entry bakes its own copy of the weights it uses (`forward` alone
    carries BOTH towers — ViT-B-32: ~600 MB), unlike torchscript's shared
    module state; pass entries=("encode_image", "encode_text") for a
    tower-served deployment to halve the artifact."""
    image_size = bundle.model_cfg["vision_cfg"].get("image_size", 224)
    if isinstance(image_size, (tuple, list)):
        ih, iw = image_size
    else:
        ih = iw = image_size
    ctx = bundle.model_cfg["text_cfg"].get("context_length", 77)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    img_spec = jax.ShapeDtypeStruct((b, ih, iw, 3), jnp.uint8)
    txt_spec = jax.ShapeDtypeStruct((b, ctx), jnp.int32)
    specs = {"encode_image": (img_spec,), "encode_text": (txt_spec,),
             "forward": (img_spec, txt_spec)}
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    fns = _entry_fns(bundle, normalize=normalize)
    unknown = set(entries) - set(fns)
    if unknown:
        raise ValueError(f"unknown serving entries: {sorted(unknown)}")
    return {name: jexport.export(jax.jit(fns[name]), **kw)(*specs[name])
            for name in entries}


def export_serve_classify(
    bundle,
    text_g_table,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> "jexport.Exported":
    """Export the framework's OWN production path — the precomputed-prompt
    fusion classifier (serving.py: vision tower -> tag head -> cached
    [C, K, D] prompt-query gather -> TQN fusion over every class) — as one
    AOT entry `serve_classify(images_u8) -> (image_features, tag_global,
    fusion_logits[B, C])`.

    This is strictly more than the reference's traceable surface: its
    forward re-tokenizes pseudo-prompts ON HOST every batch
    (reference model.py:545), so the fused classify path cannot be traced
    there at all; here the whole 9.5k img/s pipeline deploys as a single
    StableHLO blob with the weights AND the prompt table baked in, no model
    code needed at serving time.

    text_g_table: [C, K, D] from serving.precompute_prompt_features (run it
    against the checkpoint being deployed). Symbolic batch by default.
    """
    from xtagclip_tpu.serving import serve_body

    module, params = bundle.module, bundle.params
    if not getattr(module, "use_fusion", False):
        raise ValueError(
            "export_serve_classify needs a model built with use_fusion=True "
            "(and use_tagging=True) — pass them to create_model")
    extra = dict(bundle.extra_variables or {})
    pp = getattr(bundle, "preprocess_cfg", None) or {}
    mean = tuple(pp.get("mean") or ()) or None
    std = tuple(pp.get("std") or ()) or None
    dtype = getattr(module, "dtype", jnp.float32)
    table = jnp.asarray(text_g_table)

    def serve_classify(images_u8):
        kw = {}
        if mean is not None:
            kw["mean"] = mean
        if std is not None:
            kw["std"] = std
        x = normalize_images(images_u8, dtype=dtype, **kw)
        return module.apply({"params": params, **extra}, x, table,
                            method=serve_body)

    image_size = bundle.model_cfg["vision_cfg"].get("image_size", 224)
    if isinstance(image_size, (tuple, list)):
        ih, iw = image_size
    else:
        ih = iw = image_size
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    img_spec = jax.ShapeDtypeStruct((b, ih, iw, 3), jnp.uint8)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    return jexport.export(jax.jit(serve_classify), **kw)(img_spec)


def save_serving(bundle, out_dir: str, model_name: str = "",
                 batch_size: Optional[int] = None,
                 platforms: Optional[Sequence[str]] = None,
                 entries: Sequence[str] = ("encode_image", "encode_text",
                                           "forward"),
                 serve_classify_table=None,
                 classnames: Optional[Sequence[str]] = None) -> dict:
    """Write the serving artifact: one .stablehlo blob per entry point plus
    a manifest (shapes, dtypes, platforms, model name). Returns the
    manifest dict.

    serve_classify_table: optional [C, K, D] precomputed prompt-feature
    table (serving.precompute_prompt_features); when given, the artifact
    additionally carries the `serve_classify` entry (the precomputed-prompt
    fusion classifier, export_serve_classify)."""
    os.makedirs(out_dir, exist_ok=True)
    exported = dict(export_serving(bundle, batch_size=batch_size,
                                   platforms=platforms, entries=entries)
                    if entries else {})
    if serve_classify_table is not None:
        exported["serve_classify"] = export_serve_classify(
            bundle, serve_classify_table, batch_size=batch_size,
            platforms=platforms)
    from xtagclip_tpu.factory import get_model_preprocess_cfg

    manifest = {"model": model_name, "entries": {},
                # everything a loader needs to feed the artifact: the host
                # stage is resize/crop to uint8 (transforms.py,
                # normalize_host=False); normalize is in-graph
                "preprocess": get_model_preprocess_cfg(bundle)}
    if classnames is not None:
        manifest["classnames"] = list(classnames)
    for name, exp in exported.items():
        blob = exp.serialize()
        fname = f"{name}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)
        manifest["entries"][name] = {
            "file": fname,
            "platforms": list(exp.platforms),
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
            "bytes": len(blob),
        }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def read_manifest(out_dir: str) -> dict:
    """The artifact's manifest (entries, preprocess recipe, classnames)."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        return json.load(f)


def load_serving(out_dir: str) -> Dict[str, object]:
    """Load a saved artifact back into callables (no model code needed):
    {entry_name: fn}; each fn is the deserialized Exported's .call under
    jit. Raises FileNotFoundError if the manifest is missing."""
    with open(os.path.join(out_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    fns = {}
    for name, meta in manifest["entries"].items():
        with open(os.path.join(out_dir, meta["file"]), "rb") as f:
            exp = jexport.deserialize(f.read())
        fns[name] = jax.jit(exp.call)
    return fns

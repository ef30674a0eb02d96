"""Full registry sweep: every shipped model config must build a real module
whose init produces correctly-shaped params and whose forward produces
embed_dim features — verified shape-only via jax.eval_shape (no memory cost,
even for the 4B-param EVA02-E / mt5-xl configs).

Also pins published param counts for the round-2 trunk families (EVA,
ViTamin, Swin, FastViT/MobileCLIP) as a structure-parity check: without timm
in the image, parameter totals against the published model cards are the
strongest available evidence the dims/depths/ffn layouts are right.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.factory import (
    create_model,
    get_model_config,
    list_builtin_models,
    list_models,
)

pytestmark = pytest.mark.e2e


import functools


@functools.lru_cache(maxsize=None)
def _shape_init(name):
    bundle = create_model(name, skip_init=True)
    cfg = bundle.model_cfg
    image_size = cfg["vision_cfg"].get("image_size", 224)
    ih = image_size if isinstance(image_size, int) else image_size[0]
    ctx = cfg["text_cfg"].get("context_length", 77)
    img = jnp.zeros((1, ih, ih, 3), jnp.float32)
    txt = jnp.zeros((1, ctx), jnp.int32)
    variables = jax.eval_shape(
        lambda: bundle.module.init(jax.random.PRNGKey(0), img, text=txt)
    )
    return bundle, variables


def test_every_registry_config_builds():
    # builtin names only: other tests legitimately add tiny configs at
    # runtime via add_model_config, which must not affect this sweep
    names = list_builtin_models()
    assert set(names) <= set(list_models())
    # the reference's 113 configs + 4 configs its CLIPA recipe scripts
    # pin but its own zoo is missing (3x CL32-GAP + CL8-SyntaxMask)
    assert len(names) == 117
    failures = {}
    for name in names:
        try:
            _shape_init(name)
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, (
        f"{len(failures)}/{len(names)} configs failed to build:\n"
        + "\n".join(f"  {k}: {v[:140]}" for k, v in sorted(failures.items()))
    )


def _vision_param_count(variables):
    p = variables["params"]["visual"]
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(p))


@pytest.mark.parametrize(
    "name,expected_m,tol",
    [
        # published image-tower sizes (model cards / papers)
        ("EVA02-B-16", 86, 0.05),
        ("EVA02-L-14", 304, 0.05),
        ("EVA01-g-14", 1013, 0.05),
        ("ViTamin-S", 22, 0.10),
        ("ViTamin-B", 87, 0.10),
        ("swin_base_patch4_window7_224", 88, 0.05),
        ("MobileCLIP-S1", 21.5, 0.10),
        ("MobileCLIP-S2", 35.7, 0.10),
        ("vit_medium_patch16_gap_256", 39, 0.05),
    ],
)
def test_trunk_family_param_counts(name, expected_m, tol):
    _, variables = _shape_init(name)
    got = _vision_param_count(variables) / 1e6
    assert abs(got - expected_m) / expected_m < tol, (
        f"{name}: visual tower {got:.1f}M params, expected ~{expected_m}M"
    )


def test_forward_shapes_new_families():
    for name in ("EVA02-B-16", "ViTamin-S", "MobileCLIP-S1",
                 "swin_base_patch4_window7_224"):
        bundle, variables = _shape_init(name)
        cfg = bundle.model_cfg
        image_size = cfg["vision_cfg"].get("image_size", 224)
        ctx = cfg["text_cfg"].get("context_length", 77)
        img = jnp.zeros((2, image_size, image_size, 3), jnp.float32)
        txt = jnp.zeros((2, ctx), jnp.int32)
        out = jax.eval_shape(
            lambda v: bundle.module.apply(v, img, text=txt), variables
        )
        assert out["image_features"].shape == (2, cfg["embed_dim"]), name
        assert out["text_features"].shape == (2, cfg["embed_dim"]), name

"""SigLIP timm trunks: MAP (attention-pool-latent) head, cls-free sequence,
so400m's non-integer mlp ratio, and the attn_pool checkpoint mapping.

Regression (round-3 review): 'map' pool silently degraded to mean-pooling,
the trunk grew a cls token SigLIP weights don't have, and attn_pool.* keys
raised UnmappedKeysError — every shipped *-SigLIP registry entry built an
architecture that could never load its weights. Reference loads these via
timm (timm_model.py:29-47, timm AttentionPoolLatent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.convert.timm_convert import convert_timm_vit_state_dict
from xtagclip_tpu.factory import create_model
from xtagclip_tpu.models.timm_vit import MapPool, TimmModel, TimmViT


def _vision_params(name):
    bundle = create_model(name, skip_init=True)
    cfg = bundle.model_cfg
    size = cfg["vision_cfg"].get("image_size", 224)
    ctx = cfg["text_cfg"].get("context_length", 77)
    variables = jax.eval_shape(
        lambda: bundle.module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, size, size, 3), jnp.float32),
            text=jnp.zeros((1, ctx), jnp.int32),
        )
    )
    return variables["params"]["visual"]


@pytest.mark.parametrize(
    "name,expected_m",
    [
        ("ViT-B-16-SigLIP", 92.9),       # timm vit_base_patch16_siglip_224
        ("ViT-L-16-SigLIP-256", 315.9),  # timm vit_large_patch16_siglip_256
        ("ViT-SO400M-14-SigLIP", 427.7),  # timm vit_so400m_patch14_siglip_224
    ],
)
def test_siglip_tower_param_counts(name, expected_m):
    vis = _vision_params(name)
    trunk = vis["trunk"]
    assert "cls_token" not in trunk, "SigLIP trunks are cls-free"
    assert "attn_pool" in vis, "'map' pool must build the MAP head"
    got = sum(int(np.prod(x.shape))
              for x in jax.tree_util.tree_leaves(vis)) / 1e6
    assert abs(got - expected_m) / expected_m < 0.01, (
        f"{name}: visual tower {got:.1f}M params, expected ~{expected_m}M")


def test_so400m_mlp_hidden_is_4304():
    vis = _vision_params("ViT-SO400M-14-SigLIP")
    assert vis["trunk"]["blocks_0"]["fc1"]["kernel"].shape == (1152, 4304)
    assert vis["attn_pool"]["mlp_fc1"]["kernel"].shape == (1152, 4304)


def _tiny_siglip():
    trunk = TimmViT(patch_size=8, width=64, layers=2, heads=4,
                    use_cls_token=False, name="trunk")
    return TimmModel(embed_dim=64, width=64, heads=4, pool="map",
                     proj="none", trunk=trunk, name="visual")


def test_map_pool_forward_differs_from_mean():
    model = _tiny_siglip()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    pooled, tokens = model.apply(variables, x)
    assert pooled.shape == (2, 64)
    assert tokens.shape == (2, 16, 64)
    assert not np.allclose(np.asarray(pooled),
                           np.asarray(tokens.mean(axis=1)), atol=1e-3)


def test_attn_pool_torch_keys_convert():
    """A timm-layout sd (attn_pool.latent/q/kv/proj/norm/mlp.fc*) converts
    onto the init tree with exact paths, shapes and values."""
    model = _tiny_siglip()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    rng = np.random.default_rng(2)
    params = jax.tree.map(
        lambda a: np.asarray(rng.standard_normal(a.shape), np.float32), params)

    # manufacture the documented torch layout from the flax tree
    sd = {}
    t = params["trunk"]
    sd["pos_embed"] = t["pos_embed"]
    pk = t["patch_embed"]["kernel"]  # [p*p*3, D]
    sd["patch_embed.proj.weight"] = np.ascontiguousarray(
        pk.reshape(8, 8, 3, -1).transpose(3, 2, 0, 1))
    sd["patch_embed.proj.bias"] = t["patch_embed"]["bias"]
    for i in range(2):
        b = t[f"blocks_{i}"]
        for ln in ("norm1", "norm2"):
            sd[f"blocks.{i}.{ln}.weight"] = b[ln]["scale"]
            sd[f"blocks.{i}.{ln}.bias"] = b[ln]["bias"]
        sd[f"blocks.{i}.attn.qkv.weight"] = b["qkv"]["kernel"].T
        sd[f"blocks.{i}.attn.qkv.bias"] = b["qkv"]["bias"]
        sd[f"blocks.{i}.attn.proj.weight"] = b["proj"]["kernel"].T
        sd[f"blocks.{i}.attn.proj.bias"] = b["proj"]["bias"]
        sd[f"blocks.{i}.mlp.fc1.weight"] = b["fc1"]["kernel"].T
        sd[f"blocks.{i}.mlp.fc1.bias"] = b["fc1"]["bias"]
        sd[f"blocks.{i}.mlp.fc2.weight"] = b["fc2"]["kernel"].T
        sd[f"blocks.{i}.mlp.fc2.bias"] = b["fc2"]["bias"]
    sd["norm.weight"] = t["norm"]["scale"]
    sd["norm.bias"] = t["norm"]["bias"]
    ap = params["attn_pool"]
    sd["attn_pool.latent"] = ap["latent"]
    for lin in ("q", "kv", "proj"):
        sd[f"attn_pool.{lin}.weight"] = ap[lin]["kernel"].T
        sd[f"attn_pool.{lin}.bias"] = ap[lin]["bias"]
    sd["attn_pool.norm.weight"] = ap["norm"]["scale"]
    sd["attn_pool.norm.bias"] = ap["norm"]["bias"]
    for fc in ("fc1", "fc2"):
        sd[f"attn_pool.mlp.{fc}.weight"] = ap[f"mlp_{fc}"]["kernel"].T
        sd[f"attn_pool.mlp.{fc}.bias"] = ap[f"mlp_{fc}"]["bias"]

    tree = convert_timm_vit_state_dict(sd)
    hoisted = tree.pop("__attn_pool__")

    def paths(x):
        return {jax.tree_util.keystr(p): np.asarray(v).shape
                for p, v in jax.tree_util.tree_leaves_with_path(x)}

    assert paths(tree) == paths(params["trunk"])
    assert paths(hoisted) == paths(params["attn_pool"])
    for (p1, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(hoisted),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(params["attn_pool"]),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

"""Scaled-cosine / per-head-scale attention options.

Parity vs the reference's custom Attention (transformer.py:92-188:
scaled_cosine replaces dot-product scores with cosine similarity between
L2-normalized q/k under a learned per-head temperature clamped at
logit_scale_max; scale_heads applies a learned per-head output gain), and
the CustomResidualAttentionBlock wiring (transformer.py:271-316: ln_attn
after the attention residual branch when scale_attn, a mid-MLP LayerNorm
when scale_fc). No shipped config enables these — they are API surface for
checkpoint compatibility.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.models.layers import MultiheadAttention, ResidualAttentionBlock


def _np(t):
    return np.asarray(jax.device_get(t), np.float32)


def _attn_params(e, rng):
    return {
        "in_proj": {
            "kernel": jnp.asarray(
                rng.standard_normal((e, 3 * e), dtype=np.float32) * 0.05),
            "bias": jnp.asarray(
                rng.standard_normal(3 * e).astype(np.float32) * 0.01),
        },
        "out_proj": {
            "kernel": jnp.asarray(
                rng.standard_normal((e, e), dtype=np.float32) * 0.05),
            "bias": jnp.zeros((e,), jnp.float32),
        },
    }


def test_scaled_cosine_matches_reference_attention():
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ref_compat import import_ref_open_clip

    oc = import_ref_open_clip()
    from open_clip.transformer import Attention as RefAttention  # noqa: F401

    e, h, b, l = 64, 4, 2, 9
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, l, e)).astype(np.float32)

    # scale_heads=False: the reference's own head_scale branch crashes for
    # ANY input (transformer.py:177 views [N*H, L, dh] as [N, H, L, C] — a
    # factor-H size mismatch; dead upstream code). Our head_scale semantics
    # (per-head output gain before out_proj, the evident intent) are pinned
    # behaviorally in test_scale_heads_gains_one_head below.
    ref = RefAttention(e, h, scaled_cosine=True, scale_heads=False)
    ref.eval()
    with torch.no_grad():
        # non-default logit_scale values so the clamp/exp path is exercised
        ref.logit_scale.copy_(torch.linspace(0.5, 5.0, h).view(h, 1, 1))
        out_ref = ref(torch.from_numpy(x)).numpy()

    mod = MultiheadAttention(num_heads=h, scaled_cosine=True)
    params = _attn_params(e, rng)
    # port the torch weights: in_proj_weight [3E, E] -> kernel [E, 3E]
    params["in_proj"]["kernel"] = jnp.asarray(
        ref.in_proj_weight.detach().numpy().T)
    params["in_proj"]["bias"] = jnp.asarray(ref.in_proj_bias.detach().numpy())
    params["out_proj"]["kernel"] = jnp.asarray(
        ref.out_proj.weight.detach().numpy().T)
    params["out_proj"]["bias"] = jnp.asarray(
        ref.out_proj.bias.detach().numpy())
    params["logit_scale"] = jnp.asarray(ref.logit_scale.detach().numpy())

    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(out), out_ref, atol=2e-5, rtol=2e-5)


def test_scale_heads_gains_one_head():
    """head_scale is a per-head output gain applied before out_proj:
    with identity out_proj and v-proj, doubling head h's gain doubles
    exactly that head's dh-slice of the output."""
    e, h = 32, 4
    dh = e // h
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 6, e)).astype(np.float32))
    params = _attn_params(e, rng)
    k = np.array(params["in_proj"]["kernel"])
    k[:, 2 * e:] = np.eye(e)  # v = xn
    params["in_proj"]["kernel"] = jnp.asarray(k)
    params["in_proj"]["bias"] = jnp.zeros((3 * e,), jnp.float32)
    params["out_proj"]["kernel"] = jnp.eye(e, dtype=np.float32)
    params["out_proj"]["bias"] = jnp.zeros((e,), jnp.float32)
    mod = MultiheadAttention(num_heads=h, scale_heads=True)
    params["head_scale"] = jnp.ones((h, 1, 1), jnp.float32)
    base = _np(mod.apply({"params": params}, x))
    gains = np.ones((h, 1, 1), np.float32)
    gains[1] = 2.0
    params["head_scale"] = jnp.asarray(gains)
    out = _np(mod.apply({"params": params}, x))
    np.testing.assert_allclose(out[..., dh:2 * dh], 2 * base[..., dh:2 * dh],
                               rtol=1e-5)
    np.testing.assert_allclose(out[..., :dh], base[..., :dh], rtol=1e-5)
    np.testing.assert_allclose(out[..., 2 * dh:], base[..., 2 * dh:],
                               rtol=1e-5)


def test_logit_scale_max_clamps():
    e, h, b, l = 32, 2, 1, 5
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, l, e)).astype(np.float32))
    params = _attn_params(e, rng)
    big = math.log(1.0 / 0.01) + 3.0  # above the default clamp
    params["logit_scale"] = jnp.full((h, 1, 1), big, jnp.float32)
    mod = MultiheadAttention(num_heads=h, scaled_cosine=True)
    out_clamped = mod.apply({"params": params}, x)
    params["logit_scale"] = jnp.full((h, 1, 1), math.log(1.0 / 0.01),
                                     jnp.float32)
    out_at_max = mod.apply({"params": params}, x)
    np.testing.assert_allclose(_np(out_clamped), _np(out_at_max),
                               atol=1e-6, rtol=1e-6)


def test_scaled_cosine_invariant_to_qk_magnitude():
    """Cosine scores depend only on q/k directions: doubling the in_proj
    q/k columns (with zero bias) must not change the output."""
    e, h, b, l = 32, 2, 2, 7
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((b, l, e)).astype(np.float32))
    params = _attn_params(e, rng)
    params["in_proj"]["bias"] = jnp.zeros((3 * e,), jnp.float32)
    mod = MultiheadAttention(num_heads=h, scaled_cosine=True)
    params["logit_scale"] = jnp.zeros((h, 1, 1), jnp.float32)
    base = mod.apply({"params": params}, x)
    k = params["in_proj"]["kernel"]
    params["in_proj"]["kernel"] = jnp.concatenate(
        [2.0 * k[:, :2 * e], k[:, 2 * e:]], axis=-1)
    scaled = mod.apply({"params": params}, x)
    np.testing.assert_allclose(_np(base), _np(scaled), atol=1e-5, rtol=1e-5)


def test_block_custom_options_param_tree_and_forward():
    """The CustomResidualAttentionBlock surface: extra ln_attn / mlp.ln /
    logit_scale / head_scale params exist exactly when enabled, and the
    forward runs (fused path must NOT engage for these blocks)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 64)).astype(np.float32),
                    jnp.bfloat16)
    block = ResidualAttentionBlock(
        num_heads=4, dtype=jnp.bfloat16, scale_cosine_attn=True,
        scale_heads=True, scale_attn=True, scale_fc=True)
    v = block.init(jax.random.PRNGKey(0), x)
    p = v["params"]
    assert "logit_scale" in p["attn"]
    assert "head_scale" in p["attn"]
    assert "ln_attn" in p
    assert "ln" in p["mlp"]
    out = block.apply(v, x)
    assert out.shape == x.shape and np.isfinite(_np(out)).all()

    plain = ResidualAttentionBlock(num_heads=4, dtype=jnp.bfloat16)
    vp = plain.init(jax.random.PRNGKey(0), x)
    assert "logit_scale" not in vp["params"]["attn"]
    assert "ln_attn" not in vp["params"]
    assert "ln" not in vp["params"]["mlp"]


def test_block_scale_attn_matches_reference_block():
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ref_compat import import_ref_open_clip

    import_ref_open_clip()
    from open_clip.transformer import CustomResidualAttentionBlock

    e, h, b, l = 64, 4, 2, 9
    rng = np.random.default_rng(4)
    x = rng.standard_normal((b, l, e)).astype(np.float32)

    # scale_heads=False: the reference head_scale forward crashes (see
    # test_scaled_cosine_matches_reference_attention)
    ref = CustomResidualAttentionBlock(
        e, h, scale_cosine_attn=True, scale_heads=False, scale_attn=True,
        scale_fc=True)
    ref.eval()
    with torch.no_grad():
        ref.attn.logit_scale.copy_(torch.linspace(1.0, 3.0, h).view(h, 1, 1))
        out_ref = ref(torch.from_numpy(x)).numpy()

    block = ResidualAttentionBlock(
        num_heads=h, scale_cosine_attn=True,
        scale_attn=True, scale_fc=True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "ln_1": {"scale": sd["ln_1.weight"], "bias": sd["ln_1.bias"]},
        "ln_attn": {"scale": sd["ln_attn.weight"],
                    "bias": sd["ln_attn.bias"]},
        "ln_2": {"scale": sd["ln_2.weight"], "bias": sd["ln_2.bias"]},
        "attn": {
            "in_proj": {"kernel": sd["attn.in_proj_weight"].T,
                        "bias": sd["attn.in_proj_bias"]},
            "out_proj": {"kernel": sd["attn.out_proj.weight"].T,
                         "bias": sd["attn.out_proj.bias"]},
            "logit_scale": sd["attn.logit_scale"],
        },
        "mlp": {
            "c_fc": {"kernel": sd["mlp.c_fc.weight"].T,
                     "bias": sd["mlp.c_fc.bias"]},
            "ln": {"scale": sd["mlp.ln.weight"], "bias": sd["mlp.ln.bias"]},
            "c_proj": {"kernel": sd["mlp.c_proj.weight"].T,
                       "bias": sd["mlp.c_proj.bias"]},
        },
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)
    out = block.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(out), out_ref, atol=5e-5, rtol=5e-5)

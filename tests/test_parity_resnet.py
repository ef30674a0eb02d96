"""ModifiedResNet checkpoint-conversion parity vs the reference
(modified_resnet.py:95-181): stem convs + bns, bottleneck layers with
avg-pool antialias downsample, AttentionPool2d — including running BN stats
into the batch_stats collection. Regression: the converter had no RN mapping
at all, so every RN50/RN101 pretrained load raised KeyError."""

import json
import os
import sys
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from ref_compat import import_ref_open_clip  # noqa: E402

from xtagclip_tpu.convert.openclip import convert_openclip_state_dict  # noqa: E402
from xtagclip_tpu.factory import add_model_config, create_model  # noqa: E402

pytestmark = pytest.mark.parity

VISION_CFG = dict(layers=[1, 1, 1, 1], width=32, image_size=64)
TEXT_CFG = dict(context_length=12, vocab_size=100, width=64, heads=2, layers=1)
EMBED_DIM = 64


@pytest.fixture(scope="module")
def pair():
    oc = import_ref_open_clip()
    import torch

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir("/root/reference/src/open_clip")  # tag config paths are CWD-relative
    try:
        ref = oc.CLIP(
            embed_dim=EMBED_DIM, vision_cfg=VISION_CFG, text_cfg=TEXT_CFG,
            output_dict=True,
        )
    finally:
        os.chdir(cwd)
    ref.eval()
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
        # make running BN stats non-trivial so eval-mode parity proves they
        # loaded (buffers, not parameters — untouched by the loop above)
        for name, b in ref.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=gen) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(1.0 + 0.3 * torch.rand(b.shape, generator=gen))

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = dict(embed_dim=EMBED_DIM, vision_cfg=VISION_CFG, text_cfg=TEXT_CFG)
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tiny-rn-",
                                     delete=False) as f:
        json.dump(cfg, f)
        cfg_path = f.name
    add_model_config(cfg_path)
    bundle = create_model(os.path.basename(cfg_path)[:-5])

    converted = convert_openclip_state_dict(sd)
    bn_stats = converted.pop("__batch_stats__")

    flat_init = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(bundle.params)}
    flat_conv = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(converted)}
    # the reference CLIP always carries tag/fusion heads (model.py:270-288);
    # this bundle builds without them, so converted may have EXTRA keys but
    # every init param must be covered
    missing = flat_init - flat_conv
    assert not missing, f"missing={sorted(missing)[:8]}"
    converted = {k: v for k, v in converted.items() if k in bundle.params}

    init_stats = bundle.extra_variables["batch_stats"]
    s_init = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(init_stats)}
    s_conv = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(bn_stats)}
    assert s_init == s_conv, (
        f"stats missing={sorted(s_init - s_conv)[:8]} "
        f"extra={sorted(s_conv - s_init)[:8]}")

    bundle.params = jax.tree.map(jnp.asarray, converted)
    bundle.extra_variables["batch_stats"] = jax.tree.map(jnp.asarray, bn_stats)
    return ref, bundle


def test_rn_visual_parity(pair):
    """Pooled features vs the reference tower called DIRECTLY: the reference
    RN attnpool returns only x[0] (modified_resnet.py:92), so its XTag
    encode_image tuple-unpack `features, token = self.visual(image)` splits
    the BATCH for RN towers — a reference bug our (pooled, tokens) return
    fixes (COMPONENT_MAP 'returning (pooled, tokens)')."""
    import torch

    ref, bundle = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_pooled = ref.visual(torch.from_numpy(x))
    assert ref_pooled.shape == (2, EMBED_DIM)
    pooled, tokens = bundle.module.apply(
        {"params": bundle.params,
         "batch_stats": bundle.extra_variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), False,
        method=bundle.module.encode_image,
    )
    np.testing.assert_allclose(
        np.asarray(pooled), ref_pooled.numpy(), atol=1e-3, rtol=1e-3)
    assert tokens.shape == (2, 4, EMBED_DIM)  # 64px / 32 stride -> 2x2 grid

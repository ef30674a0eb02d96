"""Numerical parity: our JAX CLIP vs the reference PyTorch CLIP, same weights.

Builds the reference model with random init, converts its state_dict, and
asserts encode_image / encode_text / tag_forward / TQN fusion agree within
1e-3 (the BASELINE.json bar; observed agreement is much tighter in fp32).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from ref_compat import import_ref_open_clip  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from xtagclip_tpu.convert.openclip import convert_openclip_state_dict  # noqa: E402
from xtagclip_tpu.factory import create_model  # noqa: E402

pytestmark = pytest.mark.parity

# embed_dim and text width must be 512: the reference TQN fusion head
# hard-codes d_model=512 (CAR_heads/TQN_model.py:22) and feeds it raw text
# tokens in text-width space (model.py:553-561), so fusion only works on
# configs with text width == embed_dim == 512 (e.g. ViT-B-32).
VISION_CFG = dict(layers=2, width=64, head_width=32, patch_size=8, image_size=32)
TEXT_CFG = dict(context_length=20, vocab_size=120, width=512, heads=4, layers=2)
EMBED_DIM = 512


@pytest.fixture(scope="module")
def pair():
    """(reference torch model, our bundle with converted params)."""
    oc = import_ref_open_clip()
    import torch

    torch.manual_seed(0)
    cwd = os.getcwd()
    os.chdir("/root/reference/src/open_clip")  # tag config paths are CWD-relative
    try:
        ref = oc.CLIP(
            embed_dim=EMBED_DIM, vision_cfg=VISION_CFG, text_cfg=TEXT_CFG,
            output_dict=True, use_tagging=False, use_fusion=True,
        )
    finally:
        os.chdir(cwd)
    ref.eval()
    # randomize every weight so parity is non-trivial (many init to zeros)
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}

    import json, tempfile
    from xtagclip_tpu.factory import add_model_config

    cfg = dict(embed_dim=EMBED_DIM, vision_cfg=VISION_CFG, text_cfg=TEXT_CFG)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", prefix="tiny-parity-", delete=False
    ) as f:
        json.dump(cfg, f)
        cfg_path = f.name
    add_model_config(cfg_path)
    name = os.path.basename(cfg_path)[: -len(".json")]
    bundle = create_model(name, use_fusion=True)
    converted = convert_openclip_state_dict(sd)

    # every param in the init tree must be provided by the converter
    flat_init = jax.tree_util.tree_leaves_with_path(bundle.params)
    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    init_paths = {jax.tree_util.keystr(p) for p, _ in flat_init}
    conv_paths = {jax.tree_util.keystr(p) for p, _ in flat_conv}
    assert init_paths == conv_paths, (
        f"missing={sorted(init_paths - conv_paths)[:8]} "
        f"extra={sorted(conv_paths - init_paths)[:8]}"
    )
    for (p1, a), (p2, b) in zip(
        sorted(flat_init, key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(flat_conv, key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert a.shape == np.asarray(b).shape, (
            f"{jax.tree_util.keystr(p1)}: {a.shape} vs {np.asarray(b).shape}"
        )

    bundle.params = jax.tree.map(jnp.asarray, converted)
    return ref, bundle


def test_encode_image_parity(pair, rng):
    import torch

    ref, bundle = pair
    img = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref_feat, ref_tok = ref.encode_image(torch.from_numpy(img), normalize=True)
    feat, tok = bundle.encode_image(jnp.asarray(img.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(tok), ref_tok.numpy(), atol=1e-3)


def test_encode_text_parity(pair, rng):
    import torch

    ref, bundle = pair
    text = rng.integers(1, 100, size=(3, 20)).astype(np.int64)
    text[:, 0] = 110
    text[:, -1] = 119  # highest id acts as EOT for argmax pooling
    with torch.no_grad():
        ref_feat, ref_seq = ref.encode_text(torch.from_numpy(text), normalize=True)
    feat, seq = bundle.encode_text(jnp.asarray(text.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(seq), ref_seq.numpy(), atol=1e-3)


def test_tag_forward_parity(pair, rng):
    import torch

    ref, bundle = pair
    tokens = rng.standard_normal((2, 17, EMBED_DIM), dtype=np.float32)
    with torch.no_grad():
        ref_logits = ref.tag_forward(torch.from_numpy(tokens))
    logits = bundle.apply(
        jnp.asarray(tokens), method=bundle.module.tag_forward
    )
    assert logits.shape == (2, 44)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=1e-3)


def test_fusion_parity(pair, rng):
    import torch

    ref, bundle = pair
    mem = rng.standard_normal((2, 9, 512), dtype=np.float32)
    q = rng.standard_normal((2, 512), dtype=np.float32)
    with torch.no_grad():
        ref_out = ref.fusion_model(torch.from_numpy(mem), torch.from_numpy(q))
    out = bundle.module.apply(
        {"params": bundle.params}, jnp.asarray(mem), jnp.asarray(q),
        method=lambda m, a, b: m.fusion_model(a, b),
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), atol=1e-3
    )


def test_tag_indices_match_reference_control_words(pair, rng):
    import torch

    ref, bundle = pair
    tag_logits = rng.standard_normal((4, 44), dtype=np.float32)
    words = ref.prepare_control_words(torch.from_numpy(tag_logits))
    local_idx, global_idx = bundle.module.apply(
        {"params": bundle.params}, jnp.asarray(tag_logits),
        method=lambda m, x: m.prepare_tag_indices(x),
    )
    tag_list = ref.tag_list
    ours = [",".join(tag_list[i] for i in row) for row in np.asarray(global_idx)]
    assert ours == words

"""big_vision / SigLIP .npz converter (reference convert.py:13-150): mapping
correctness on a synthesized tiny archive — qkv fusion order, pos-embedding
reshape, block-count detection, both key-prefix variants, scalar logits."""

import numpy as np
import pytest

from xtagclip_tpu.convert.big_vision import load_big_vision_weights

D, HEADS, HDIM, FF, CTX, VOCAB, EMB = 32, 4, 8, 64, 16, 100, 24


def _block(w, prefix, i, rng):
    b = f"{prefix}/encoderblock_{i}"
    w[f"{b}/LayerNorm_0/scale"] = rng.standard_normal(D).astype(np.float32)
    w[f"{b}/LayerNorm_0/bias"] = rng.standard_normal(D).astype(np.float32)
    w[f"{b}/LayerNorm_1/scale"] = rng.standard_normal(D).astype(np.float32)
    w[f"{b}/LayerNorm_1/bias"] = rng.standard_normal(D).astype(np.float32)
    att = f"{b}/MultiHeadDotProductAttention_0"
    for n in ("query", "key", "value"):
        w[f"{att}/{n}/kernel"] = rng.standard_normal(
            (D, HEADS, HDIM)).astype(np.float32)
        w[f"{att}/{n}/bias"] = rng.standard_normal(
            (HEADS, HDIM)).astype(np.float32)
    w[f"{att}/out/kernel"] = rng.standard_normal(
        (HEADS, HDIM, D)).astype(np.float32)
    w[f"{att}/out/bias"] = rng.standard_normal(D).astype(np.float32)
    mlp = f"{b}/MlpBlock_0"
    w[f"{mlp}/Dense_0/kernel"] = rng.standard_normal((D, FF)).astype(np.float32)
    w[f"{mlp}/Dense_0/bias"] = rng.standard_normal(FF).astype(np.float32)
    w[f"{mlp}/Dense_1/kernel"] = rng.standard_normal((FF, D)).astype(np.float32)
    w[f"{mlp}/Dense_1/bias"] = rng.standard_normal(D).astype(np.float32)


def _make_npz(tmp_path, img_prefix="img", txt_prefix="txt",
              scalar_prefix=""):
    rng = np.random.default_rng(0)
    w = {}
    w[f"{img_prefix}/embedding/kernel"] = rng.standard_normal(
        (4, 4, 3, D)).astype(np.float32)
    w[f"{img_prefix}/pos_embedding"] = rng.standard_normal(
        (1, 16, D)).astype(np.float32)
    for i in range(2):
        _block(w, f"{img_prefix}/Transformer", i, rng)
    w[f"{img_prefix}/Transformer/encoder_norm/scale"] = rng.standard_normal(
        D).astype(np.float32)
    w[f"{img_prefix}/Transformer/encoder_norm/bias"] = rng.standard_normal(
        D).astype(np.float32)

    w[f"{txt_prefix}/Embed_0/embedding"] = rng.standard_normal(
        (VOCAB, D)).astype(np.float32)
    w[f"{txt_prefix}/pos_embedding"] = rng.standard_normal(
        (CTX, D)).astype(np.float32)
    for i in range(3):
        _block(w, f"{txt_prefix}/Encoder_0", i, rng)
    w[f"{txt_prefix}/Encoder_0/encoder_norm/scale"] = rng.standard_normal(
        D).astype(np.float32)
    w[f"{txt_prefix}/Encoder_0/encoder_norm/bias"] = rng.standard_normal(
        D).astype(np.float32)
    w[f"{txt_prefix}/head/kernel"] = rng.standard_normal(
        (D, EMB)).astype(np.float32)
    w[f"{txt_prefix}/head/bias"] = rng.standard_normal(EMB).astype(np.float32)

    w[f"{scalar_prefix}t"] = np.float32(2.0)
    w[f"{scalar_prefix}b"] = np.float32(-10.0)

    path = str(tmp_path / "bv.npz")
    np.savez(path, **w)
    return path, w


@pytest.mark.parametrize("prefixed", [False, True])
def test_big_vision_mapping(tmp_path, prefixed):
    if prefixed:
        path, w = _make_npz(tmp_path, "params/img", "params/txt", "params/")
    else:
        path, w = _make_npz(tmp_path)
    tree = load_big_vision_weights(path)
    ik = "params/img" if prefixed else "img"
    tk = "params/txt" if prefixed else "txt"

    # patchify kernel flattened to [ph*pw*C, D]
    np.testing.assert_array_equal(
        tree["visual"]["conv1"]["kernel"],
        w[f"{ik}/embedding/kernel"].reshape(-1, D))
    # leading broadcast dim dropped from the pos embedding
    assert tree["visual"]["positional_embedding"].shape == (16, D)
    # block-count detection: 2 vision / 3 text blocks
    assert sorted(tree["visual"]["transformer"]) == ["resblocks_0",
                                                     "resblocks_1"]
    assert sorted(tree["text"]["transformer"]) == ["resblocks_0",
                                                   "resblocks_1",
                                                   "resblocks_2"]
    # fused qkv: q|k|v concatenation on the output axis, head dims flattened
    att = f"{ik}/Transformer/encoderblock_0/MultiHeadDotProductAttention_0"
    expect = np.concatenate(
        [w[f"{att}/{n}/kernel"].reshape(D, -1) for n in
         ("query", "key", "value")], axis=1)
    got = tree["visual"]["transformer"]["resblocks_0"]["attn"]["in_proj"]
    np.testing.assert_array_equal(got["kernel"], expect)
    assert got["bias"].shape == (3 * D,)
    np.testing.assert_array_equal(
        tree["visual"]["transformer"]["resblocks_0"]["attn"]["out_proj"]
        ["kernel"],
        w[f"{att}/out/kernel"].reshape(-1, D))
    # encoder_norm -> ln_post / ln_final
    np.testing.assert_array_equal(
        tree["visual"]["ln_post"]["scale"],
        w[f"{ik}/Transformer/encoder_norm/scale"])
    np.testing.assert_array_equal(
        tree["text"]["ln_final"]["bias"],
        w[f"{tk}/Encoder_0/encoder_norm/bias"])
    # text head -> projection with bias; token/pos embeddings verbatim
    assert tree["text"]["text_projection"]["kernel"].shape == (D, EMB)
    assert tree["text"]["text_projection"]["bias"].shape == (EMB,)
    np.testing.assert_array_equal(
        tree["text"]["token_embedding"]["embedding"],
        w[f"{tk}/Embed_0/embedding"])
    # scalar logit scale / bias
    assert tree["logit_scale"].shape == ()
    assert float(tree["logit_scale"]) == 2.0
    assert float(tree["logit_bias"]) == -10.0

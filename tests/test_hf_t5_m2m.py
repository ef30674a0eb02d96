"""Parity of the mT5 (T5 encoder) and NLLB (M2M100 encoder) text trunks vs
transformers torch models with shared random weights, plus hf_text family
dispatch (unknown names must raise, never silently build BERT shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtagclip_tpu.convert.hf_m2m100 import convert_hf_m2m100_state_dict
from xtagclip_tpu.convert.hf_t5 import convert_hf_t5_state_dict
from xtagclip_tpu.models.m2m100 import M2M100Encoder
from xtagclip_tpu.models.t5 import T5EncoderStack

pytestmark = pytest.mark.parity


def test_t5_encoder_parity_vs_transformers(rng):
    import torch
    from transformers import T5Config, T5EncoderModel

    cfg = T5Config(
        vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=3,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu",  # mt5-style gated act
    )
    torch.manual_seed(0)
    tm = T5EncoderModel(cfg).eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    ours = T5EncoderStack(vocab_size=256, d_model=64, d_kv=16, d_ff=128,
                          num_layers=3, num_heads=4, dropout=0.0)
    ids = rng.integers(2, 256, size=(2, 20)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[:, 15:] = 0
    ids[:, 15:] = 0  # pad id

    params = convert_hf_t5_state_dict(sd)
    with torch.no_grad():
        want = tm(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    got = ours.apply({"params": params}, jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_t5_relative_bucket_matches_hf():
    import torch
    from transformers.models.t5.modeling_t5 import T5Attention

    from xtagclip_tpu.models.t5 import relative_position_bucket

    rel = np.arange(-200, 201).reshape(1, -1)
    want = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32,
        max_distance=128,
    ).numpy()
    got = np.asarray(relative_position_bucket(jnp.asarray(rel), 32, 128))
    np.testing.assert_array_equal(got, want)


def test_m2m100_encoder_parity_vs_transformers(rng):
    import torch
    from transformers import M2M100Config, M2M100Model

    cfg = M2M100Config(
        vocab_size=256, d_model=64, encoder_layers=2, decoder_layers=1,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_position_embeddings=64, dropout=0.0, attention_dropout=0.0,
        scale_embedding=True, pad_token_id=1,
    )
    torch.manual_seed(0)
    tm = M2M100Model(cfg).eval()
    enc = tm.get_encoder()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    ours = M2M100Encoder(vocab_size=256, d_model=64, num_layers=2,
                         num_heads=4, ffn_dim=128,
                         max_position_embeddings=64, pad_token_id=1,
                         dropout=0.0)
    ids = rng.integers(4, 256, size=(2, 18)).astype(np.int32)
    ids[:, 14:] = 1  # pad
    mask = (ids != 1).astype(np.int32)

    params = convert_hf_m2m100_state_dict(sd)
    with torch.no_grad():
        want = enc(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    got = ours.apply({"params": params}, jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_unknown_hf_arch_raises():
    from xtagclip_tpu.models.hf_text import resolve_hf_config

    with pytest.raises(NotImplementedError):
        resolve_hf_config("totally/unknown-model-v9")


def test_mt5_and_nllb_configs_build_true_towers():
    """The 6 previously-wrong configs now build real T5/M2M100 trunks."""
    from xtagclip_tpu.factory import create_model, get_model_config

    for name, trunk_param in [
        ("mt5-base-ViT-B-32", "relpos_bias"),       # T5 marker
        ("nllb-clip-base", "layer_norm"),            # M2M100 marker
    ]:
        cfg = get_model_config(name)
        # shrink vision tower so init is fast; keep the text trunk small too
        cfg["vision_cfg"].update(dict(layers=2, width=64, patch_size=16,
                                      image_size=32))
        hf = cfg["text_cfg"]["hf_model_name"]
        from xtagclip_tpu.models.hf_text import resolve_hf_config

        full = resolve_hf_config(hf)
        assert full["family"] == ("t5" if "mt5" in hf else "m2m100")

    # tiny end-to-end build via a direct HFTextEncoder (preset shapes are
    # too big to init in a unit test)
    from xtagclip_tpu.models.hf_text import HFTextEncoder

    import os
    import json
    import tempfile

    for family_cfg, marker in [
        (dict(model_type="mt5", vocab_size=128, d_model=32, num_layers=1,
              num_heads=2, d_kv=16, d_ff=64, pad_token_id=0), "relpos_bias"),
        (dict(model_type="m2m_100", vocab_size=128, d_model=32,
              encoder_layers=1, encoder_attention_heads=2,
              encoder_ffn_dim=64, max_position_embeddings=32,
              pad_token_id=1), "layer_norm"),
    ]:
        d = tempfile.mkdtemp()
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(family_cfg, f)
        enc = HFTextEncoder(model_name=d, output_dim=16, proj_type="linear",
                            pooler_type="mean_pooler")
        ids = jnp.asarray(np.random.default_rng(0).integers(
            2, 128, size=(2, 8)).astype(np.int32))
        params = enc.init(jax.random.PRNGKey(0), ids)["params"]
        assert marker in params["transformer"], (
            f"{family_cfg['model_type']}: trunk missing {marker}"
        )
        pooled, tokens = enc.apply({"params": params}, ids)
        assert pooled.shape == (2, 16)

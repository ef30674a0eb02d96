"""CoCa: build, forward dict contract, caption loss, generation."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.losses.coca import CoCaLoss

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=64,
    vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=8,
                    image_size=32, attentional_pool=True,
                    attn_pooler_queries=16, attn_pooler_heads=4),
    text_cfg=dict(context_length=12, vocab_size=200, width=64, heads=4,
                  layers=2, embed_cls=True, output_tokens=True),
    multimodal_cfg=dict(context_length=12, vocab_size=200, width=64, heads=4,
                        layers=2),
)


@pytest.fixture(scope="module")
def coca_bundle():
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinycoca-",
                                     delete=False) as f:
        json.dump(CFG, f)
        path = f.name
    add_model_config(path)
    return create_model(os.path.basename(path)[:-5])


def test_coca_forward_contract(coca_bundle, rng):
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    txt = jnp.asarray(rng.integers(1, 200, size=(2, 12)).astype(np.int32))
    out = coca_bundle.apply(img, txt)
    assert out["image_features"].shape == (2, 64)
    assert out["text_features"].shape == (2, 64)
    assert out["logits"].shape == (2, 11, 200)  # teacher forcing drops last
    assert out["labels"].shape == (2, 11)

    loss = CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0)
    d = loss(out["image_features"], out["text_features"], out["logits"],
             out["labels"], out["logit_scale"], output_dict=True)
    assert np.isfinite(float(d["contrastive_loss"]))
    assert np.isfinite(float(d["caption_loss"]))


@pytest.mark.parametrize("gen_type", ["top_k", "top_p", "beam_search"])
def test_coca_generation(coca_bundle, rng, gen_type):
    from xtagclip_tpu.models.coca import generate

    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    out = generate(
        coca_bundle.module, coca_bundle.params, img, seq_len=8,
        max_seq_len=12, generation_type=gen_type, top_k=3, top_p=0.9,
        min_seq_len=2, num_beams=3, sot_token_id=198, eos_token_id=199,
    )
    assert out.shape[0] == 2
    assert out.shape[1] <= 8
    assert (out[:, 0] == 198).all()


def test_coca_grouped_beam_search(coca_bundle, rng):
    """Grouped beams (reference coca_model.py:331-478): num_beam_groups
    sub-searches, optional Hamming diversity penalty."""
    from xtagclip_tpu.models.coca import generate

    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    out = generate(
        coca_bundle.module, coca_bundle.params, img, seq_len=8,
        max_seq_len=12, generation_type="beam_search", min_seq_len=2,
        num_beams=6, num_beam_groups=3, diversity_penalty=1.0,
        sot_token_id=198, eos_token_id=199,
    )
    assert out.shape[0] == 2 and out.shape[1] <= 8
    assert (out[:, 0] == 198).all()

    # fixed_output_length pads to seq_len exactly
    out = generate(
        coca_bundle.module, coca_bundle.params, img, seq_len=8,
        max_seq_len=12, generation_type="beam_search", min_seq_len=2,
        num_beams=4, num_beam_groups=2, sot_token_id=198, eos_token_id=199,
        fixed_output_length=True,
    )
    assert out.shape == (2, 8)

    with pytest.raises(ValueError):
        generate(
            coca_bundle.module, coca_bundle.params, img, seq_len=8,
            generation_type="beam_search", num_beams=5, num_beam_groups=3,
            sot_token_id=198, eos_token_id=199,
        )


def test_coca_train_step_descends(coca_bundle, rng):
    """CoCa through make_train_step (reference main.py CoCa training with
    CoCaLoss = weighted contrastive + pad-masked caption CE)."""
    from xtagclip_tpu.train.loop import make_train_step
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

    batch = {
        "images": rng.standard_normal((4, 32, 32, 3), dtype=np.float32),
        "texts": rng.integers(1, 200, size=(4, 12)).astype(np.int32),
    }
    tx = make_optimizer(cosine_lr(1e-3, 2, 50), params=coca_bundle.params)
    state = create_train_state(coca_bundle.params, tx)
    step = make_train_step(
        coca_bundle.module, tx,
        {"coca": True, "coca_caption_loss_weight": 2.0,
         "coca_contrastive_loss_weight": 1.0},
        donate=False,
    )
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(10):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert "caption_loss" in m and "contrastive_loss" in m


def test_coca_cli_synthetic(tmp_path):
    """CoCa end-to-end through the vanilla CLI on synthetic data."""
    import json as _json

    from xtagclip_tpu.cli import main as main_cli
    from xtagclip_tpu.factory import add_model_config

    cfg = dict(CFG)
    cfg_path = tmp_path / "coca_tiny-cli.json"
    cfg_path.write_text(_json.dumps(cfg))
    add_model_config(cfg_path)

    main_cli.main([
        "--model", "coca_tiny-cli",
        "--dataset-type", "synthetic",
        "--train-num-samples", "8",
        "--batch-size", "4", "--epochs", "1", "--warmup", "1",
        "--precision", "fp32", "--lr", "1e-4",
        "--logs", str(tmp_path / "logs"), "--name", "coca_e2e",
        "--log-every-n-steps", "1", "--val-frequency", "0",
        "--workers", "1",
    ])
    assert (tmp_path / "logs" / "coca_e2e" / "checkpoints" / "epoch_1").is_dir()


def test_top_p_filter_matches_hf_warper_semantics():
    """top_p keeps the smallest descending set reaching top_p mass
    (regression: the filter was inverted, keeping the top 1-top_p mass)."""
    import numpy as np

    from xtagclip_tpu.models.coca import top_p_filter

    # probs [0.5, 0.3, 0.15, 0.05] (logits = log p up to a constant)
    logits = np.log(np.array([[0.5, 0.3, 0.15, 0.05]]))
    out = top_p_filter(logits.copy(), 0.6)
    # cum = [0.5, 0.8, ...]: crossing token (idx 1) survives, rest removed
    assert np.isfinite(out[0, :2]).all()
    assert np.isinf(out[0, 2:]).all()

    out = top_p_filter(logits.copy(), 0.95)
    assert np.isfinite(out[0, :3]).all() and np.isinf(out[0, 3])

    # degenerate top_p keeps at least the argmax
    out = top_p_filter(logits.copy(), 1e-9)
    assert np.isfinite(out[0, 0]) and np.isinf(out[0, 1:]).all()

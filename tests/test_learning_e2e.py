"""Task-level learning evidence: contrastive training on separable synthetic
data must yield a zero-shot classifier that beats chance by a wide margin.

The loss-descends tests (test_train_step.py) pin the optimizer mechanics;
this pins the whole learning loop — train step -> encode_text classifier ->
encode_image -> similarity argmax — the reference's actual usage pattern
(train_other.py -> zero_shot_other.py)."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.train.loop import make_train_step
from xtagclip_tpu.train.scheduler import cosine_lr
from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=64,
    vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=8,
                    image_size=32),
    text_cfg=dict(context_length=8, vocab_size=1000, width=64, heads=2,
                  layers=2),
)

N_CLASSES = 3
STEPS = 60


def _class_image(rng, c, n=1):
    """Solid class-colored 32x32 images + noise: linearly separable."""
    img = np.full((n, 32, 32, 3), -0.5, dtype=np.float32)
    img[..., c] = 1.0
    return img + rng.standard_normal(img.shape).astype(np.float32) * 0.15


def _class_tokens(c):
    """Distinct per-class token rows; 999 (the max id) acts as the EOT the
    argmax pooling finds, at a fixed position."""
    row = np.zeros((8,), dtype=np.int32)
    row[0] = 100 + 50 * c
    row[1] = 400 + 50 * c
    row[2] = 999
    return row


def test_contrastive_training_learns_zero_shot_classes():
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="learn-",
                                     delete=False) as f:
        json.dump(CFG, f)
        path = f.name
    add_model_config(path)
    bundle = create_model(os.path.basename(path)[:-5])

    rng = np.random.default_rng(0)
    tx = make_optimizer(cosine_lr(2e-3, 5, STEPS), params=bundle.params,
                        weight_decay=0.1)
    state = create_train_state(bundle.params, tx)
    step = make_train_step(bundle.module, tx, {"use_tagging_loss": False},
                           donate=False)
    texts = jnp.asarray(np.stack([_class_tokens(c) for c in range(N_CLASSES)]))

    first = last = None
    for i in range(STEPS):
        batch = {
            "images": np.concatenate(
                [_class_image(rng, c) for c in range(N_CLASSES)]),
            "texts": texts,
        }
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first, (first, last)

    # zero-shot eval: class-text classifier over fresh noisy images
    params = state.params
    txt_feats, _ = bundle.module.apply(
        {"params": params}, texts, method=bundle.module.encode_text)
    txt_feats /= jnp.linalg.norm(txt_feats, axis=-1, keepdims=True)

    n_test = 10
    test_imgs = np.concatenate(
        [_class_image(rng, c, n_test) for c in range(N_CLASSES)])
    labels = np.repeat(np.arange(N_CLASSES), n_test)
    img_feats, _ = bundle.module.apply(
        {"params": params}, jnp.asarray(test_imgs), True,
        method=bundle.module.encode_image)
    pred = np.asarray(jnp.argmax(img_feats @ txt_feats.T, axis=-1))
    acc = (pred == labels).mean()
    assert acc >= 0.9, f"zero-shot accuracy {acc} (chance 0.33)"

"""scan_layers mode: identical outputs to the unrolled stack after param
stacking, with/without remat."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtagclip_tpu.factory import add_model_config, create_model
from xtagclip_tpu.parallel.scan_params import to_scanned, to_unrolled

pytestmark = pytest.mark.e2e

CFG = dict(
    embed_dim=64,
    vision_cfg=dict(layers=3, width=64, head_width=32, patch_size=8,
                    image_size=32),
    text_cfg=dict(context_length=12, vocab_size=100, width=64, heads=2,
                  layers=3),
)


@pytest.fixture(scope="module")
def name():
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="tinyscan-",
                                     delete=False) as f:
        json.dump(CFG, f)
        p = f.name
    add_model_config(p)
    return os.path.basename(p)[:-5]


def test_scan_matches_unrolled(name, rng):
    unrolled = create_model(name)
    scanned = create_model(name, scan_layers=True, skip_init=True)
    sparams = to_scanned(unrolled.params)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    txt = jnp.asarray(rng.integers(1, 99, size=(2, 12)).astype(np.int32))

    f_u, tok_u = unrolled.encode_image(img)
    f_s, tok_s = scanned.module.apply(
        {"params": sparams}, img, True, method=scanned.module.encode_image
    )
    np.testing.assert_allclose(np.asarray(f_u), np.asarray(f_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tok_u), np.asarray(tok_s), atol=1e-5)

    t_u, _ = unrolled.encode_text(txt)
    t_s, _ = scanned.module.apply(
        {"params": sparams}, txt, True, method=scanned.module.encode_text
    )
    np.testing.assert_allclose(np.asarray(t_u), np.asarray(t_s), atol=1e-5)

    # round trip back to unrolled layout
    back = to_unrolled(sparams)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(unrolled.params),
               key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back),
               key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_scan_with_remat_grads(name, rng):
    scanned = create_model(name, scan_layers=True, grad_checkpointing=True,
                           skip_init=True)
    base = create_model(name)
    sparams = to_scanned(base.params)
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))

    def loss(p):
        f, _ = scanned.module.apply(
            {"params": p}, img, True, method=scanned.module.encode_image
        )
        return jnp.sum(f**2)

    g = jax.grad(loss)(sparams)
    assert np.isfinite(
        float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.abs(x).sum(), g, jnp.float32(0)
        ))
    )

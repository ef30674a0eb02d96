"""Int8 quantized linear: accuracy vs fp32 and tree rewriting."""

import numpy as np

import jax.numpy as jnp

from xtagclip_tpu.ops.int8 import (
    int8_dense_apply,
    int8_matmul,
    quantize_activation,
    quantize_dense_tree,
    quantize_weight,
)


def test_int8_matmul_close_to_fp32(rng):
    x = rng.standard_normal((8, 256), dtype=np.float32)
    w = rng.standard_normal((256, 128), dtype=np.float32) * 0.05
    want = x @ w
    xq, xs = quantize_activation(jnp.asarray(x))
    wq, ws = quantize_weight(jnp.asarray(w))
    got = np.asarray(int8_matmul(xq, xs, wq, ws))
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert np.median(rel) < 0.02, float(np.median(rel))


def test_quantize_dense_tree(rng):
    tree = {
        "layer": {
            "kernel": rng.standard_normal((64, 32)).astype(np.float32),
            "bias": np.zeros(32, np.float32),
        },
        "ln": {"scale": np.ones(64, np.float32)},
    }
    q = quantize_dense_tree(tree)
    assert q["layer"]["kernel_q"].dtype == jnp.int8
    assert q["layer"]["kernel_scale"].shape == (32,)
    assert "bias" in q["layer"]
    assert "scale" in q["ln"]  # non-dense untouched

    x = rng.standard_normal((4, 64), dtype=np.float32)
    want = x @ tree["layer"]["kernel"]
    got = np.asarray(int8_dense_apply(q["layer"], jnp.asarray(x)))
    assert np.abs(got - want).mean() / np.abs(want).mean() < 0.05

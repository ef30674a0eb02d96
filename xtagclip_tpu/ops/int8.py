"""Int8 weight-quantized linear ops — the TPU-native answer to the reference's
bitsandbytes/triton int8 linear swap (--use-bnb-linear, reference
utils.py:67-92 + main_other.py:328-338).

Per-output-channel symmetric weight quantization; the int8 x int8 -> int32
contraction runs on the MXU via dot_general with int32 accumulation, then one
fused scale multiply. `quantize_dense_tree` rewrites existing Dense kernels in
a param tree for inference; `int8_dense_apply` consumes them.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, N] float -> (int8 values [K, N], per-column scales [N])."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_activation(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., K] float -> (int8, per-row scale [..., 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def int8_matmul(x_q, x_scale, w_q, w_scale, out_dtype=jnp.float32):
    """(int8 x, row scales) @ (int8 w, col scales) with int32 MXU accumulation."""
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def int8_dense_apply(params: Dict[str, Any], x, out_dtype=None):
    """Apply a quantized Dense param dict {kernel_q, kernel_scale[, bias]}."""
    out_dtype = out_dtype or x.dtype
    x_q, x_s = quantize_activation(x)
    y = int8_matmul(x_q, x_s, params["kernel_q"], params["kernel_scale"],
                    out_dtype=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def quantize_dense_tree(params: Dict[str, Any],
                        predicate=None) -> Dict[str, Any]:
    """Rewrite every {'kernel': 2-D, ...} Dense subtree into its int8 form.

    predicate(path_tuple) -> bool selects which Denses quantize (default: all
    2-D kernels). The reference swaps every nn.Linear except skipped modules
    (utils.py:67-92) — same idea.
    """

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel" in node and not isinstance(node["kernel"], dict) \
                    and np.ndim(node["kernel"]) == 2 \
                    and (predicate is None or predicate(path)):
                q, s = quantize_weight(jnp.asarray(node["kernel"]))
                out = {"kernel_q": q, "kernel_scale": s}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    return rec(params, ())

"""Parameter/batch sharding rules for the (data, model) mesh.

DP: batch P('data'), params replicated — XLA all-reduces grads over ICI
(replaces DDP, reference main_other.py:369-379).
TP (GSPMD): large 2-D kernels shard their output dim over 'model'; embeddings
shard the feature dim. No bespoke collectives — XLA inserts them. This covers
the ViT-H stretch target (SURVEY §2.5) the way the scaling-book recipe says:
pick a mesh, annotate, let the compiler do the rest.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xtagclip_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def param_partition_spec(path, leaf, model_size: int) -> P:
    """Sharding rule for one param."""
    if model_size <= 1:
        return P()
    name = _path_str(path)
    shape = leaf.shape
    if leaf.ndim == 2:
        # shard the larger matmul dim over 'model' when divisible; prefer the
        # output dim (column-parallel) — XLA re-shards activations as needed
        if shape[1] % model_size == 0 and shape[1] >= 128:
            return P(None, MODEL_AXIS)
        if shape[0] % model_size == 0 and shape[0] >= 128:
            return P(MODEL_AXIS, None)
    if leaf.ndim == 1 and shape[0] % model_size == 0 and shape[0] >= 1024:
        return P(MODEL_AXIS)
    return P()


def infer_param_shardings(params: Any, mesh: Mesh) -> Any:
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, param_partition_spec(p, x, model_size)),
        params,
    )


def batch_shardings(batch: Any, mesh: Mesh, accum: bool = False) -> Any:
    """'data'-axis sharding specs for a batch pytree.

    accum=True: arrays are [accum_freq, micro_b, ...] — shard the microbatch
    dim (axis 1), keep the accumulation dim replicated.
    """

    def rule(x):
        if hasattr(x, "ndim"):
            if accum and x.ndim > 1:
                return NamedSharding(mesh, P(None, DATA_AXIS))
            if not accum and x.ndim > 0:
                return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, batch)


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, infer_param_shardings(params, mesh))


def shard_batch(batch: Any, mesh: Mesh, accum: bool = False) -> Any:
    return jax.device_put(batch, batch_shardings(batch, mesh, accum=accum))

"""Parameter/batch sharding rules for the (data, model) mesh.

DP: batch P('data'), params replicated — XLA all-reduces grads over ICI
(replaces DDP, reference main_other.py:369-379).
TP (GSPMD): large 2-D kernels shard their output dim over 'model'; embeddings
shard the feature dim. No bespoke collectives — XLA inserts them. This covers
the ViT-H stretch target (SURVEY §2.5) the way the scaling-book recipe says:
pick a mesh, annotate, let the compiler do the rest.
FSDP (ZeRO-3 style, `fsdp=True`): additionally shard each large kernel over
the 'data' axis, so params AND Adam moments live 1/N per chip — GSPMD inserts
the all-gather before use and the reduce-scatter on the grads. This is the
memory lever the reference has no analogue for: a ViT-H train state (bf16
params + fp32 Adam moments ~10 GB) that OOMs one chip fits an 8-chip slice
at ~1.3 GB/chip.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from xtagclip_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def param_partition_spec(
    path, leaf, model_size: int, fsdp_size: int = 1
) -> P:
    """Sharding rule for one param."""
    shape = leaf.shape
    spec = [None] * leaf.ndim
    if model_size > 1 and leaf.ndim == 2:
        # shard the larger matmul dim over 'model' when divisible; prefer the
        # output dim (column-parallel) — XLA re-shards activations as needed
        if shape[1] % model_size == 0 and shape[1] >= 128:
            spec[1] = MODEL_AXIS
        elif shape[0] % model_size == 0 and shape[0] >= 128:
            spec[0] = MODEL_AXIS
    if model_size > 1 and leaf.ndim == 1 and shape[0] % model_size == 0 \
            and shape[0] >= 1024:
        spec[0] = MODEL_AXIS
    if fsdp_size > 1 and leaf.ndim >= 2 and leaf.size >= 2 ** 16:
        # shard the largest still-free dim over 'data' (ZeRO-3); biases and
        # norm scales stay replicated — their Adam state is negligible
        free = [d for d in range(leaf.ndim) if spec[d] is None]
        free.sort(key=lambda d: shape[d], reverse=True)
        for d in free:
            if shape[d] % fsdp_size == 0:
                spec[d] = DATA_AXIS
                break
    return P(*spec)


def infer_param_shardings(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    model_size = mesh.shape.get(MODEL_AXIS, 1)
    fsdp_size = mesh.shape.get(DATA_AXIS, 1) if fsdp else 1
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(
            mesh, param_partition_spec(p, x, model_size, fsdp_size)),
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


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    return jax.device_put(params, infer_param_shardings(params, mesh, fsdp=fsdp))


def shard_batch(batch: Any, mesh: Mesh, accum: bool = False) -> Any:
    return jax.device_put(batch, batch_shardings(batch, mesh, accum=accum))

"""Worker for the 2-process jax.distributed rendezvous test.

Launched twice by test_multiprocess.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID in the environment — the same env
contract core/mesh.py:init_distributed sniffs (mirroring the reference's
torchrun/SLURM env discovery, distributed.py:54-90). Prints one JSON line
with everything the parent asserts on.
"""

import json
import os
import sys

# Standalone script (not collected by pytest): bootstrap sys.path to the
# repo root like tools/*.py do, so the worker imports xtagclip_tpu even
# when the package is not pip-installed and PYTHONPATH is unset.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:  # noqa: BLE001 — older jax picks its own default
    pass


def run_tiny_train_step(global_batch: int = 16):
    """One jitted XTag train step on a global 'data' mesh over ALL devices.

    Deterministic end to end (init_seed=0 model init, fixed numpy batch,
    fixed PRNGKey) so a 2-process x 4-device run must produce bitwise-close
    loss/grad_norm/params to the single-process 8-device run — the JAX
    analogue of the reference DDP contract (each rank computes the same
    global update, others/main_other.py:369-379).

    Works in both single- and multi-process jax: global arrays are built via
    make_array_from_callback (only addressable shards are materialized).
    Returns {"loss", "contrastive_loss", "grad_norm", "param_fingerprint"}.
    """
    import json as _json
    import tempfile

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from xtagclip_tpu.factory import add_model_config, create_model
    from xtagclip_tpu.models.clip import num_combos
    from xtagclip_tpu.train.loop import make_train_step
    from xtagclip_tpu.train.scheduler import cosine_lr
    from xtagclip_tpu.train.train_state import create_train_state, make_optimizer

    cfg = dict(
        embed_dim=512,
        vision_cfg=dict(layers=2, width=64, head_width=32, patch_size=8,
                        image_size=32),
        text_cfg=dict(context_length=16, vocab_size=1000, width=512, heads=4,
                      layers=2),
    )
    with tempfile.NamedTemporaryFile("w", suffix=".json", prefix="mp-train-",
                                     delete=False) as f:
        _json.dump(cfg, f)
        path = f.name
    add_model_config(path)
    bundle = create_model(os.path.basename(path)[:-5], use_tagging=True,
                          use_fusion=True)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rep = NamedSharding(mesh, P())

    def to_global(x, sharded: bool):
        arr = np.asarray(x)
        sh = NamedSharding(mesh, P("data", *([None] * (arr.ndim - 1)))
                           ) if sharded else rep
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx, a=arr: a[idx])

    rng = np.random.default_rng(0)
    table = to_global(rng.integers(0, 999, size=(1, 3, num_combos(), 16)
                                   ).astype(np.int32), sharded=False)
    batch = {
        "images": to_global(rng.standard_normal(
            (global_batch, 32, 32, 3)).astype(np.float32), True),
        "additional": to_global((rng.random((global_batch, 22)) > 0.5
                                 ).astype(np.float32), True),
        "class_ids": to_global(rng.integers(
            0, 3, size=(global_batch,)).astype(np.int32), True),
        "template_id": 0,
    }
    params = jax.tree.map(lambda x: to_global(x, False), bundle.params)

    tx = make_optimizer(cosine_lr(1e-3, 2, 50), params=params)
    state = create_train_state(params, tx)
    step = make_train_step(bundle.module, tx, {"use_tagging_loss": True},
                           prompt_table=table, donate=False, mesh=mesh)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))

    fingerprint = jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(jnp.abs(x.astype(jnp.float32))),
            p, jnp.float32(0.0)),
        out_shardings=rep,
    )(new_state.params)

    def scalar(x):
        return float(np.asarray(
            x.addressable_data(0) if hasattr(x, "addressable_data") else x))

    return {
        "loss": scalar(metrics["loss"]),
        "contrastive_loss": scalar(metrics["contrastive_loss"]),
        "grad_norm": scalar(metrics["grad_norm"]),
        "param_fingerprint": scalar(fingerprint),
    }


def main():
    import types

    from xtagclip_tpu.core.mesh import (
        all_gather_object,
        broadcast_object,
        init_distributed,
        is_master,
    )

    args = types.SimpleNamespace()
    info = init_distributed(args)

    if os.environ.get("XTAG_MP_MODE") == "train":
        # cross-process train-step equivalence mode: one jitted XTag step on
        # the global mesh; the parent asserts these numbers equal the
        # single-process run's.
        result = run_tiny_train_step()
        result.update(rank=info["rank"], world_size=info["world_size"],
                      device_count=jax.device_count())
        print(json.dumps(result), flush=True)
        return

    # host-level broadcast: every process must see rank 0's payload
    payload = {"resume_path": f"/ckpt/from_rank_{jax.process_index()}"}
    got = broadcast_object(payload)
    gathered = all_gather_object(jax.process_index())

    # one cross-process device collective: global sum over a global mesh
    # (each process contributes only its local shards)
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("data",))
    local = np.ones((jax.local_device_count(),), np.float32) * (
        jax.process_index() + 1)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (len(devs),))
    total = float(jax.jit(lambda a: a.sum())(x))

    print(json.dumps({
        "rank": info["rank"],
        "world_size": info["world_size"],
        "distributed": info["distributed"],
        "args_rank": args.rank,
        "args_world": args.world_size,
        "is_master": is_master(),
        "broadcast_resume": got["resume_path"] if isinstance(got, dict)
        else str(got),
        "gathered": [int(g) for g in list(gathered)],
        "psum_total": total,
        "device_count": jax.device_count(),
    }), flush=True)


if __name__ == "__main__":
    main()

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

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:  # noqa: BLE001 — older jax picks its own default
    pass


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

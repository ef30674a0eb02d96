"""Device mesh + distributed initialization.

Replaces the reference's torch.distributed runtime (distributed.py:93-195):
rank/world discovery and process groups become `jax.distributed.initialize()`
plus one `jax.sharding.Mesh`. Axis names: 'data' for DP (batch + gathered
negatives ride ICI), optional 'model' for GSPMD tensor sharding of the large
towers (ViT-H) — free with pjit, no bespoke code.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def world_info_from_env() -> Tuple[int, int, int]:
    """(local_rank, global_rank, world_size) from the launcher env.

    Mirrors the reference's launcher-family sniffing priority exactly
    (distributed.py:72-90): torchrun-style first, then Intel MPI PMI, then
    SLURM, then Open MPI — so a job script written for the reference under
    any of those launchers resolves to the same process identity here.
    """
    local_rank = 0
    for v in ("LOCAL_RANK", "MPI_LOCALRANKID", "SLURM_LOCALID",
              "OMPI_COMM_WORLD_LOCAL_RANK"):
        if v in os.environ:
            local_rank = int(os.environ[v])
            break
    global_rank = 0
    for v in ("RANK", "PMI_RANK", "SLURM_PROCID", "OMPI_COMM_WORLD_RANK"):
        if v in os.environ:
            global_rank = int(os.environ[v])
            break
    world_size = 1
    for v in ("WORLD_SIZE", "PMI_SIZE", "SLURM_NTASKS",
              "OMPI_COMM_WORLD_SIZE"):
        if v in os.environ:
            world_size = int(os.environ[v])
            break
    return local_rank, global_rank, world_size


def coordinator_from_env() -> Optional[str]:
    """Coordinator address:port from env: JAX-native vars first, then the
    torch-style MASTER_ADDR/MASTER_PORT pair (reference dist_url contract,
    distributed.py env:// default)."""
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coord:
        return coord
    addr = os.environ.get("MASTER_ADDR")
    if addr:
        return f"{addr}:{os.environ.get('MASTER_PORT', '29500')}"
    return None


def init_distributed(args=None) -> dict:
    """Multi-host init from env when launched under a multi-process runtime.

    Mirrors init_distributed_device's env sniffing contract
    (reference distributed.py:54-113): honours JAX-native vars first, then
    the torchrun / PMI / SLURM / Open MPI families via
    ``world_info_from_env``; single-process otherwise. Mutates
    args.{distributed,world_size,rank,local_rank} when args given.
    """
    coord = coordinator_from_env()
    local_rank, env_rank, env_world = world_info_from_env()
    nproc = os.environ.get("JAX_NUM_PROCESSES") or (
        str(env_world) if env_world > 1 else None)
    pid = os.environ.get("JAX_PROCESS_ID") or str(env_rank)
    if coord and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid or 0),
        )
        logging.info(
            "jax.distributed initialized: process %d/%d", jax.process_index(),
            jax.process_count(),
        )
    # NOTE on units: JAX is single-controller per *process*, with many devices
    # per process. Dataset splitting (idx[rank::world_size]) must be by
    # PROCESS — each process then shards its batch over its mesh slice. Using
    # device_count here would make a single-process multi-device run read only
    # 1/device_count of the data per epoch.
    info = {
        "world_size": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "rank": jax.process_index(),
        "distributed": jax.device_count() > 1,
    }
    if args is not None:
        args.distributed = info["distributed"]
        args.world_size = info["world_size"]
        args.device_count = info["device_count"]
        args.rank = info["rank"]
        args.local_rank = local_rank
    return info


def create_mesh(
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (
        f"{data_parallel}x{model_parallel} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_master(args=None) -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    """PROCESS count — the unit for dataset splitting (see the NOTE in
    init_distributed; device_count here would under-read data 1/N)."""
    return jax.process_count()


def broadcast_object(obj, src: int = 0):
    """Host-level broadcast of an arbitrary Python object (reference
    distributed.py:198-208, torch broadcast_object_list semantics): the
    object is pickled to bytes, the length broadcast first, then the padded
    payload — multihost_utils only moves numeric arrays.

    Single-process: identity.
    """
    if jax.process_count() == 1:
        return obj
    import pickle

    from jax.experimental import multihost_utils

    is_src = jax.process_index() == src
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(
        np.int64(payload.size), is_source=is_src))
    buf = np.zeros(n, np.uint8)
    if is_src:
        buf[:payload.size] = payload
    out = multihost_utils.broadcast_one_to_all(buf, is_source=is_src)
    return pickle.loads(np.asarray(out).tobytes())


def all_gather_object(obj):
    """Gather one arbitrary Python object per process (reference
    distributed.py:211-218): pickle, pad to the max length, allgather."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    lengths = np.asarray(
        multihost_utils.process_allgather(np.int64(payload.size)))
    maxlen = int(lengths.max())
    buf = np.zeros(maxlen, np.uint8)
    buf[:payload.size] = payload
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [
        pickle.loads(gathered[i, :int(lengths[i])].tobytes())
        for i in range(jax.process_count())
    ]

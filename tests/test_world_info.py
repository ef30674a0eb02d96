"""Launcher env-family sniffing (reference distributed.py:54-90).

Each launcher family — torchrun (RANK/WORLD_SIZE/LOCAL_RANK), Intel MPI
(PMI_*/MPI_LOCALRANKID), SLURM (SLURM_*), Open MPI (OMPI_COMM_WORLD_*) —
must resolve to the same (local_rank, global_rank, world_size) triple the
reference derives, in the same priority order, so reference job scripts
port unchanged.
"""

import pytest

from xtagclip_tpu.core.mesh import coordinator_from_env, world_info_from_env

_ALL_VARS = [
    "LOCAL_RANK", "MPI_LOCALRANKID", "SLURM_LOCALID",
    "OMPI_COMM_WORLD_LOCAL_RANK",
    "RANK", "PMI_RANK", "SLURM_PROCID", "OMPI_COMM_WORLD_RANK",
    "WORLD_SIZE", "PMI_SIZE", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE",
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "MASTER_ADDR", "MASTER_PORT",
]


@pytest.fixture
def clean_env(monkeypatch):
    for v in _ALL_VARS:
        monkeypatch.delenv(v, raising=False)
    return monkeypatch


@pytest.mark.parametrize("family", [
    # torchrun / DDP env contract
    {"LOCAL_RANK": "1", "RANK": "3", "WORLD_SIZE": "8"},
    # Intel MPI / PMI launchers
    {"MPI_LOCALRANKID": "1", "PMI_RANK": "3", "PMI_SIZE": "8"},
    # SLURM srun
    {"SLURM_LOCALID": "1", "SLURM_PROCID": "3", "SLURM_NTASKS": "8"},
    # Open MPI mpirun
    {"OMPI_COMM_WORLD_LOCAL_RANK": "1", "OMPI_COMM_WORLD_RANK": "3",
     "OMPI_COMM_WORLD_SIZE": "8"},
])
def test_each_family_resolves(clean_env, family):
    for k, v in family.items():
        clean_env.setenv(k, v)
    assert world_info_from_env() == (1, 3, 8)


def test_priority_torchrun_beats_slurm(clean_env):
    # both sets present (torchrun under a SLURM allocation): the explicit
    # torchrun vars win, matching the reference's loop order
    clean_env.setenv("RANK", "2")
    clean_env.setenv("WORLD_SIZE", "4")
    clean_env.setenv("SLURM_PROCID", "7")
    clean_env.setenv("SLURM_NTASKS", "16")
    clean_env.setenv("SLURM_LOCALID", "5")
    assert world_info_from_env() == (5, 2, 4)


def test_empty_env_single_process(clean_env):
    assert world_info_from_env() == (0, 0, 1)
    assert coordinator_from_env() is None


def test_coordinator_sources(clean_env):
    clean_env.setenv("MASTER_ADDR", "10.0.0.1")
    assert coordinator_from_env() == "10.0.0.1:29500"
    clean_env.setenv("MASTER_PORT", "1357")
    assert coordinator_from_env() == "10.0.0.1:1357"
    clean_env.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.2:999")
    assert coordinator_from_env() == "10.0.0.2:999"


def test_init_distributed_args_local_rank(clean_env):
    """Single-process init still records the sniffed local_rank on args
    (reference init_distributed_device mutation contract)."""
    import types

    from xtagclip_tpu.core.mesh import init_distributed

    clean_env.setenv("SLURM_LOCALID", "2")  # no world size -> single process
    args = types.SimpleNamespace()
    info = init_distributed(args)
    assert args.local_rank == 2
    assert args.world_size == info["world_size"]

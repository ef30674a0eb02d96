"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding (shard_map / pjit over a Mesh) is exercised on virtual CPU
devices, per the build contract; the real TPU chip is reserved for bench runs.
"""

import os

# force CPU even when the harness pre-sets JAX_PLATFORMS (e.g. axon/TPU):
# tests must run on the virtual 8-device CPU mesh, never the real chip.
# NOTE: the axon TPU plugin on this image ignores JAX_PLATFORMS but honors
# JAX_PLATFORM_NAME — set both (TPU init also costs ~30s of tunnel setup).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already be imported by pytest's own dependency chain, but the
# backend only materializes on first use — config.update still wins here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent XLA compile cache (mirrors bench.py): the e2e tier recompiles
# the same tiny models every run — cached binaries cut suite wall time
# (round-2 VERDICT item 9). min_compile_time 0: profiling showed the e2e
# CLI runs spend minutes in dozens of sub-2s compiles that a nonzero
# threshold would silently keep recompiling on this 1-core host.
# crash-safe writes: a killed run must never leave a truncated entry that
# SIGABRTs every later suite run (see utils/compile_cache.py docstring)
from xtagclip_tpu.utils.compile_cache import enable_persistent_cache

_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_test_cache")
enable_persistent_cache(_cache_dir, min_compile_time_secs=0.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

"""Crash-safe persistent-cache writes (utils/compile_cache.py).

Regression: a timed-out e2e suite run was SIGTERM'd mid-write of a ~100 MB
jit_step cache entry; jax's LRUCache.put writes with a plain write_bytes, so
the entry was left truncated and every subsequent suite run SIGABRT'd inside
XLA's deserializer when it loaded it. The patch makes the final write atomic
(temp file + os.replace): an interrupted put leaves NO entry, not a partial
one.
"""

import os

import pytest

from xtagclip_tpu.utils.compile_cache import (
    _atomic_put,
    patch_atomic_cache_writes,
)


@pytest.fixture()
def cache(tmp_path):
    from jax._src.lru_cache import LRUCache

    assert patch_atomic_cache_writes(), "patch must apply on this jax"
    assert LRUCache.put is _atomic_put
    return LRUCache(str(tmp_path / "c"), max_size=-1)


def test_put_get_roundtrip_no_temp_leftovers(cache):
    cache.put("k1", b"x" * 4096)
    assert cache.get("k1") == b"x" * 4096
    leftovers = [n for n in os.listdir(cache.path) if n.endswith(".tmp")]
    assert leftovers == []


def test_existing_entry_not_rewritten(cache):
    cache.put("k", b"first")
    cache.put("k", b"second")  # upstream contract: first write wins
    assert cache.get("k") == b"first"


def test_interrupted_write_leaves_no_entry(cache, monkeypatch):
    # simulate a kill at the instant of publication: os.replace never runs
    def boom(src, dst):
        raise KeyboardInterrupt  # same path a SIGTERM-raised exception takes

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(KeyboardInterrupt):
        cache.put("killed", b"y" * 1024)
    monkeypatch.undo()

    # the cache must contain NO entry for the key — truncated entries are
    # exactly what SIGABRTs the next reader — and no temp litter either
    assert cache.get("killed") is None
    leftovers = [n for n in os.listdir(cache.path) if n.endswith(".tmp")]
    assert leftovers == []


def test_patch_is_idempotent():
    assert patch_atomic_cache_writes()
    assert patch_atomic_cache_writes()

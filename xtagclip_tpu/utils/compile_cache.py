"""Persistent XLA compile cache with crash-safe (atomic) entry writes.

jax 0.9's LRUCache.put writes cache entries with a direct
``cache_path.write_bytes(val)`` (jax/_src/lru_cache.py). A process killed
mid-write — a CI timeout, a driver budget kill — leaves a TRUNCATED entry,
and the next process that loads it dies with a silent SIGABRT inside XLA's
executable deserializer, taking the whole test run down with it. (Observed
in practice: a timed-out e2e suite run truncated a ~100 MB jit_step entry;
every later suite run aborted at the same test until the cache was wiped.)

``enable_persistent_cache`` applies the usual jax.config knobs AND patches
LRUCache.put to write through a temp file + os.replace, which is atomic on
POSIX: readers see either the old state or the complete new entry, never a
partial write — under concurrent writers too.
"""

from __future__ import annotations

import os
import tempfile


def _atomic_put(self, key: str, val: bytes) -> None:
    """LRUCache.put with an atomic final write (temp file + os.replace)."""
    import time
    import warnings

    if not key:
        raise ValueError("key cannot be empty")
    if self.eviction_enabled and len(val) > self.max_size:
        warnings.warn(
            f"Cache value for key {key!r} of size {len(val)} bytes exceeds "
            f"the maximum cache size of {self.max_size} bytes")
        return

    from jax._src.lru_cache import _ATIME_SUFFIX, _CACHE_SUFFIX

    cache_path = self.path / f"{key}{_CACHE_SUFFIX}"
    if self.eviction_enabled:
        self.lock.acquire(timeout=self.lock_timeout_secs)
    try:
        if cache_path.exists():
            return
        self._evict_if_needed(additional_size=len(val))

        try:
            fd, tmp = tempfile.mkstemp(dir=str(self.path), suffix=".tmp")
        except OSError:
            # non-local cache filesystem: keep upstream's direct write
            cache_path.write_bytes(val)
        else:
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(val)
                # mkstemp creates 0600; match write_bytes' umask-respecting
                # mode so shared cache dirs stay readable across users
                um = os.umask(0)
                os.umask(um)
                os.chmod(tmp, 0o666 & ~um)
                os.replace(tmp, cache_path)  # atomic: all of it or nothing
            except BaseException:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
                raise

        if self.eviction_enabled:
            timestamp = time.time_ns().to_bytes(8, "little")
            atime_path = self.path / f"{key}{_ATIME_SUFFIX}"
            atime_path.write_bytes(timestamp)
    finally:
        if self.eviction_enabled:
            self.lock.release()


def patch_atomic_cache_writes() -> bool:
    """Make LRUCache.put crash-safe. Returns True if the patch is active."""
    try:
        from jax._src import lru_cache as _lru

        # only patch the exact implementation we mirror: if a future jax
        # changes put(), fall back to it untouched rather than guess
        if getattr(_lru.LRUCache.put, "__name__", "") == "_atomic_put":
            return True
        import inspect

        src = inspect.getsource(_lru.LRUCache.put)
        if "write_bytes" not in src:  # already atomic upstream
            return False
        _lru.LRUCache.put = _atomic_put
        return True
    except Exception:  # noqa: BLE001 — any jax-internals drift: no patch
        return False


def enable_persistent_cache(cache_dir: str,
                            min_compile_time_secs: float = 0.0) -> None:
    """Point jax's persistent compile cache at cache_dir, crash-safely."""
    import jax

    # patch FIRST, and each knob independently: if the cache-dir knob takes
    # but a tuning knob is missing (other jax versions), the cache must not
    # end up enabled with the unsafe non-atomic writes
    patch_atomic_cache_writes()
    for knob, val in (
        ("jax_compilation_cache_dir", cache_dir),
        ("jax_persistent_cache_min_compile_time_secs", min_compile_time_secs),
        ("jax_persistent_cache_min_entry_size_bytes", 0),
    ):
        try:
            jax.config.update(knob, val)
        except Exception:  # noqa: BLE001 — jax without this knob
            pass

"""Checkpoint-dir remote sync + remote-capable loading.

Reference file_utils.py:10-75: a background process running `aws s3 sync`
(or fsspec copy) of the run dir every --remote-sync-frequency seconds,
excluding epoch_latest; plus fsspec-backed checkpoint reads. GCS (`gsutil`)
added as the TPU-native protocol.
"""

from __future__ import annotations

import logging
import multiprocessing
import os
import subprocess
import time


def remote_sync_s3(local_dir: str, remote_dir: str) -> bool:
    result = subprocess.run(
        ["aws", "s3", "sync", local_dir, remote_dir, "--exclude",
         "*epoch_latest*"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    if result.returncode != 0:
        logging.error("remote sync failed: %s", result.stderr.decode()[-500:])
        return False
    return True


def remote_sync_gcs(local_dir: str, remote_dir: str) -> bool:
    result = subprocess.run(
        ["gsutil", "-m", "rsync", "-r", "-x", ".*epoch_latest.*", local_dir,
         remote_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    if result.returncode != 0:
        logging.error("remote sync failed: %s", result.stderr.decode()[-500:])
        return False
    return True


def remote_sync_fsspec(local_dir: str, remote_dir: str) -> bool:
    try:
        import fsspec
    except ImportError:
        logging.error("fsspec unavailable")
        return False
    a = fsspec.get_mapper(local_dir)
    b = fsspec.get_mapper(remote_dir)
    for k in a:
        if "epoch_latest" in k:
            continue
        try:
            if k in b and len(a[k]) == len(b[k]):
                continue
            b[k] = a[k]
        except Exception as e:  # noqa: BLE001
            logging.info("skip %s: %s", k, e)
            return False
    return True


def remote_sync(local_dir: str, remote_dir: str, protocol: str) -> bool:
    logging.info("remote sync %s -> %s (%s)", local_dir, remote_dir, protocol)
    if protocol == "s3":
        return remote_sync_s3(local_dir, remote_dir)
    if protocol == "gcs":
        return remote_sync_gcs(local_dir, remote_dir)
    if protocol == "fsspec":
        return remote_sync_fsspec(local_dir, remote_dir)
    logging.error("unknown remote protocol %s", protocol)
    return False


def _loop(sync_every, local_dir, remote_dir, protocol):
    while True:
        time.sleep(sync_every)
        remote_sync(local_dir, remote_dir, protocol)


def start_sync_process(sync_every: int, local_dir: str, remote_dir: str,
                       protocol: str):
    return multiprocessing.Process(
        target=_loop, args=(sync_every, local_dir, remote_dir, protocol),
        daemon=True,
    )


def pt_load(file_path: str, map_location=None):
    """fsspec-capable torch checkpoint read (reference file_utils.py:69-75)."""
    if file_path.startswith(("s3://", "gs://")):
        logging.info("Loading remote checkpoint, caching locally...")
        import fsspec

        with fsspec.open(file_path, "rb") as f:
            data = f.read()
        import io

        import torch

        return torch.load(io.BytesIO(data), map_location=map_location,
                          weights_only=False)
    import torch

    return torch.load(file_path, map_location=map_location, weights_only=False)


def copy_codebase(args) -> str:
    """Copy the package source into the run dir (reference main.py
    copy_codebase: reproducibility snapshot under logs/<name>/code)."""
    import shutil

    import xtagclip_tpu

    src = os.path.dirname(os.path.abspath(xtagclip_tpu.__file__))
    dst = os.path.join(args.logs, args.name, "code", "xtagclip_tpu")
    shutil.copytree(
        src, dst, dirs_exist_ok=True,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc"),
    )
    return dst

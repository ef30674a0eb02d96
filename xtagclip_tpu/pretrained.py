"""Pretrained weight registry + resolution.

The (model, tag) -> {url/hf_hub, preprocess overrides} table (165 tags over 84
models — reference pretrained.py:418-613) ships as
assets/pretrained_registry.json. Zero-egress environment: download helpers
verify a local cache first and only then attempt network (which will fail
cleanly offline); `resolve_pretrained` also accepts plain local paths.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import urllib.request
from functools import lru_cache
from typing import Dict, List, Optional

from xtagclip_tpu.utils.assets import asset_path


@lru_cache()
def _registry() -> Dict[str, Dict[str, dict]]:
    with open(asset_path("pretrained_registry.json")) as f:
        return json.load(f)


def list_pretrained(as_str: bool = False):
    out = []
    for model, tags in _registry().items():
        for tag in tags:
            out.append(f"{model} {tag}" if as_str else (model, tag))
    return out


def list_pretrained_models_by_tag(tag: str) -> List[str]:
    return [m for m, tags in _registry().items() if tag in tags]


def list_pretrained_tags_by_model(model: str) -> List[str]:
    return list(_registry().get(model, {}))


def is_pretrained_cfg(model: str, tag: str) -> bool:
    return tag.lower().replace("-", "_") in {
        t.lower().replace("-", "_") for t in _registry().get(model, {})
    }


def get_pretrained_cfg(model: str, tag: str) -> dict:
    tags = _registry().get(model, {})
    norm = tag.lower().replace("-", "_")
    for t, cfg in tags.items():
        if t.lower().replace("-", "_") == norm:
            return dict(cfg)
    return {}


def get_pretrained_url(model: str, tag: str) -> str:
    return get_pretrained_cfg(model, tag).get("url", "")


def default_cache_dir() -> str:
    return os.path.expanduser(
        os.environ.get("XTAGCLIP_CACHE", "~/.cache/xtagclip")
    )


def expected_sha256_for_url(url: str, explicit: str = "") -> str:
    """Expected sha256 (full hash or prefix) for a weight URL.

    An explicit registry ``sha256`` field wins; otherwise the hash rides
    in the URL itself, following the reference conventions
    (pretrained.py:672-677): openaipublic URLs carry the full hash as the
    second-to-last path component; mlfoundations release filenames end in
    ``-<hexprefix>``. Unknown hosts -> "" (no verification possible)."""
    if explicit:
        return explicit
    path = url.split("?")[0]
    if "openaipublic" in url:
        return path.split("/")[-2]
    if "mlfoundations" in url:
        stem = os.path.splitext(os.path.basename(path))[0]
        suffix = stem.rsplit("-", 1)[-1]
        if len(suffix) >= 6 and all(c in "0123456789abcdef" for c in suffix):
            return suffix
    return ""


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_pretrained_from_url(url: str, cache_dir: Optional[str] = None,
                                 expected_sha256: str = "") -> str:
    """Fetch (or reuse cached) weights, verifying integrity when a sha256
    is known — reference pretrained.py:663-706. A cached file that fails
    the check is re-downloaded once; a fresh download that fails raises."""
    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(url.split("?")[0])
    target = os.path.join(cache_dir, filename)
    expected = expected_sha256_for_url(url, expected_sha256)
    if os.path.exists(target):
        if not os.path.isfile(target):
            raise RuntimeError(f"{target} exists and is not a regular file")
        if not expected or _file_sha256(target).startswith(expected):
            return target
        logging.warning(
            "%s exists but its sha256 does not match %s; re-downloading",
            target, expected)
        os.remove(target)
    logging.info("downloading %s -> %s", url, target)
    # download to a temp name, verify, then move atomically into place so
    # a killed download never leaves a valid-looking cache entry
    tmp = target + ".part"
    urllib.request.urlretrieve(url, tmp)  # fails cleanly offline
    if expected and not _file_sha256(tmp).startswith(expected):
        os.remove(tmp)
        raise RuntimeError(
            f"downloaded {url} but its sha256 does not match the expected "
            f"{expected} — corrupted or tampered download")
    os.replace(tmp, target)
    return target


def download_pretrained_from_hf(
    model_id: str, filename: Optional[str] = None, cache_dir: Optional[str] = None
) -> str:
    from huggingface_hub import hf_hub_download

    from xtagclip_tpu.utils.constants import (
        HF_SAFE_WEIGHTS_NAME,
        HF_WEIGHTS_NAME,
    )

    for fname in ([filename] if filename else
                  [HF_SAFE_WEIGHTS_NAME, HF_WEIGHTS_NAME]):
        try:
            return hf_hub_download(model_id, fname, cache_dir=cache_dir)
        except Exception as e:  # noqa: BLE001
            last = e
    raise FileNotFoundError(
        f"could not fetch weights for {model_id}: {last}"
    )


def resolve_pretrained(model: str, pretrained: str,
                       cache_dir: Optional[str] = None) -> str:
    """Tag / url / hf-hub: / local path -> local checkpoint file path."""
    if os.path.exists(pretrained):
        return pretrained
    if pretrained.startswith("hf-hub:"):
        return download_pretrained_from_hf(pretrained[len("hf-hub:"):],
                                           cache_dir=cache_dir)
    if pretrained.startswith(("http://", "https://")):
        return download_pretrained_from_url(pretrained, cache_dir)
    cfg = get_pretrained_cfg(model, pretrained)
    if not cfg:
        raise FileNotFoundError(
            f"no pretrained tag {pretrained!r} for model {model!r}; "
            f"available: {list_pretrained_tags_by_model(model)}"
        )
    if cfg.get("hf_hub"):
        hub = cfg["hf_hub"].rstrip("/")
        if "/" in hub and not hub.endswith(
            (".bin", ".pt", ".safetensors")
        ):
            return download_pretrained_from_hf(hub, cache_dir=cache_dir)
        repo, _, fname = hub.rpartition("/")
        return download_pretrained_from_hf(repo, fname or None, cache_dir)
    if cfg.get("url"):
        return download_pretrained_from_url(
            cfg["url"], cache_dir, expected_sha256=cfg.get("sha256", ""))
    raise FileNotFoundError(f"pretrained cfg for {model}:{pretrained} has no source")

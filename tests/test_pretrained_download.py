"""Integrity checking on pretrained weight downloads.

The reference carries per-tag sha256s inside its URLs and verifies them on
download (reference pretrained.py:663-706: openaipublic URLs embed the full
hash as a path component, mlfoundations filenames end in a hash prefix).
`download_pretrained_from_url` mirrors that contract: cached files that fail
the check are re-fetched, fresh downloads that fail raise.
"""

import hashlib
import os

import pytest

from xtagclip_tpu import pretrained


GOOD = b"weights-bytes-good"
GOOD_SHA = hashlib.sha256(GOOD).hexdigest()


def _serve(monkeypatch, payload):
    """Stub urlretrieve to write `payload` to the target path."""
    calls = []

    def fake_retrieve(url, target):
        calls.append(url)
        with open(target, "wb") as f:
            f.write(payload)

    monkeypatch.setattr(pretrained.urllib.request, "urlretrieve",
                        fake_retrieve)
    return calls


def test_expected_sha_from_openai_url():
    url = ("https://openaipublic.azureedge.net/clip/models/"
           f"{GOOD_SHA}/RN50.pt")
    assert pretrained.expected_sha256_for_url(url) == GOOD_SHA


def test_expected_sha_from_mlfoundations_url():
    url = ("https://github.com/mlfoundations/open_clip/releases/download/"
           "v0.2-weights/vit_b_32-quickgelu-laion400m_e31-d867053b.pt")
    assert pretrained.expected_sha256_for_url(url) == "d867053b"
    # explicit registry field wins over the URL-derived value
    assert pretrained.expected_sha256_for_url(url, "abcdef12") == "abcdef12"


def test_expected_sha_unknown_host_is_empty():
    assert pretrained.expected_sha256_for_url(
        "https://example.com/weights.pt") == ""
    # an mlfoundations-style name whose suffix is not hex -> no expectation
    assert pretrained.expected_sha256_for_url(
        "https://github.com/mlfoundations/x/releases/model-final.pt") == ""


def test_download_verifies_and_caches(tmp_path, monkeypatch):
    calls = _serve(monkeypatch, GOOD)
    url = f"https://openaipublic.azureedge.net/clip/models/{GOOD_SHA}/RN50.pt"
    p = pretrained.download_pretrained_from_url(url, str(tmp_path))
    assert open(p, "rb").read() == GOOD
    assert len(calls) == 1
    # second call: cache hit, hash re-verified, no re-download
    assert pretrained.download_pretrained_from_url(url, str(tmp_path)) == p
    assert len(calls) == 1


def test_corrupted_download_raises(tmp_path, monkeypatch):
    _serve(monkeypatch, b"corrupted-bytes")
    url = f"https://openaipublic.azureedge.net/clip/models/{GOOD_SHA}/RN50.pt"
    with pytest.raises(RuntimeError, match="sha256"):
        pretrained.download_pretrained_from_url(url, str(tmp_path))
    # the failed download must not leave a cache entry behind
    assert os.listdir(tmp_path) == []


def test_corrupted_cache_refetched(tmp_path, monkeypatch):
    target = tmp_path / "RN50.pt"
    target.write_bytes(b"stale-or-corrupt")
    calls = _serve(monkeypatch, GOOD)
    url = f"https://openaipublic.azureedge.net/clip/models/{GOOD_SHA}/RN50.pt"
    p = pretrained.download_pretrained_from_url(url, str(tmp_path))
    assert calls == [url]  # cache failed verification -> one re-download
    assert open(p, "rb").read() == GOOD


def test_unverifiable_url_still_downloads(tmp_path, monkeypatch):
    calls = _serve(monkeypatch, GOOD)
    p = pretrained.download_pretrained_from_url(
        "https://example.com/w.pt", str(tmp_path))
    assert open(p, "rb").read() == GOOD and len(calls) == 1
    # cached copy trusted without a hash (reference behavior)
    pretrained.download_pretrained_from_url(
        "https://example.com/w.pt", str(tmp_path))
    assert len(calls) == 1

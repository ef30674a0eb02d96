"""WebDataset-style tar-shard pipeline, dependency-free.

Replaces the reference's webdataset stack (open_clip_train/data.py:74-443)
with a thin native reader: brace-expanded shard lists, per-epoch
deterministically seeded shard shuffle (detshuffle2 semantics, :242-271),
split_by_node/split_by_worker sharding, grouped (image, caption) samples with
a log-and-continue handler for corrupt members (:180-219), optional
weighted resampling (ResampledShards2, :274-325), and per-node batch rounding.
"""

from __future__ import annotations

import io
import itertools
import json
import logging
import math
import os
import random
import re
import tarfile
import threading
import queue as queue_mod
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from xtagclip_tpu.data.loader import DataInfo

IMG_EXTS = ("jpg", "jpeg", "png", "webp", "bmp", "tif", "tiff", "ppm", "pgm")
TXT_EXTS = ("txt", "text", "caption")


def expand_urls(urls) -> List[str]:
    """Brace expansion: 'shards-{0000..0009}.tar' -> 10 paths; '::' joins."""
    if isinstance(urls, (list, tuple)):
        return list(
            itertools.chain.from_iterable(expand_urls(u) for u in urls)
        )
    out = []
    for part in str(urls).split("::"):
        m = re.search(r"\{(\d+)\.\.(\d+)\}", part)
        if m:
            lo, hi = m.group(1), m.group(2)
            width = len(lo)
            for i in range(int(lo), int(hi) + 1):
                out.append(part[: m.start()] + str(i).zfill(width)
                           + part[m.end():])
        else:
            out.append(part)
    return out


def get_dataset_size(shards) -> tuple:
    """Total sample count from sibling __len__/sizes.json files
    (reference data.py:74-97)."""
    shards_list = expand_urls(shards)
    dirname = os.path.dirname(shards_list[0]) if shards_list else ""
    total = None
    sizes_path = os.path.join(dirname, "sizes.json")
    len_path = os.path.join(dirname, "__len__")
    if os.path.exists(sizes_path):
        with open(sizes_path) as f:
            sizes = json.load(f)
        total = sum(int(sizes.get(os.path.basename(s), 0))
                    for s in shards_list)
    elif os.path.exists(len_path):
        with open(len_path) as f:
            total = int(f.read())
    return total, len(shards_list)


def log_and_continue(exn) -> bool:
    """Corrupt-sample handler (reference data.py:180-185)."""
    logging.warning("Handling webdataset error (%r). Ignoring.", exn)
    return True


def _iter_tar_samples(path: str, handler=log_and_continue):
    """Group tar members by key -> dict of ext -> bytes."""
    try:
        tf = tarfile.open(path)
    except (OSError, tarfile.TarError) as e:
        if handler(e):
            return
        raise
    current_key = None
    sample = {}
    try:
        for member in tf:
            if not member.isfile():
                continue
            name = member.name
            key, _, ext = name.rpartition(".")
            if key != current_key:
                if current_key is not None and sample:
                    yield current_key, sample
                current_key, sample = key, {}
            try:
                sample[ext.lower()] = tf.extractfile(member).read()
            except (OSError, tarfile.TarError) as e:
                if not handler(e):
                    raise
        if current_key is not None and sample:
            yield current_key, sample
    finally:
        tf.close()


@dataclass
class WdsConfig:
    shards: List[str]
    resampled: bool = False
    weights: Optional[List[float]] = None
    seed: int = 0
    epoch: int = 0
    rank: int = 0
    world_size: int = 1
    worker_id: int = 0
    num_workers_split: int = 1


class WebDatasetReader:
    """Iterable (image_bytes, caption) stream over tar shards."""

    def __init__(self, cfg: WdsConfig, handler=log_and_continue):
        self.cfg = cfg
        self.handler = handler
        self._epoch = cfg.epoch

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _shards_for_epoch(self) -> List[str]:
        cfg = self.cfg
        rng = random.Random(cfg.seed + self._epoch)  # detshuffle2 semantics
        if cfg.resampled:
            # per-rank/worker seed (reference ResampledShards2 worker_seed):
            # identical seeds would make every rank/worker draw the SAME shard
            # sequence and train on duplicated data.
            rng = random.Random(
                (cfg.seed, self._epoch, cfg.rank, cfg.worker_id).__hash__()
            )
            weights = cfg.weights or [1.0] * len(cfg.shards)
            n = max(len(cfg.shards), 1)
            return rng.choices(cfg.shards, weights=weights, k=n)
        shards = list(cfg.shards)
        rng.shuffle(shards)
        # split_by_node then split_by_worker
        shards = shards[cfg.rank :: max(cfg.world_size, 1)]
        shards = shards[cfg.worker_id :: max(cfg.num_workers_split, 1)]
        return shards

    def __iter__(self) -> Iterator[tuple]:
        for shard in self._shards_for_epoch():
            for key, sample in _iter_tar_samples(shard, self.handler):
                img = txt = None
                for ext, data in sample.items():
                    if ext in IMG_EXTS:
                        img = data
                    elif ext in TXT_EXTS:
                        txt = data.decode("utf-8", errors="replace")
                    elif ext == "json":
                        try:
                            meta = json.loads(data)
                            txt = txt or meta.get("caption") or meta.get("txt")
                        except json.JSONDecodeError:
                            pass
                if img is not None and txt is not None:
                    yield key, img, txt


class WdsLoader:
    """Decoding + batching loader over WebDatasetReader with a prefetch
    thread; approximates the torch DataLoader/worker pipeline on one host."""

    def __init__(self, reader: WebDatasetReader, transform, tokenizer,
                 batch_size: int, num_batches: int, shuffle_buffer: int = 1000,
                 seed: int = 0, native_decode: bool = False,
                 native_target: int = 224, native_train: bool = False,
                 loop_stream: bool = True):
        self.reader = reader
        self.transform = transform
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.num_samples = num_batches * batch_size
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self._epoch = 0
        # native C++ decode pipeline (native/xtag_data.cpp) replaces PIL when
        # available: eval = resize+center-crop; train (native_train) =
        # RandomResizedCrop with scale/ratio from the AugmentationCfg
        self.native_decode = native_decode
        self.native_target = native_target
        self.native_train = native_train
        self.loop_stream = loop_stream
        self._post = None
        if native_decode:
            from xtagclip_tpu.data.native import native_available

            self.native_decode = native_available()
        # The native train path implements RandomResizedCrop only; honor the
        # TrainTransform's AugmentationCfg rather than silently ignoring it:
        # scale/ratio are routed into the native box sampler, and pixel-level
        # augmentations (color jitter / grayscale) force the PIL path, which
        # implements them (reference transform.py:334-355 chain).
        self.native_rrc_scale = (0.9, 1.0)
        self.native_rrc_ratio = (3.0 / 4.0, 4.0 / 3.0)
        if self.native_decode and native_train and transform is not None:
            aug = getattr(transform, "aug", None)
            if aug is not None:
                if (aug.color_jitter is not None or aug.color_jitter_prob
                        or aug.gray_scale_prob):
                    import warnings

                    warnings.warn(
                        "--native-decode: color_jitter/gray_scale augmentations "
                        "have no native implementation; using the PIL transform "
                        "for training samples")
                    self.native_decode = False
                else:
                    self.native_rrc_scale = tuple(aug.scale)
                    if aug.ratio is not None:
                        self.native_rrc_ratio = tuple(aug.ratio)
        if self.native_decode and not native_train and transform is not None:
            # The native EVAL path implements shortest-edge resize +
            # center-crop (bilinear). Non-default resize modes
            # ('squash'/'longest') change geometry — fall back to PIL rather
            # than silently drifting from the reference preprocessing
            # (transform.py:360-383). Interpolation stays bilinear on the
            # native path; that is the documented --native-decode tradeoff.
            cfg = getattr(transform, "cfg", None)
            if cfg is not None and getattr(cfg, "resize_mode", "shortest") \
                    != "shortest":
                import warnings

                warnings.warn(
                    f"--native-decode: resize_mode={cfg.resize_mode!r} has no "
                    "native implementation; using the PIL transform for eval")
                self.native_decode = False
        if self.native_decode and transform is not None and getattr(
                transform, "normalize_host", False):
            # keep the pipeline contract (normalized fp32) while the decode/
            # resize/crop heavy lifting stays native: vectorized numpy
            # normalization over the uint8 crop
            from xtagclip_tpu.data.transforms import _normalize

            cfg = transform.cfg
            self._post = lambda a: _normalize(a, cfg.mean, cfg.std)

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        self.reader.set_epoch(epoch)

    def __len__(self):
        return self.num_batches

    def _decoded(self):
        import numpy as _np

        from PIL import Image

        rng = random.Random(self.seed + self._epoch)
        np_rng = _np.random.default_rng(self.seed + self._epoch)
        buf = []
        for _key, img_bytes, txt in self.reader:
            try:
                arr = None
                if self.native_decode and self.native_train:
                    from xtagclip_tpu.data.native import (
                        decode_rrc,
                        sample_rrc_boxes,
                    )

                    box = sample_rrc_boxes(
                        np_rng, 1, scale=self.native_rrc_scale,
                        ratio=self.native_rrc_ratio)[0]
                    arr = decode_rrc(img_bytes, self.native_target, box)
                elif self.native_decode:
                    from xtagclip_tpu.data.native import decode_resize

                    arr = decode_resize(img_bytes, self.native_target)
                if arr is not None and self._post is not None:
                    arr = self._post(arr)
                if arr is None:
                    # non-JPEG member or native decode failure: PIL fallback
                    # (webdatasets mix formats; never silently drop samples)
                    img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
                    arr = self.transform(img)
            except OSError as e:
                if log_and_continue(e):
                    continue
                raise
            tokens = np.asarray(self.tokenizer([txt])[0], np.int32)
            if self.shuffle_buffer > 1:
                buf.append((arr, tokens))
                if len(buf) >= self.shuffle_buffer:
                    idx = rng.randrange(len(buf))
                    yield buf.pop(idx)
            else:
                yield arr, tokens
        rng.shuffle(buf)
        yield from buf

    def __iter__(self):
        it = self._decoded()
        produced = 0
        exhausted = False
        while produced < self.num_batches and not exhausted:
            imgs, txts = [], []
            for _ in range(self.batch_size):
                try:
                    a, t = next(it)
                except StopIteration:
                    if not self.loop_stream:
                        exhausted = True  # val: stop at stream end
                        break
                    it = self._decoded()  # train: loop shards (wds stream)
                    try:
                        a, t = next(it)
                    except StopIteration:
                        # PEP 479 would turn this into an opaque RuntimeError
                        raise RuntimeError(
                            "webdataset stream is empty for this rank/worker "
                            "— fewer shards than ranks x workers, or every "
                            "sample failed to decode") from None
                imgs.append(a)
                txts.append(t)
            if imgs:
                produced += 1
                yield np.stack(imgs), np.stack(txts)
            elif produced == 0 and exhausted:
                raise RuntimeError(
                    "webdataset stream yielded no samples — empty shards or "
                    "every sample failed to decode")


def get_wds_dataset(args, preprocess_fn, is_train, epoch=0, tokenizer=None):
    """Reference get_wds_dataset (data.py:328-443) contract."""
    input_shards = args.train_data if is_train else args.val_data
    assert input_shards
    shards = expand_urls(input_shards)
    num_samples = (args.train_num_samples if is_train
                   else args.val_num_samples)
    if not num_samples:
        num_samples, _ = get_dataset_size(input_shards)
        if not num_samples:
            if is_train:
                raise RuntimeError(
                    "Currently, the number of dataset samples must be "
                    "specified for the training dataset. Please specify it "
                    "via `--train-num-samples`."
                )
            num_samples = 0

    world = getattr(args, "world_size", 1)
    rank = getattr(args, "rank", 0)
    if is_train:
        global_batch = args.batch_size * max(world, 1)
        num_batches = max(1, num_samples // global_batch) if num_samples else 1
    else:
        # the val reader is deliberately unsplit (every process sees the full
        # set) — batches are per-rank ceil, not floor-global (reference
        # data.py:436-441 val sizing); the loader stops at stream end, so an
        # over-estimate cannot duplicate samples
        num_batches = (math.ceil(num_samples / args.batch_size)
                       if num_samples else 1)

    weights = None
    if is_train and getattr(args, "train_data_upsampling_factors", None):
        # per-'::'-source factors expanded per SHARD to align with the
        # brace-expanded cfg.shards (reference ResampledShards2 expands
        # weights alongside urls, data.py:274-325)
        src_weights = [float(w) for w in
                       args.train_data_upsampling_factors.split("::")]
        sources = (list(input_shards) if isinstance(input_shards, (list, tuple))
                   else str(input_shards).split("::"))
        if len(src_weights) != len(sources):
            raise ValueError(
                f"--train-data-upsampling-factors has {len(src_weights)} "
                f"entries for {len(sources)} '::'-separated sources")
        weights = []
        for src, w in zip(sources, src_weights):
            weights.extend([w] * len(expand_urls(src)))
        assert len(weights) == len(shards)

    reader = WebDatasetReader(WdsConfig(
        shards=shards,
        resampled=bool(getattr(args, "dataset_resampled", False)),
        weights=weights,
        seed=getattr(args, "seed", 0),
        epoch=epoch,
        rank=rank if is_train else 0,
        world_size=world if is_train else 1,
    ))
    native = bool(getattr(args, "native_decode", False))
    native_target = 224
    if native and getattr(preprocess_fn, "cfg", None) is not None:
        native_target = preprocess_fn.cfg.size_hw[0]
    loader = WdsLoader(
        reader, preprocess_fn, tokenizer, args.batch_size, num_batches,
        shuffle_buffer=1000 if is_train else 1,
        seed=getattr(args, "seed", 0),
        native_decode=native, native_target=native_target,
        native_train=is_train, loop_stream=is_train,
    )
    return DataInfo(dataloader=loader)

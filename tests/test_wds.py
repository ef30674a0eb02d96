"""Tar-shard pipeline: brace expansion, corrupt-sample tolerance,
deterministic epoch shuffle, node splitting, end-to-end CLI training."""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from xtagclip_tpu.data.wds import (
    WdsConfig,
    WebDatasetReader,
    WdsLoader,
    expand_urls,
    get_dataset_size,
)


def _make_shard(path, n, prefix, corrupt_member=False):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{prefix}{i:04d}"
            img = Image.fromarray(
                (np.random.default_rng(i).random((16, 16, 3)) * 255)
                .astype("uint8")
            )
            buf = io.BytesIO()
            img.save(buf, "PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{key}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"caption {prefix}{i}".encode()
            info = tarfile.TarInfo(f"{key}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))
        if corrupt_member:
            bad = b"not an image"
            info = tarfile.TarInfo("broken.png")
            info.size = len(bad)
            tf.addfile(info, io.BytesIO(bad))
            capb = b"broken caption"
            info = tarfile.TarInfo("broken.txt")
            info.size = len(capb)
            tf.addfile(info, io.BytesIO(capb))


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    d = tmp_path_factory.mktemp("wds")
    for s in range(3):
        _make_shard(str(d / f"data-{s:04d}.tar"), 8, f"s{s}-",
                    corrupt_member=(s == 1))
    return str(d)


def test_expand_urls():
    out = expand_urls("/x/data-{0000..0002}.tar")
    assert out == ["/x/data-0000.tar", "/x/data-0001.tar", "/x/data-0002.tar"]
    assert expand_urls("a.tar::b.tar") == ["a.tar", "b.tar"]


def test_reader_and_corruption_tolerance(shards):
    paths = expand_urls(os.path.join(shards, "data-{0000..0002}.tar"))
    reader = WebDatasetReader(WdsConfig(shards=paths, seed=3))
    samples = list(reader)
    assert len(samples) == 25  # 24 good + 1 'broken' key yielded raw
    # determinism per epoch
    r2 = WebDatasetReader(WdsConfig(shards=paths, seed=3))
    assert [s[0] for s in r2] == [s[0] for s in samples]
    reader.set_epoch(1)
    assert [s[0] for s in reader] != [s[0] for s in samples]


def test_node_split(shards):
    paths = expand_urls(os.path.join(shards, "data-{0000..0002}.tar"))
    seen = []
    for rank in range(3):
        r = WebDatasetReader(WdsConfig(shards=paths, seed=0, rank=rank,
                                       world_size=3))
        seen.append({s[0].split("-")[0] for s in r})
    assert set.union(*seen) == {"s0", "s1", "s2", "broken"} - {"broken"} | (
        set.union(*seen) & {"broken"}
    )
    # each rank gets exactly one shard's keys
    assert all(len({k for k in s if k.startswith("s")}) == 1 for s in seen)


def test_wds_loader_batches(shards):
    from xtagclip_tpu.data.transforms import PreprocessCfg, image_transform_eval
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer

    paths = expand_urls(os.path.join(shards, "data-{0000..0002}.tar"))
    loader = WdsLoader(
        WebDatasetReader(WdsConfig(shards=paths)),
        image_transform_eval(PreprocessCfg(size=16)),
        SimpleTokenizer(),
        batch_size=4, num_batches=7, shuffle_buffer=8,
    )
    batches = list(loader)
    assert len(batches) == 7  # loops shards to fill (infinite-stream contract)
    imgs, txts = batches[0]
    assert imgs.shape == (4, 16, 16, 3)
    assert txts.shape == (4, 77)


@pytest.mark.e2e
def test_main_cli_webdataset_end_to_end(shards, tmp_path):
    """Vanilla CLI training over tar shards (the CLIPA-recipe data path)."""
    import json as _json

    from xtagclip_tpu.cli import main as main_cli
    from xtagclip_tpu.factory import add_model_config

    cfg = dict(
        embed_dim=64,
        vision_cfg=dict(layers=1, width=64, head_width=32, patch_size=8,
                        image_size=16),
        text_cfg=dict(context_length=16, vocab_size=49408, width=64, heads=2,
                      layers=1),
    )
    cfg_path = tmp_path / "tiny-wds.json"
    cfg_path.write_text(_json.dumps(cfg))
    add_model_config(cfg_path)

    main_cli.main([
        "--model", "tiny-wds",
        "--train-data", os.path.join(shards, "data-{0000..0002}.tar"),
        "--dataset-type", "webdataset",
        "--train-num-samples", "16",
        "--batch-size", "4", "--epochs", "1", "--warmup", "1",
        "--precision", "fp32", "--lr", "1e-4",
        "--force-image-size", "16",
        "--native-decode",
        "--logs", str(tmp_path / "logs"), "--name", "wds_e2e",
        "--log-every-n-steps", "1", "--val-frequency", "0",
        "--workers", "2",
    ])
    ckpts = tmp_path / "logs" / "wds_e2e" / "checkpoints"
    assert (ckpts / "epoch_1").is_dir()


def _make_jpeg_shard(path, n):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            img = Image.fromarray(
                (np.random.default_rng(i).random((48, 64, 3)) * 255)
                .astype("uint8"))
            buf = io.BytesIO()
            img.save(buf, "JPEG", quality=92)
            data = buf.getvalue()
            info = tarfile.TarInfo(f"j{i:04d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"jpeg caption {i}".encode()
            info = tarfile.TarInfo(f"j{i:04d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


def test_wds_loader_native_train_decode(tmp_path):
    """--native-decode train path: native RandomResizedCrop decode with the
    host-normalize bridge keeping the fp32 pipeline contract."""
    from xtagclip_tpu.data.native import native_available
    from xtagclip_tpu.data.transforms import PreprocessCfg, TrainTransform

    if not native_available():
        pytest.skip("native lib unavailable")
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer

    shard = str(tmp_path / "jpeg-0000.tar")
    _make_jpeg_shard(shard, 12)
    paths = [shard]
    reader = WebDatasetReader(WdsConfig(shards=paths, seed=0))
    cfg = PreprocessCfg(size=32)
    loader = WdsLoader(
        reader, TrainTransform(cfg), SimpleTokenizer(),
        batch_size=4, num_batches=2,
        shuffle_buffer=1, native_decode=True, native_target=32,
        native_train=True,
    )
    batches = list(loader)
    assert len(batches) == 2
    imgs, txts = batches[0]
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.float32
    assert txts.shape[0] == 4
    # normalized floats, not raw uint8
    assert imgs.min() < -0.5 and imgs.max() > 0.5

    # per-epoch crops differ (random boxes re-seeded per epoch)
    loader.set_epoch(1)
    imgs2, _ = next(iter(loader))
    assert not np.array_equal(imgs, imgs2)


def test_val_loader_stops_at_stream_end_with_partial_batch(shards):
    """Val (loop_stream=False): the final partial batch is yielded and the
    stream is never looped — no sample evaluated twice (reference val sizing
    is ceil per rank, data.py:436-441)."""
    from xtagclip_tpu.data.transforms import PreprocessCfg, image_transform_eval
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer

    paths = expand_urls(os.path.join(shards, "data-{0000..0002}.tar"))
    loader = WdsLoader(
        WebDatasetReader(WdsConfig(shards=paths)),
        image_transform_eval(PreprocessCfg(size=16)),
        SimpleTokenizer(),
        batch_size=5, num_batches=100, shuffle_buffer=1, loop_stream=False,
    )
    batches = list(loader)
    total = sum(b[0].shape[0] for b in batches)
    assert total == 24  # every decodable sample exactly once
    assert batches[-1][0].shape[0] == 4  # 24 = 4*5 + 4 partial


def test_val_num_batches_is_per_rank_ceil(shards):
    """get_wds_dataset val sizing must not divide by world_size — the val
    reader is unsplit (regression: floor-global under-evaluated 1/world)."""
    import types

    from xtagclip_tpu.data.wds import get_wds_dataset
    from xtagclip_tpu.data.transforms import PreprocessCfg, image_transform_eval
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer

    args = types.SimpleNamespace(
        train_data=None, val_data=os.path.join(shards, "data-{0000..0002}.tar"),
        val_num_samples=25, batch_size=4, world_size=8, rank=0, seed=0,
        dataset_resampled=False, train_data_upsampling_factors=None,
        native_decode=False,
    )
    info = get_wds_dataset(args, image_transform_eval(PreprocessCfg(size=16)),
                           is_train=False, tokenizer=SimpleTokenizer())
    assert info.dataloader.num_batches == 7  # ceil(25/4), not 25//(4*8)


def test_resampled_weights_expand_per_shard(shards, tmp_path):
    """'::'-source upsampling factors align with brace-expanded shards
    (regression: len(weights) != len(population) ValueError)."""
    import types

    from xtagclip_tpu.data.wds import get_wds_dataset
    from xtagclip_tpu.data.transforms import PreprocessCfg, image_transform_train
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer

    spec = (os.path.join(shards, "data-{0000..0001}.tar") + "::"
            + os.path.join(shards, "data-0002.tar"))
    args = types.SimpleNamespace(
        train_data=spec, val_data=None, train_num_samples=24, batch_size=4,
        world_size=1, rank=0, seed=0, dataset_resampled=True,
        train_data_upsampling_factors="1::2", native_decode=False,
    )
    info = get_wds_dataset(args, image_transform_train(PreprocessCfg(size=16)),
                           is_train=True, tokenizer=SimpleTokenizer())
    # 3 expanded shards, weights [1, 1, 2]
    assert info.dataloader.reader.cfg.weights == [1.0, 1.0, 2.0]
    batches = list(info.dataloader)  # draws shards without ValueError
    assert len(batches) == 6

    bad = types.SimpleNamespace(**vars(args))
    bad.train_data_upsampling_factors = "1::2::3"
    with pytest.raises(ValueError, match="3 entries for 2"):
        get_wds_dataset(bad, image_transform_train(PreprocessCfg(size=16)),
                        is_train=True, tokenizer=SimpleTokenizer())


def test_empty_stream_raises_clear_error(tmp_path):
    """A rank with zero shards fails with an explanatory error, not PEP 479's
    'generator raised StopIteration'."""
    from xtagclip_tpu.data.transforms import PreprocessCfg, image_transform_eval
    from xtagclip_tpu.tokenize.bpe import SimpleTokenizer

    loader = WdsLoader(
        WebDatasetReader(WdsConfig(shards=[])),
        image_transform_eval(PreprocessCfg(size=16)),
        SimpleTokenizer(), batch_size=2, num_batches=2, shuffle_buffer=1,
    )
    with pytest.raises(RuntimeError, match="stream is empty"):
        list(loader)

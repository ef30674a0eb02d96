"""Data-parallel semantics: process-unit data splits, batch sharding in the
epoch loop, accum microbatching, resampled-shard decorrelation, LN lock.

Covers the round-1 advisor findings: (1) rank/world_size must be process
units so a single-process multi-device run reads the WHOLE dataset; (2) the
epoch driver must put batches onto the mesh with a 'data' sharding so GSPMD
DP activates (reference DDP semantics, main_other.py:369-379).
"""

import random
import types

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from xtagclip_tpu.core.mesh import DATA_AXIS, create_mesh, init_distributed
from xtagclip_tpu.data.loader import DataLoader
from xtagclip_tpu.train.trainer import train_one_epoch


class _RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((4, 4, 3), i, np.float32)
        txt = np.full((8,), i, np.int32)
        return img, txt


def test_init_distributed_uses_process_units():
    args = types.SimpleNamespace()
    info = init_distributed(args)
    # single process, 8 virtual devices: data split must be 1-way
    assert args.world_size == jax.process_count() == 1
    assert args.rank == 0
    assert info["device_count"] == jax.device_count() == 8


def test_single_process_epoch_covers_full_dataset():
    ds = _RangeDataset(16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0,
                    rank=0, world_size=1, num_workers=2)
    seen = set()
    for images, _ in dl:
        seen.update(int(x) for x in images[:, 0, 0, 0])
    assert seen == set(range(16))


def test_two_rank_split_partitions_dataset():
    ds = _RangeDataset(16)
    seen = []
    for rank in (0, 1):
        dl = DataLoader(ds, batch_size=4, shuffle=True, seed=0,
                        rank=rank, world_size=2, num_workers=2)
        ids = set()
        for images, _ in dl:
            ids.update(int(x) for x in images[:, 0, 0, 0])
        seen.append(ids)
    assert seen[0] | seen[1] == set(range(16))
    assert not (seen[0] & seen[1])


def _fake_info(n, batch):
    dl = DataLoader(_RangeDataset(n), batch_size=batch, shuffle=False,
                    num_workers=1)

    class Info:
        dataloader = dl

        def set_epoch(self, e):
            dl.set_epoch(e)

    return Info()


def _args(**kw):
    base = dict(seed=0, log_every_n_steps=100, use_tagging=False,
                prompt_template_setting=None, accum_freq=1)
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_train_one_epoch_shards_batches_over_data_axis():
    mesh = create_mesh()  # 8x1 over the virtual CPU devices
    recorded = []

    def step_fn(state, batch, rng):
        recorded.append(batch["images"].sharding)
        return state, {"loss": 0.0}

    state = types.SimpleNamespace(step=0)
    train_one_epoch(state, step_fn, {"train": _fake_info(16, 8)},
                    0, _args(), train_key="train", mesh=mesh)
    assert recorded
    for s in recorded:
        assert isinstance(s, NamedSharding)
        assert s.spec == P(DATA_AXIS)


def test_train_one_epoch_accum_reshapes_and_shards():
    mesh = create_mesh()
    recorded = []

    def step_fn(state, batch, rng):
        recorded.append((np.shape(batch["images"]), batch["images"].sharding))
        return state, {"loss": 0.0}

    state = types.SimpleNamespace(step=0)
    train_one_epoch(state, step_fn, {"train": _fake_info(16, 16)},
                    0, _args(accum_freq=2), train_key="train", mesh=mesh)
    (shape, sharding), = recorded[:1]
    assert shape[:2] == (2, 8)  # [accum, micro_b, ...]
    assert sharding.spec == P(None, DATA_AXIS)


def test_unshardable_batch_falls_back_replicated_with_warning():
    mesh = create_mesh()
    recorded = []

    def step_fn(state, batch, rng):
        recorded.append(batch["images"])
        return state, {"loss": 0.0}

    state = types.SimpleNamespace(step=0)
    args = _args()
    train_one_epoch(state, step_fn, {"train": _fake_info(6, 6)},
                    0, args, train_key="train", mesh=mesh)
    assert getattr(args, "_warned_unshardable", False)
    assert isinstance(recorded[0], np.ndarray)  # left on host, replicated


def test_resampled_shards_decorrelated_across_ranks():
    from xtagclip_tpu.data.wds import WdsConfig, WebDatasetReader

    shards = [f"s{i}.tar" for i in range(64)]
    seqs = []
    for rank in (0, 1):
        cfg = WdsConfig(shards=shards, resampled=True, seed=7, rank=rank,
                        world_size=2)
        r = WebDatasetReader(cfg)
        seqs.append(tuple(r._shards_for_epoch()))
    assert seqs[0] != seqs[1]
    # deterministic per (seed, epoch, rank)
    cfg = WdsConfig(shards=shards, resampled=True, seed=7, rank=0,
                    world_size=2)
    assert tuple(WebDatasetReader(cfg)._shards_for_epoch()) == seqs[0]


def test_lock_text_keeps_layernorm_trainable_unless_frozen():
    from xtagclip_tpu.train.train_state import trainable_mask

    params = {
        "text": {
            "transformer": {
                "resblocks_0": {
                    "ln_1": {"scale": np.ones(4), "bias": np.zeros(4)},
                    "mlp": {"kernel": np.ones((4, 4))},
                },
            },
            "ln_final": {"scale": np.ones(4), "bias": np.zeros(4)},
        },
        "visual": {"proj": np.ones((4, 4))},
    }
    m = trainable_mask(params, lock_text=True,
                       lock_text_freeze_layer_norm=False)
    assert m["text"]["transformer"]["resblocks_0"]["ln_1"]["scale"] is True
    assert m["text"]["ln_final"]["bias"] is True
    assert m["text"]["transformer"]["resblocks_0"]["mlp"]["kernel"] is False
    assert m["visual"]["proj"] is True

    m2 = trainable_mask(params, lock_text=True,
                        lock_text_freeze_layer_norm=True)
    assert m2["text"]["transformer"]["resblocks_0"]["ln_1"]["scale"] is False
    assert m2["text"]["ln_final"]["bias"] is False


def test_profile_flag_writes_trace(tmp_path):
    """--profile captures a jax.profiler trace of a steady-state step window
    (SURVEY 5.1 TPU tracing equivalent)."""
    import jax.numpy as jnp

    def step_fn(state, batch, rng):
        return state, {"loss": jnp.sum(batch["images"])}

    state = types.SimpleNamespace(step=0, params=jnp.zeros(1))
    args = _args(profile=True, profile_dir=str(tmp_path / "trace"),
                 profile_steps=2)
    train_one_epoch(state, step_fn, {"train": _fake_info(32, 4)},
                    0, args, train_key="train")
    produced = list((tmp_path / "trace").rglob("*"))
    assert any(p.is_file() for p in produced), produced


def test_loader_len_matches_yielded_batches_with_padding():
    """len(loader) must equal the number of batches actually yielded when
    N % world_size != 0 (regression: floor-based len() vs ceil-padded
    _indices — len()==0 while one batch streams, poisoning total_steps)."""
    ds = _RangeDataset(63)
    for world, bs, drop_last in ((4, 16, True), (4, 16, False), (2, 10, False),
                                 (1, 16, True)):
        for rank in range(world):
            dl = DataLoader(ds, batch_size=bs, shuffle=False, rank=rank,
                            world_size=world, drop_last=drop_last,
                            num_workers=2)
            got = sum(1 for _ in dl)
            assert got == len(dl) == dl.num_batches, (
                f"world={world} rank={rank} bs={bs} drop_last={drop_last}: "
                f"yielded {got}, len {len(dl)}")
            assert len(dl) > 0  # 63/4 rounds to 16 per rank -> 1 batch @16


def test_loader_early_exit_does_not_leak_producer_thread():
    """Breaking out of iteration mid-epoch must let the producer thread (and
    its worker pool) terminate (regression: blocking put() leaked them)."""
    import threading
    import time

    ds = _RangeDataset(64)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        it = iter(dl)
        next(it)
        it.close()  # consumer abandons the epoch
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, (
        f"{threading.active_count() - before} leaked threads")

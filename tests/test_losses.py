"""Loss parity (vs reference torch impls) and distributed equivalence on the
8-device CPU mesh: sharded loss == unsharded loss on the concatenated batch.
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from xtagclip_tpu.losses import (
    AsymmetricLoss,
    ClipLoss,
    DQNCOSLoss,
    clip_loss,
    dqncos_loss,
    siglip_loss,
)


@pytest.fixture(scope="module")
def ref_losses():
    spec = importlib.util.spec_from_file_location(
        "_ref_asl",
        "/root/reference/src/open_clip/tagging_heads/asymmetric_loss.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_asl_matches_reference(ref_losses, rng):
    import torch

    x = rng.standard_normal((4, 44), dtype=np.float32)
    y = (rng.random((4, 44)) > 0.7).astype(np.float32)
    for gn, gp, clip in [(7, 0, 0.05), (4, 1, 0.05), (0, 0, 0.0)]:
        ref = ref_losses.AsymmetricLoss(gamma_neg=gn, gamma_pos=gp, clip=clip)
        got = AsymmetricLoss(gamma_neg=gn, gamma_pos=gp, clip=clip)(x, y)
        want = ref(torch.from_numpy(x), torch.from_numpy(y)).item()
        np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_dqncos_matches_reference(ref_losses, rng):
    import torch

    x = rng.standard_normal((6, 6), dtype=np.float32)
    want = ref_losses.DQNCOSLoss()(torch.from_numpy(x)).item()
    got = float(DQNCOSLoss()(x))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_clip_loss_single_device(rng):
    import torch
    import torch.nn.functional as F

    img = rng.standard_normal((8, 16), dtype=np.float32)
    txt = rng.standard_normal((8, 16), dtype=np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    scale = 50.0
    lpi = torch.from_numpy(scale * img @ txt.T)
    labels = torch.arange(8)
    want = (
        F.cross_entropy(lpi, labels) + F.cross_entropy(lpi.T, labels)
    ).item() / 2
    got = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), scale))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ("data",))


@pytest.mark.parametrize("local_loss", [False, True])
def test_clip_loss_sharded_equals_global(rng, local_loss):
    img = rng.standard_normal((16, 8), dtype=np.float32)
    txt = rng.standard_normal((16, 8), dtype=np.float32)
    scale = 30.0
    want = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), scale))

    mesh = _mesh()
    f = shard_map(
        lambda i, t: clip_loss(i, t, scale, axis_name="data",
                               local_loss=local_loss)[None],
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )
    per_shard = np.asarray(jax.jit(f)(jnp.asarray(img), jnp.asarray(txt)))
    if local_loss:
        # each shard's CE rows are a disjoint slice of the global matrix;
        # global CE = mean over shards (equal shard sizes)
        got = float(per_shard.mean())
    else:
        np.testing.assert_allclose(per_shard, per_shard[0], rtol=1e-6)
        got = float(per_shard[0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("dist_impl", ["shift", "gather"])
def test_siglip_ring_equals_global(rng, dist_impl):
    img = rng.standard_normal((16, 8), dtype=np.float32)
    txt = rng.standard_normal((16, 8), dtype=np.float32)
    scale, bias = 10.0, -5.0

    want = float(
        siglip_loss(jnp.asarray(img), jnp.asarray(txt), scale, bias)
    )  # full-batch single device; sum-normalized by n

    mesh = _mesh()
    f = shard_map(
        lambda i, t: siglip_loss(i, t, scale, bias, axis_name="data",
                                 dist_impl=dist_impl)[None],
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )
    per_shard = np.asarray(jax.jit(f)(jnp.asarray(img), jnp.asarray(txt)))
    # reference normalizes each block-loss by the LOCAL batch; the global
    # single-device loss normalizes by the full batch: sum/world relation
    got = float(per_shard.sum() / 8)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_clip_loss_wrapper_dict():
    img = jnp.eye(4, 8)
    txt = jnp.eye(4, 8)
    out = ClipLoss()(img, txt, 10.0, output_dict=True)
    assert set(out) == {"contrastive_loss"}

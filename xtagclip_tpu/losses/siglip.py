"""SigLIP sigmoid contrastive loss with a ppermute ring for negatives.

Reference loss.py:314-448 implements four distributed variants (bidir/shift
P2P rings, all_reduce, all_gather). On TPU the canonical form is ONE ring:
`jax.lax.ppermute` rotates text features around the data axis (maps directly
onto the ICI ring; XLA overlaps the permute with the local matmul). `shift`
is exactly that ring; `bidir` is the same communication volume split over both
directions; `reduce`/`gather` are strictly worse on ICI — all four flags are
accepted and routed to the ring (or all_gather for 'gather') for CLI parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _sigmoid_block_loss(image_features, text_features, logit_scale, logit_bias,
                        negative_only: bool = False):
    logits = logit_scale * image_features @ text_features.T
    if logit_bias is not None:
        logits = logits + logit_bias
    logits = logits.astype(jnp.float32)
    n = image_features.shape[0]
    labels = -jnp.ones((n, text_features.shape[0]), jnp.float32)
    if not negative_only:
        labels = labels + 2 * jnp.eye(n, text_features.shape[0], dtype=jnp.float32)
    return -jax.nn.log_sigmoid(labels * logits).sum() / n


def siglip_loss(
    image_features,
    text_features,
    logit_scale,
    logit_bias,
    axis_name: Optional[str] = None,
    dist_impl: str = "shift",
):
    """Call inside shard_map with axis_name for the distributed ring."""
    loss = _sigmoid_block_loss(image_features, text_features, logit_scale,
                               logit_bias, negative_only=False)
    if axis_name is None:
        return loss

    world = jax.lax.axis_size(axis_name)
    if world == 1:
        return loss

    if dist_impl == "gather":
        all_txt = jax.lax.all_gather(text_features, axis_name)  # [W, B, D]
        rank = jax.lax.axis_index(axis_name)

        def body(i, acc):
            block = all_txt[i]
            l = _sigmoid_block_loss(image_features, block, logit_scale,
                                    logit_bias, negative_only=True)
            return acc + jnp.where(i == rank, 0.0, l)

        return jax.lax.fori_loop(0, world, body, loss)

    # ring: rotate text features world-1 times; every arriving block is a
    # pure-negative block (reference 'shift'; 'bidir' differs only in routing)
    perm = [(i, (i + 1) % world) for i in range(world)]
    txt = text_features

    def body(i, carry):
        loss_acc, txt = carry
        txt = jax.lax.ppermute(txt, axis_name, perm)
        loss_acc = loss_acc + _sigmoid_block_loss(
            image_features, txt, logit_scale, logit_bias, negative_only=True
        )
        return loss_acc, txt

    loss, _ = jax.lax.fori_loop(0, world - 1, body, (loss, txt))
    return loss


class SigLipLoss:
    """Callable wrapper mirroring the reference constructor surface."""

    def __init__(
        self,
        cache_labels: bool = False,
        rank: int = 0,
        world_size: int = 1,
        dist_impl: Optional[str] = None,
        axis_name: Optional[str] = None,
    ):
        del cache_labels, rank
        self.dist_impl = dist_impl or "bidir"
        assert self.dist_impl in ("bidir", "shift", "reduce", "gather")
        self.axis_name = axis_name if world_size > 1 or axis_name else None

    def __call__(self, image_features, text_features, logit_scale, logit_bias,
                 output_dict: bool = False, **unused):
        impl = "gather" if self.dist_impl == "gather" else "shift"
        loss = siglip_loss(
            image_features, text_features, logit_scale, logit_bias,
            axis_name=self.axis_name, dist_impl=impl,
        )
        return {"contrastive_loss": loss} if output_dict else loss

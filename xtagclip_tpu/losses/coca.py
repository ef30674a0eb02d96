"""CoCa loss: weighted contrastive + caption CE with pad masking
(reference loss.py:142-184)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax

from xtagclip_tpu.losses.clip_loss import ClipLoss, clip_loss


class CoCaLoss(ClipLoss):
    def __init__(self, caption_loss_weight: float, clip_loss_weight: float,
                 pad_id: int = 0, **kw):
        super().__init__(**kw)
        self.caption_loss_weight = caption_loss_weight
        self.clip_loss_weight = clip_loss_weight
        self.pad_id = pad_id

    def __call__(self, image_features, text_features, logits, labels,
                 logit_scale, output_dict: bool = False, **unused):
        if self.clip_loss_weight:
            closs = clip_loss(
                image_features, text_features, logit_scale,
                axis_name=self.axis_name, local_loss=self.local_loss,
            ) * self.clip_loss_weight
        else:
            closs = jnp.zeros(())

        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        )
        mask = (labels != self.pad_id).astype(jnp.float32)
        caption = (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        caption = caption * self.caption_loss_weight

        if output_dict:
            return {"contrastive_loss": closs, "caption_loss": caption}
        return closs, caption

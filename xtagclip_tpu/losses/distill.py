"""Distillation CLIP loss (reference loss.py:187-223)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from xtagclip_tpu.losses.clip_loss import ClipLoss, gather_features, _xent


def _dist_loss(teacher_logits, student_logits):
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=1)
    return -(t * s).sum(axis=1).mean(axis=0)


def distill_loss(
    image_features,
    text_features,
    logit_scale,
    dist_image_features,
    dist_text_features,
    dist_logit_scale,
):
    """Functional distillation term (reference loss.py:205-223): soft
    cross-entropy between the teacher's and student's contrastive logit
    distributions, averaged over both directions. Teacher features should be
    stop_gradient'ed by the caller."""
    lpi = logit_scale * image_features @ text_features.T
    lpt = lpi.T
    dlpi = dist_logit_scale * dist_image_features @ dist_text_features.T
    dlpt = dlpi.T
    return (_dist_loss(dlpi, lpi) + _dist_loss(dlpt, lpt)) / 2


class DistillClipLoss(ClipLoss):
    def _logits(self, img, txt, scale):
        if self.axis_name is not None:
            all_img, all_txt = gather_features(img, txt, self.axis_name,
                                               self.local_loss)
            if self.local_loss:
                lpi = scale * img @ all_txt.T
                lpt = scale * txt @ all_img.T
            else:
                lpi = scale * all_img @ all_txt.T
                lpt = lpi.T
        else:
            lpi = scale * img @ txt.T
            lpt = lpi.T
        return lpi, lpt

    def __call__(
        self,
        image_features,
        text_features,
        logit_scale,
        dist_image_features,
        dist_text_features,
        dist_logit_scale,
        output_dict: bool = False,
        **unused,
    ):
        lpi, lpt = self._logits(image_features, text_features, logit_scale)
        dlpi, dlpt = self._logits(dist_image_features, dist_text_features,
                                  dist_logit_scale)
        b = lpi.shape[0]
        if self.axis_name is not None and self.local_loss:
            labels = jnp.arange(b) + b * jax.lax.axis_index(self.axis_name)
        else:
            labels = jnp.arange(b)
        contrastive = (_xent(lpi, labels) + _xent(lpt, labels)) / 2
        distill = (_dist_loss(dlpi, lpi) + _dist_loss(dlpt, lpt)) / 2
        if output_dict:
            return {"contrastive_loss": contrastive, "distill_loss": distill}
        return contrastive, distill

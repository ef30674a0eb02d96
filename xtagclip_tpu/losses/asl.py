"""Asymmetric multi-label loss (ASL) and helpers.

Matches reference tagging_heads/asymmetric_loss.py:6-52 including SUM
reduction and the stop-gradient on the focal weight
(disable_torch_grad_focal_loss -> lax.stop_gradient).
Instantiated in the model with (gamma_neg=7, gamma_pos=0, clip=0.05)
(model.py:285) and in the driver with defaults (main_other.py:553).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def asymmetric_loss(
    logits,
    targets,
    gamma_neg: float = 4.0,
    gamma_pos: float = 1.0,
    clip: float = 0.05,
    eps: float = 1e-8,
    disable_grad_focal: bool = True,
):
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    xs_pos = jax.nn.sigmoid(x)
    xs_neg = 1.0 - xs_pos
    if clip is not None and clip > 0:
        xs_neg = jnp.clip(xs_neg + clip, max=1.0)

    los_pos = y * jnp.log(jnp.clip(xs_pos, min=eps))
    los_neg = (1.0 - y) * jnp.log(jnp.clip(xs_neg, min=eps))
    loss = los_pos + los_neg

    if gamma_neg > 0 or gamma_pos > 0:
        pt = xs_pos * y + xs_neg * (1.0 - y)
        gamma = gamma_pos * y + gamma_neg * (1.0 - y)
        w = jnp.power(1.0 - pt, gamma)
        if disable_grad_focal:
            w = jax.lax.stop_gradient(w)
        loss = loss * w

    return -loss.sum()


class AsymmetricLoss:
    def __init__(self, gamma_neg=4, gamma_pos=1, clip=0.05, eps=1e-8,
                 disable_torch_grad_focal_loss=True):
        self.gamma_neg = gamma_neg
        self.gamma_pos = gamma_pos
        self.clip = clip
        self.eps = eps
        self.disable_grad_focal = disable_torch_grad_focal_loss

    def __call__(self, logits, targets):
        return asymmetric_loss(
            logits, targets, self.gamma_neg, self.gamma_pos, self.clip,
            self.eps, self.disable_grad_focal,
        )

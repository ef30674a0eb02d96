"""DQNCOS loss: symmetric InfoNCE cross-entropy over a fusion logit matrix.

Matches reference tagging_heads/asymmetric_loss.py:56-66: CE(logits, arange)
averaged with CE(logits.T, arange).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def dqncos_loss(logits):
    logits = logits.astype(jnp.float32)
    n = logits.shape[0]
    labels = jnp.arange(n)
    a = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return (a + b) / 2


class DQNCOSLoss:
    def __call__(self, logits):
        return dqncos_loss(logits)

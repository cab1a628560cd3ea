"""SoftmaxRankingLoss (lib/loss.py) — listwise softmax cross entropy against
a (possibly multi-hot) target distribution."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_ranking_loss(inputs: jax.Array, targets: jax.Array) -> jax.Array:
    """inputs, targets: (B, N). -mean_B sum_N log softmax(inputs) * targets."""
    assert inputs.shape == targets.shape
    probs = jax.nn.softmax(inputs + 1e-8, axis=1)
    return jnp.mean(-jnp.sum(jnp.log(probs + 1e-8) * targets, axis=1))

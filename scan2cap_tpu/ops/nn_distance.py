"""Chamfer (nearest-neighbor) distance and huber loss.

Port of utils/nn_distance.py:13-59 (VoteNet) as pure jnp — used by the
vote / objectness / center losses and by proposal↔GT assignment.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def huber_loss(error: jax.Array, delta: float = 1.0) -> jax.Array:
    """0.5 x² for |x|<=delta else 0.5 delta² + delta (|x|-delta)
    (utils/nn_distance.py:13-30)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic ** 2 + delta * linear


def nn_distance(
    pc1: jax.Array,
    pc2: jax.Array,
    l1smooth: bool = False,
    delta: float = 1.0,
    l1: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Bidirectional nearest-neighbor distance between two point sets.

    Args:
      pc1: (B, N, C); pc2: (B, M, C).

    Returns:
      dist1 (B,N), idx1 (B,N), dist2 (B,M), idx2 (B,M) — per-point min
      distance to the other set and the argmin index, matching
      utils/nn_distance.py:32-59 (squared-L2 by default, huber or L1 variants).
    """
    diff = pc1[:, :, None, :] - pc2[:, None, :, :]  # (B,N,M,C)
    if l1smooth:
        dist = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        dist = jnp.sum(diff ** 2, axis=-1)
    dist1 = jnp.min(dist, axis=2)
    idx1 = jnp.argmin(dist, axis=2).astype(jnp.int32)
    dist2 = jnp.min(dist, axis=1)
    idx2 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2

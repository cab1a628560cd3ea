"""Three-nearest-neighbor feature interpolation.

TPU-native replacement for ``interpolate_gpu.cu`` (three_nn :9-68,
three_interpolate :72-154).  ``three_nn`` returns *sqrt'd* distances, matching
the Python wrapper (pointnet2_utils.py:118-143 applies ``torch.sqrt``).
Tie-breaking: the CUDA scan keeps the earliest index on equal distances;
``lax.top_k`` also prefers lower indices on ties.

``three_interpolate`` is a gather + weighted sum — its scatter-add gradient
(interpolate_gpu.cu:111-154) falls out of autodiff.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def three_nn(unknown: jax.Array, known: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Find the 3 nearest 'known' points for each 'unknown' point.

    Args:
      unknown: (B, n, 3).
      known: (B, m, 3).

    Returns:
      dist: (B, n, 3) Euclidean (sqrt'd) distances.
      idx: (B, n, 3) int32 indices into m.
    """
    u = unknown.astype(jnp.float32)
    k = known.astype(jnp.float32)
    # coordinate-difference form, NOT the |u|^2 - 2uk + |k|^2 matmul
    # expansion: on TPU the einsum would ride the MXU's bf16 passes
    # (~1e-2 ABSOLUTE error on room-scale coordinates — measured picking
    # entirely wrong neighbors, scripts/tpu_parity_check.py), and the
    # diff form is the CUDA kernel's exact f32 arithmetic.  FP shapes are
    # tiny (n<=1024, m<=512), so the 3 elementwise (n, m) passes are free.
    dx = u[:, :, None, 0] - k[:, None, :, 0]
    dy = u[:, :, None, 1] - k[:, None, :, 1]
    dz = u[:, :, None, 2] - k[:, None, :, 2]
    d2 = dx * dx + dy * dy + dz * dz                   # (B, n, m)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    return jax.lax.stop_gradient(dist), jax.lax.stop_gradient(idx.astype(jnp.int32))


def three_interpolate(features: jax.Array, idx: jax.Array,
                      weight: jax.Array) -> jax.Array:
    """Weighted interpolation of 3 neighbor features.

    Args:
      features: (B, m, C) source features.
      idx: (B, n, 3) neighbor indices.
      weight: (B, n, 3) interpolation weights.

    Returns:
      (B, n, C) = sum_k weight[..., k] * features[idx[..., k]].
    """
    B, n, _ = idx.shape
    C = features.shape[-1]
    flat = idx.reshape(B, n * 3)
    gathered = jnp.take_along_axis(features, flat[..., None], axis=1)
    gathered = gathered.reshape(B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolation_weights(dist: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Normalized inverse-distance weights (pointnet2_modules.py:393-401)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)

"""Axis-aligned 3D box geometry as jnp functions.

Replaces utils/box_util.py (numpy/torch mix in the reference) with one
device-side implementation used by losses, the graph module, NMS, and eval.
ScanNet boxes are axis-aligned (heading always 0 — model_util_scannet.py:130-140),
so the AABB IoU path (box_util.py:97-209) is the semantics to preserve.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scan2cap_tpu.config import SCANNET_MEAN_SIZE_ARR


def roty_batch(angle: jax.Array) -> jax.Array:
    """Rotation about the y-axis (box_util.py:326-338). (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, s], axis=-1),
        jnp.stack([z, o, z], axis=-1),
        jnp.stack([-s, z, c], axis=-1),
    ], axis=-2)


def get_3d_box_batch(box_size: jax.Array, heading_angle: jax.Array,
                     center: jax.Array) -> jax.Array:
    """Corner construction (box_util.py:360-382).

    Args:
      box_size: (..., 3) (l, w, h).
      heading_angle: (...,) clockwise from +x.
      center: (..., 3).

    Returns:
      (..., 8, 3) corners. Corner order matches the reference:
      x: +,+,-,-,+,+,-,- (l/2); y: +,-,-,+,+,-,-,+ (w/2); z: +,+,+,+,-,-,-,- (h/2),
      rotated by roty(heading) then translated.
    """
    l = box_size[..., 0:1]
    w = box_size[..., 1:2]
    h = box_size[..., 2:3]
    sx = jnp.asarray([1, 1, -1, -1, 1, 1, -1, -1], dtype=box_size.dtype)
    sy = jnp.asarray([1, -1, -1, 1, 1, -1, -1, 1], dtype=box_size.dtype)
    sz = jnp.asarray([1, 1, 1, 1, -1, -1, -1, -1], dtype=box_size.dtype)
    corners = jnp.stack([l / 2 * sx, w / 2 * sy, h / 2 * sz], axis=-1)  # (...,8,3)
    R = roty_batch(heading_angle)
    corners = jnp.einsum("...ij,...kj->...ki", R, corners)
    return corners + center[..., None, :]


def box_min_max(corners: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., 8, 3) -> min (..., 3), max (..., 3)."""
    return jnp.min(corners, axis=-2), jnp.max(corners, axis=-2)


def box3d_iou_batch(corners1: jax.Array, corners2: jax.Array) -> jax.Array:
    """Elementwise AABB 3D IoU over leading dims (box_util.py:156-209).

    corners1, corners2: (..., 8, 3) -> (...,).
    """
    min1, max1 = box_min_max(corners1)
    min2, max2 = box_min_max(corners2)
    lo = jnp.maximum(min1, min2)
    hi = jnp.minimum(max1, max2)
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(max1 - min1, axis=-1)
    vol2 = jnp.prod(max2 - min2, axis=-1)
    return inter / (vol1 + vol2 - inter + 1e-8)


def box3d_iou_matrix(corners1: jax.Array, corners2: jax.Array) -> jax.Array:
    """All-pairs AABB IoU: (N, 8, 3) x (M, 8, 3) -> (N, M).

    The K=256 proposal IoU matrix used by the graph module and NMS — one
    vectorized pass instead of the reference's per-target Python loop
    (models/graph_module.py:224-233).
    """
    min1, max1 = box_min_max(corners1)  # (N,3)
    min2, max2 = box_min_max(corners2)  # (M,3)
    lo = jnp.maximum(min1[:, None, :], min2[None, :, :])
    hi = jnp.minimum(max1[:, None, :], max2[None, :, :])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(max1 - min1, axis=-1)
    vol2 = jnp.prod(max2 - min2, axis=-1)
    return inter / (vol1[:, None] + vol2[None, :] - inter + 1e-8)


def param2obb_batch_jnp(center: jax.Array, heading_class: jax.Array,
                        heading_residual: jax.Array, size_class: jax.Array,
                        size_residual: jax.Array) -> jax.Array:
    """Device-side obb decode (model_util_scannet.py:166-172): (..., 7).

    heading is always 0 for ScanNet (class2angle returns 0) and is negated.
    """
    mean_size = jnp.asarray(SCANNET_MEAN_SIZE_ARR)[size_class]
    size = mean_size + size_residual
    heading = jnp.zeros(center.shape[:-1], dtype=center.dtype)
    return jnp.concatenate([center, size, (-heading)[..., None]], axis=-1)


def generalized_box3d_iou_aabb(corners1: jax.Array,
                               corners2: jax.Array) -> jax.Array:
    """All-pairs generalized IoU for axis-aligned boxes
    (benchmark/box_util.py:634-696, rotated_boxes=False path).

    gIoU = IoU - (vol(enclosing) - vol(union)) / vol(enclosing).
    corners1 (N,8,3), corners2 (M,8,3) -> (N,M).
    """
    min1, max1 = box_min_max(corners1)
    min2, max2 = box_min_max(corners2)
    lo = jnp.maximum(min1[:, None, :], min2[None, :, :])
    hi = jnp.minimum(max1[:, None, :], max2[None, :, :])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(max1 - min1, axis=-1)
    vol2 = jnp.prod(max2 - min2, axis=-1)
    union = vol1[:, None] + vol2[None, :] - inter
    iou = inter / (union + 1e-8)
    enc_lo = jnp.minimum(min1[:, None, :], min2[None, :, :])
    enc_hi = jnp.maximum(max1[:, None, :], max2[None, :, :])
    enc = jnp.prod(jnp.maximum(enc_hi - enc_lo, 0.0), axis=-1)
    return iou - (enc - union) / (enc + 1e-8)

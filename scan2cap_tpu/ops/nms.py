"""Device-side greedy NMS.

Replaces utils/nms.py (numpy, per-scene Python while-loops on CPU) with a
vectorized masked formulation: boxes are visited in descending-score order;
box i survives iff no higher-scoring surviving box overlaps it above the
threshold (for class-aware NMS: and has the same class).  This is exactly
greedy NMS (nms_3d_faster / nms_3d_faster_samecls, utils/nms.py:60-151) —
the K x K AABB IoU matrix is trivial on TPU at K=256.

Note: the reference computes the suppression "IoU" on the min/max extents of
the corner boxes with an un-clamped intersection in x/y/z — identical to the
AABB IoU here.  old_type=False (the default everywhere) is implemented.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _aabb_iou_matrix(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """lo/hi (K, 3) -> (K, K) IoU."""
    inter_lo = jnp.maximum(lo[:, None, :], lo[None, :, :])
    inter_hi = jnp.minimum(hi[:, None, :], hi[None, :, :])
    inter = jnp.prod(jnp.maximum(inter_hi - inter_lo, 0.0), axis=-1)
    vol = jnp.prod(hi - lo, axis=-1)
    return inter / (vol[:, None] + vol[None, :] - inter + 1e-8)


def _nms_single(corners: jax.Array, scores: jax.Array, classes: jax.Array,
                iou_threshold: float, same_cls: bool) -> jax.Array:
    """corners (K, 8, 3), scores (K,), classes (K,) -> keep mask (K,) bool."""
    K = scores.shape[0]
    lo = jnp.min(corners, axis=1)
    hi = jnp.max(corners, axis=1)
    iou = _aabb_iou_matrix(lo, hi)
    if same_cls:
        iou = iou * (classes[:, None] == classes[None, :])

    # reference utils/nms.py:82 sorts ASCENDING and pops from the end, so
    # among exactly tied scores the HIGHER proposal index is visited (and
    # kept) first; sorting the reversed array emulates that tie order
    # (plain argsort(-scores, stable) would prefer the lower index)
    order = (K - 1) - jnp.argsort(-scores[::-1], stable=True)
    iou_s = iou[order][:, order]              # sorted-rank space
    earlier = (jnp.arange(K)[None, :] < jnp.arange(K)[:, None])
    suppress_candidate = (iou_s > iou_threshold) & earlier  # (rank, earlier rank)

    def body(r, keep_s):
        sup = jnp.any(suppress_candidate[r] & keep_s)
        return keep_s.at[r].set(~sup)

    keep_s = jax.lax.fori_loop(0, K, body,
                               jnp.zeros((K,), bool).at[0].set(True))
    keep = jnp.zeros((K,), bool).at[order].set(keep_s)
    return keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "same_cls"))
def nms_3d(corners: jax.Array, scores: jax.Array, classes: jax.Array,
           iou_threshold: float = 0.25, same_cls: bool = True) -> jax.Array:
    """Batched class-aware 3D NMS.

    Args:
      corners: (B, K, 8, 3); scores: (B, K) objectness prob;
      classes: (B, K) int class ids.

    Returns:
      (B, K) bool keep mask (== the reference's ``pred_mask``).
    """
    fn = functools.partial(_nms_single, iou_threshold=iou_threshold,
                           same_cls=same_cls)
    return jax.vmap(fn)(corners, scores, classes)


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_2d(corners: jax.Array, scores: jax.Array,
           iou_threshold: float = 0.25) -> jax.Array:
    """Birds-eye (x/y footprint) greedy NMS — utils/nms.py:28-58
    nms_2d_faster over the box extents, class-agnostic.

    corners (B, K, 8, 3), scores (B, K) -> (B, K) bool keep mask.
    """
    # flatten the up axis so the AABB IoU degenerates to the 2D footprint
    flat = corners.at[..., 2].set(0.0)
    flat = flat.at[..., 0::2, 2].set(1.0)  # unit height for a valid volume
    classes = jnp.zeros(scores.shape, jnp.int32)
    fn = functools.partial(_nms_single, iou_threshold=iou_threshold,
                           same_cls=False)
    return jax.vmap(fn)(flat, scores, classes)

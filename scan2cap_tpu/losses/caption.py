"""Caption + graph-edge losses — lib/loss_helper.py:189-355.

Static-shape versions: the decoder always runs MAX_DES_LEN+1 steps, so the
caption CE masks steps beyond the batch-max caption length (the reference
truncates the scan instead — same objective, loss_helper.py:189-230: the
denominator counts (good box × step) pairs including pads, and pad targets
contribute zero loss via ignore_index=0).

Edge losses operate on the dense (B, K, L) edge list with ``edge_mask``
instead of the reference's per-scene variable-size edge tensors
(loss_helper.py:249-355).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scan2cap_tpu.losses.detection import _ce_logits


def compute_cap_loss(data_dict: dict) -> Tuple[jax.Array, jax.Array]:
    """Token CE (ignore pad=0) gated by good_bbox_masks (loss_helper.py:189-230).

    Returns (cap_loss, cap_acc)."""
    pred_caps = data_dict["lang_cap"]               # (B, T-1, V)
    lang_len = data_dict["lang_len"]
    num_words = jnp.max(lang_len)                   # reference batch-max
    T = pred_caps.shape[1]
    targets = data_dict["lang_ids"][:, 1:T + 1].astype(jnp.int32)  # (B, T)

    step_mask = (jnp.arange(T)[None, :] < (num_words - 1)).astype(jnp.float32)
    pad_mask = (targets != 0).astype(jnp.float32)
    good = data_dict["good_bbox_masks"].astype(jnp.float32)[:, None]  # (B,1)

    ce = _ce_logits(pred_caps, targets) * pad_mask  # ignore_index=0
    denom = jnp.sum(good * step_mask) + 1e-6        # pads counted (reference)
    cap_loss = jnp.sum(ce * good * step_mask) / denom

    # accuracy over non-pad tokens of good boxes
    preds = jnp.argmax(pred_caps, axis=-1)
    correct_mask = pad_mask * good * step_mask
    num_good = jnp.sum(data_dict["good_bbox_masks"])
    cap_acc = jnp.where(
        num_good > 0,
        jnp.sum((preds == targets).astype(jnp.float32) * correct_mask)
        / (jnp.sum(correct_mask) + 1e-6),
        0.0)
    return cap_loss, cap_acc


def radian_to_label(radians: jax.Array, num_bins: int = 6) -> jax.Array:
    """Discretize [0, pi] rotation angles into num_bins classes
    (loss_helper.py:232-247).  torch.bucketize(right=False) returns the
    first boundary index >= x, i.e. searchsorted side='left' — an angle
    landing EXACTLY on a bin edge k*pi/6 belongs to class k, not k+1
    (verified against torch; side='right' mislabeled exact edges)."""
    boundaries = jnp.arange(jnp.pi / num_bins, jnp.pi - 1e-8, jnp.pi / num_bins)
    return jnp.searchsorted(boundaries, radians, side="left").astype(jnp.int32)


def _edge_endpoint_gather(x: jax.Array, assignment: jax.Array,
                          nbr_idx: jax.Array):
    """Gather per-proposal labels for edge sources (rows) and targets (nbrs).

    x (B, M, ...) GT-object-indexed; assignment (B, K); nbr_idx (B, K, L).
    Returns (src (B, K, 1, ...), tgt (B, K, L, ...))."""
    B, K, L = nbr_idx.shape
    src_obj = assignment                                   # (B, K)
    tgt_prop = nbr_idx.reshape(B, K * L)
    tgt_obj = jnp.take_along_axis(assignment, tgt_prop, axis=1).reshape(B, K, L)

    def take(obj_idx):
        flat = obj_idx.reshape(B, -1)
        out = x[jnp.arange(B)[:, None], flat]
        return out.reshape(obj_idx.shape + x.shape[2:])

    return take(src_obj[..., None]), take(tgt_obj)


def compute_node_orientation_loss(data_dict: dict, num_bins: int = 6
                                  ) -> Tuple[jax.Array, jax.Array]:
    """CE over relative-rotation bins per edge (loss_helper.py:249-313)."""
    assignment = data_dict["object_assignment"].astype(jnp.int32)  # (B, K)
    nbr_idx = data_dict["edge_nbr_idx"]                    # (B, K, L)
    edge_mask = data_dict["edge_mask"]                     # (B, K, L)
    preds = data_dict["edge_orientations"]                 # (B, K, L, bins)

    rot = data_dict["scene_object_rotations"]              # (B, M, 3, 3)
    rot_mask = data_dict["scene_object_rotation_masks"].astype(jnp.float32)

    src_rot, tgt_rot = _edge_endpoint_gather(rot, assignment, nbr_idx)
    src_m, tgt_m = _edge_endpoint_gather(rot_mask, assignment, nbr_idx)

    rel = jnp.einsum("bklij,bklmj->bklim",
                     jnp.broadcast_to(src_rot, tgt_rot.shape), tgt_rot)
    trace = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    angle = jnp.arccos(jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0))  # (B,K,L)

    labels = radian_to_label(angle, num_bins)
    masks = jnp.broadcast_to(src_m, tgt_m.shape) * tgt_m * edge_mask

    ce = _ce_logits(preds, labels)
    loss = jnp.sum(ce * masks) / (jnp.sum(masks) + 1e-8)
    acc = (jnp.sum((jnp.argmax(preds, -1) == labels) * masks)
           / (jnp.sum(masks) + 1e-8))
    return loss, acc


def compute_node_distance_loss(data_dict: dict) -> jax.Array:
    """MSE of predicted vs GT center distance per edge (loss_helper.py:315-355).
    Mean over real edges (the reference's MSELoss averages the concatenated
    edge list)."""
    assignment = data_dict["object_assignment"].astype(jnp.int32)
    nbr_idx = data_dict["edge_nbr_idx"]
    edge_mask = data_dict["edge_mask"]
    preds = data_dict["edge_distances"]                    # (B, K, L)

    gt_center = data_dict["center_label"][:, :, 0:3]
    src_c, tgt_c = _edge_endpoint_gather(gt_center, assignment, nbr_idx)
    labels = jnp.linalg.norm(jnp.broadcast_to(src_c, tgt_c.shape) - tgt_c,
                             axis=-1)                      # (B, K, L)
    sq = (preds - labels) ** 2
    return jnp.sum(sq * edge_mask) / (jnp.sum(edge_mask) + 1e-8)

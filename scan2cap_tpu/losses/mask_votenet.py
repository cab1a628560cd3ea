"""MaskVoteNet losses — lib/loss_helper_maskvotenet.py.

Single-target variant: every labeled point votes to the target center, box
losses are mean-reduced over the single proposal (no objectness masking):
  loss = 10 * (vote + box + 0.1*sem_cls),
  box = center(sqrt chamfer mean) + 0.1*size_cls + size_reg.
Also the mIoU metric between the predicted single box and the GT box —
computed on device (the reference round-trips through numpy,
loss_helper_maskvotenet.py:191-212).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scan2cap_tpu.config import SCANNET_MEAN_SIZE_ARR
from scan2cap_tpu.losses.detection import compute_vote_loss, _ce_logits
from scan2cap_tpu.ops import nn_distance, huber_loss
from scan2cap_tpu.ops.boxes import get_3d_box_batch, box3d_iou_batch


def compute_mask_box_loss(data_dict: dict, num_size_cluster: int = 18):
    """loss_helper_maskvotenet.py:140-188 — mean-reduced center/size/sem."""
    pred_center = data_dict["center"]                       # (B, 1, 3)
    gt_center = data_dict["center_label"][:, :, 0:3]        # (B, 1, 3)
    dist1, _, _, _ = nn_distance(pred_center, gt_center)
    # +1e-8: the reference's bare sqrt (loss_helper_maskvotenet.py:155) has an
    # unbounded gradient at zero distance, which destabilizes training
    center_loss = jnp.mean(jnp.sqrt(dist1 + 1e-8))

    size_cls_label = data_dict["size_class_label"].astype(jnp.int32)  # (B, 1)
    size_cls_loss = jnp.mean(_ce_logits(data_dict["size_scores"], size_cls_label))

    size_onehot = jax.nn.one_hot(size_cls_label, num_size_cluster)
    pred_res = jnp.sum(
        data_dict["size_residuals_normalized"] * size_onehot[..., None], axis=2)
    mean_size = jnp.asarray(SCANNET_MEAN_SIZE_ARR)[size_cls_label]
    res_label_norm = data_dict["size_residual_label"] / mean_size
    size_reg_loss = jnp.mean(huber_loss(pred_res - res_label_norm, 1.0))

    sem_label = data_dict["sem_cls_label"].astype(jnp.int32)
    sem_cls_loss = jnp.mean(_ce_logits(data_dict["sem_cls_scores"], sem_label))
    sem_cls_acc = jnp.mean(
        (jnp.argmax(data_dict["sem_cls_scores"], -1) == sem_label)
        .astype(jnp.float32))
    return center_loss, size_cls_loss, size_reg_loss, sem_cls_loss, sem_cls_acc


def compute_miou(data_dict: dict) -> jax.Array:
    """Mean IoU of the decoded single proposal vs the GT box (device-side)."""
    pred_center = data_dict["center"][:, 0]
    size_cls = jnp.argmax(data_dict["size_scores"], -1)[:, 0]
    size_res = jnp.take_along_axis(
        data_dict["size_residuals"],
        jnp.argmax(data_dict["size_scores"], -1)[..., None, None], axis=2
    )[:, 0, 0]
    box_size = jnp.asarray(SCANNET_MEAN_SIZE_ARR)[size_cls] + size_res
    heading = jnp.zeros(pred_center.shape[:1], pred_center.dtype)
    pred_corners = get_3d_box_batch(box_size, heading, pred_center)
    gt_corners = data_dict["bbox_corner_label"]             # (B, 8, 3)
    return jnp.mean(box3d_iou_batch(pred_corners, gt_corners))


def get_mask_votenet_loss(data_dict: dict, num_size_cluster: int = 18) -> dict:
    d = dict(data_dict)
    zero = jnp.zeros((), jnp.float32)
    d["vote_loss"] = compute_vote_loss(d)
    (center_loss, size_cls_loss, size_reg_loss,
     sem_cls_loss, sem_cls_acc) = compute_mask_box_loss(d, num_size_cluster)
    box_loss = center_loss + 0.1 * size_cls_loss + size_reg_loss
    d["objectness_loss"] = zero
    d["center_loss"] = center_loss
    d["heading_cls_loss"] = zero
    d["heading_reg_loss"] = zero
    d["size_cls_loss"] = size_cls_loss
    d["size_reg_loss"] = size_reg_loss
    d["sem_cls_loss"] = sem_cls_loss
    d["box_loss"] = box_loss
    d["sem_cls_acc"] = sem_cls_acc
    if "bbox_corner_label" in d:
        d["miou"] = compute_miou(d)
    loss = d["vote_loss"] + 0.5 * d["objectness_loss"] + box_loss \
        + 0.1 * sem_cls_loss
    d["loss"] = loss * 10.0
    return d

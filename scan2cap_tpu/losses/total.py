"""Total loss assembly — lib/loss_helper.py:381-491.

loss = 10 * (vote + 0.5*objectness + box + 0.1*sem_cls) [+ cap]
       [+ 0.1*orientation] [+ 0.1*distance]
where box = center + 0.1*heading_cls + heading_reg + 0.1*size_cls + size_reg.
Without detection, loss = cap [+ 0.1*ori] [+ 0.1*dist].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scan2cap_tpu.losses.detection import (
    compute_vote_loss,
    compute_objectness_loss,
    compute_box_and_sem_cls_loss,
)
from scan2cap_tpu.losses.caption import (
    compute_cap_loss,
    compute_node_orientation_loss,
    compute_node_distance_loss,
)


def get_scene_cap_loss(
    data_dict: dict,
    detection: bool = True,
    caption: bool = True,
    orientation: bool = False,
    distance: bool = False,
    num_bins: int = 6,
    num_heading_bin: int = 1,
    num_size_cluster: int = 18,
) -> dict:
    d = dict(data_dict)
    zero = jnp.zeros((), jnp.float32)

    vote_loss = compute_vote_loss(d)
    (objectness_loss, objectness_label, objectness_mask,
     object_assignment) = compute_objectness_loss(d)
    d["objectness_label"] = objectness_label
    d["objectness_mask"] = objectness_mask
    d["object_assignment"] = object_assignment
    total = objectness_label.shape[0] * objectness_label.shape[1]
    d["pos_ratio"] = jnp.sum(objectness_label.astype(jnp.float32)) / total
    d["neg_ratio"] = (jnp.sum(objectness_mask) / total) - d["pos_ratio"]

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = compute_box_and_sem_cls_loss(
        d, num_heading_bin, num_size_cluster)
    box_loss = (center_loss + 0.1 * heading_cls_loss + heading_reg_loss
                + 0.1 * size_cls_loss + size_reg_loss)

    obj_pred = jnp.argmax(d["objectness_scores"], axis=2)
    d["obj_acc"] = (jnp.sum(
        (obj_pred == objectness_label).astype(jnp.float32) * objectness_mask)
        / (jnp.sum(objectness_mask) + 1e-6))

    if detection:
        d["vote_loss"] = vote_loss
        d["objectness_loss"] = objectness_loss
        d["center_loss"] = center_loss
        d["heading_cls_loss"] = heading_cls_loss
        d["heading_reg_loss"] = heading_reg_loss
        d["size_cls_loss"] = size_cls_loss
        d["size_reg_loss"] = size_reg_loss
        d["sem_cls_loss"] = sem_cls_loss
        d["box_loss"] = box_loss
    else:
        for k in ("vote_loss", "objectness_loss", "center_loss",
                  "heading_cls_loss", "heading_reg_loss", "size_cls_loss",
                  "size_reg_loss", "sem_cls_loss", "box_loss"):
            d[k] = zero

    if caption:
        cap_loss, cap_acc = compute_cap_loss(d)
        d["cap_loss"], d["cap_acc"] = cap_loss, cap_acc
    else:
        d["cap_loss"], d["cap_acc"] = zero, zero
        d["pred_ious"] = zero

    if orientation:
        ori_loss, ori_acc = compute_node_orientation_loss(d, num_bins)
        d["ori_loss"], d["ori_acc"] = ori_loss, ori_acc
    else:
        d["ori_loss"], d["ori_acc"] = zero, zero

    if distance:
        d["dist_loss"] = compute_node_distance_loss(d)
    else:
        d["dist_loss"] = zero

    if detection:
        loss = (d["vote_loss"] + 0.5 * d["objectness_loss"] + d["box_loss"]
                + 0.1 * d["sem_cls_loss"])
        loss = loss * 10.0  # amplify (loss_helper.py:469-470)
        if caption:
            loss = loss + d["cap_loss"]
        if orientation:
            loss = loss + 0.1 * d["ori_loss"]
        if distance:
            loss = loss + 0.1 * d["dist_loss"]
    else:
        loss = d["cap_loss"]
        if orientation:
            loss = loss + 0.1 * d["ori_loss"]
        if distance:
            loss = loss + 0.1 * d["dist_loss"]

    d["loss"] = loss
    return d


def compute_object_cls_loss(data_dict: dict, weights=None):
    """Object classification loss for the object-centric track
    (loss_helper.py:357-379)."""
    preds = data_dict["enc_preds"]                  # (B, num_cls)
    targets = data_dict["object_cat"].astype(jnp.int32)
    logp = jax.nn.log_softmax(preds, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    if weights is not None:
        w = jnp.asarray(weights)[targets]
        cls_loss = jnp.sum(ce * w) / jnp.sum(w)
    else:
        cls_loss = jnp.mean(ce)
    acc = jnp.mean((jnp.argmax(preds, -1) == targets).astype(jnp.float32))
    return cls_loss, acc


def get_object_cap_loss(data_dict: dict, weights=None, classify: bool = True,
                        caption: bool = True) -> dict:
    """Object-centric total loss (loss_helper.py:493-532):
    loss = cls + cap."""
    from scan2cap_tpu.losses.caption import compute_cap_loss

    d = dict(data_dict)
    zero = jnp.zeros((), jnp.float32)
    if classify:
        d["cls_loss"], d["cls_acc"] = compute_object_cls_loss(d, weights)
    else:
        d["cls_loss"], d["cls_acc"] = zero, zero
    if caption:
        d["cap_loss"], d["cap_acc"] = compute_cap_loss(d)
    else:
        d["cap_loss"], d["cap_acc"] = zero, zero
    d["loss"] = d["cls_loss"] + d["cap_loss"]
    return d

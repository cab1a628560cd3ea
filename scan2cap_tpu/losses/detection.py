"""Detection losses — lib/loss_helper.py:24-187 (VoteNet).

Constants (loss_helper.py:19-22): NEAR 0.3 m / FAR 0.6 m objectness
thresholds, CE class weights [0.2, 0.8], 3 identical GT votes per point.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from scan2cap_tpu.config import SCANNET_MEAN_SIZE_ARR
from scan2cap_tpu.ops import nn_distance, huber_loss

FAR_THRESHOLD = 0.6
NEAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def _ce_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-element cross entropy from raw logits (torch CrossEntropyLoss,
    reduction='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


def compute_vote_loss(data_dict: dict) -> jax.Array:
    """Min-of-min L1 chamfer between predicted votes and gathered GT votes
    (loss_helper.py:24-69)."""
    seed_xyz = data_dict["seed_xyz"]                  # (B, S, 3)
    B, S, _ = seed_xyz.shape
    vote_xyz = data_dict["vote_xyz"]                  # (B, S*vf, 3)
    seed_inds = data_dict["seed_inds"].astype(jnp.int32)

    # broadcast (not .repeat) the channel axis of the gather index: a
    # materialized per-element index hides the row structure from XLA, which
    # then transposes the whole (B, N, 9) vote_label table ({1,0,2} layout,
    # a ~94 ms async copy window per step at B16) to serve a 16k-row gather;
    # the size-1 index axis keeps it a plain row gather in the natural layout
    seed_gt_votes_mask = jnp.take_along_axis(
        data_dict["vote_label_mask"].astype(jnp.float32)[..., None],
        seed_inds[..., None], axis=1)[..., 0]
    seed_gt_votes = jnp.take_along_axis(
        data_dict["vote_label"], seed_inds[..., None], axis=1)
    seed_gt_votes = seed_gt_votes + jnp.tile(seed_xyz, (1, 1, GT_VOTE_FACTOR))

    vf = vote_xyz.shape[1] // S
    vote_r = vote_xyz.reshape(B * S, vf, 3)
    gt_r = seed_gt_votes.reshape(B * S, GT_VOTE_FACTOR, 3)
    _, _, dist2, _ = nn_distance(vote_r, gt_r, l1=True)
    votes_dist = jnp.min(dist2, axis=1).reshape(B, S)
    return (jnp.sum(votes_dist * seed_gt_votes_mask)
            / (jnp.sum(seed_gt_votes_mask) + 1e-6))


def compute_objectness_loss(
    data_dict: dict,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Proposal↔GT center assignment + weighted objectness CE
    (loss_helper.py:71-111).  Returns (loss, label, mask, assignment)."""
    agg_xyz = data_dict["aggregated_vote_xyz"]        # (B, K, 3)
    gt_center = data_dict["center_label"][:, :, 0:3]  # (B, K2, 3)
    dist1, ind1, _, _ = nn_distance(agg_xyz, gt_center)

    euclid = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = ((euclid < NEAR_THRESHOLD)
                       | (euclid > FAR_THRESHOLD)).astype(jnp.float32)

    scores = data_dict["objectness_scores"]           # (B, K, 2)
    w = jnp.asarray(OBJECTNESS_CLS_WEIGHTS)[objectness_label]
    ce = _ce_logits(scores, objectness_label) * w
    loss = jnp.sum(ce * objectness_mask) / (jnp.sum(objectness_mask) + 1e-6)
    return loss, objectness_label, objectness_mask, ind1


def compute_box_and_sem_cls_loss(data_dict: dict, num_heading_bin: int = 1,
                                 num_size_cluster: int = 18):
    """Center chamfer + heading/size cls+reg + sem cls, objectness-masked
    (loss_helper.py:113-187).  Returns the 6 loss terms."""
    assignment = data_dict["object_assignment"].astype(jnp.int32)  # (B, K)
    objness = data_dict["objectness_label"].astype(jnp.float32)
    denom_obj = jnp.sum(objness) + 1e-6

    # center: bidirectional chamfer
    pred_center = data_dict["center"]
    gt_center = data_dict["center_label"][:, :, 0:3]
    dist1, _, dist2, _ = nn_distance(pred_center, gt_center)
    box_label_mask = data_dict["box_label_mask"].astype(jnp.float32)
    center_loss = (jnp.sum(dist1 * objness) / denom_obj
                   + jnp.sum(dist2 * box_label_mask)
                   / (jnp.sum(box_label_mask) + 1e-6))

    # heading
    heading_cls_label = jnp.take_along_axis(
        data_dict["heading_class_label"].astype(jnp.int32), assignment, axis=1)
    heading_cls_loss = jnp.sum(
        _ce_logits(data_dict["heading_scores"], heading_cls_label) * objness
    ) / denom_obj
    heading_res_label = jnp.take_along_axis(
        data_dict["heading_residual_label"].astype(jnp.float32), assignment, axis=1)
    heading_res_norm_label = heading_res_label / (jnp.pi / num_heading_bin)
    heading_onehot = jax.nn.one_hot(heading_cls_label, num_heading_bin)
    pred_heading_res = jnp.sum(
        data_dict["heading_residuals_normalized"] * heading_onehot, axis=-1)
    heading_reg_loss = jnp.sum(
        huber_loss(pred_heading_res - heading_res_norm_label, 1.0) * objness
    ) / denom_obj

    # size
    size_cls_label = jnp.take_along_axis(
        data_dict["size_class_label"].astype(jnp.int32), assignment, axis=1)
    size_cls_loss = jnp.sum(
        _ce_logits(data_dict["size_scores"], size_cls_label) * objness
    ) / denom_obj
    # size-1 broadcast axis, NEVER idx.repeat(C): a materialized channel
    # axis makes XLA transpose the whole table (CLAUDE.md gather rule; the
    # vote-label gather above cost ~94 ms/step until converted)
    size_res_label = jnp.take_along_axis(
        data_dict["size_residual_label"],
        assignment[..., None], axis=1)                      # (B, K, 3)
    size_onehot = jax.nn.one_hot(size_cls_label, num_size_cluster)  # (B,K,NS)
    pred_size_res = jnp.sum(
        data_dict["size_residuals_normalized"] * size_onehot[..., None], axis=2)
    mean_sizes = jnp.asarray(SCANNET_MEAN_SIZE_ARR)
    mean_size_label = mean_sizes[size_cls_label]            # (B, K, 3)
    size_res_label_norm = size_res_label / mean_size_label
    size_reg = jnp.mean(
        huber_loss(pred_size_res - size_res_label_norm, 1.0), axis=-1)
    size_reg_loss = jnp.sum(size_reg * objness) / denom_obj

    # semantic class
    sem_cls_label = jnp.take_along_axis(
        data_dict["sem_cls_label"].astype(jnp.int32), assignment, axis=1)
    sem_cls_loss = jnp.sum(
        _ce_logits(data_dict["sem_cls_scores"], sem_cls_label) * objness
    ) / denom_obj

    return (center_loss, heading_cls_loss, heading_reg_loss,
            size_cls_loss, size_reg_loss, sem_cls_loss)

"""Proposal module (models/proposal_module.py:22-146).

Vote aggregation (SA over votes: 256 proposals, r=0.3, 16 samples,
mlp [256,128,128,128]) followed by the detection head:
2 objectness + 3 center + NH*2 heading + NS*4 size + num_class channels.

The reference's ``decode_pred_box`` leaves the device and loops over the
batch in numpy *inside the training step* (proposal_module.py:80-103);
here the obb decode and corner construction are fused into the same XLA
program — no host round trip.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scan2cap_tpu.models.backbone import PointnetSAModuleVotes
from scan2cap_tpu.models.layers import BatchNorm
from scan2cap_tpu.ops.boxes import get_3d_box_batch


class ProposalModule(nn.Module):
    num_class: int = 18
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    mean_size_arr: tuple = ()          # (num_size_cluster, 3) nested tuple
    num_proposal: int = 256
    seed_feat_dim: int = 256

    @nn.compact
    def __call__(self, xyz: jax.Array, features: jax.Array, data_dict: dict,
                 train: bool = True,
                 bn_momentum: jax.Array | float = 0.1) -> dict:
        d = dict(data_dict)

        # --- vote clustering (proposal_module.py:34-41) ---
        agg_xyz, agg_features, fps_inds = PointnetSAModuleVotes(
            self.num_proposal, 0.3, 16, (128, 128, 128),
            name="vote_aggregation")(xyz, features, None, train, bn_momentum)
        d["aggregated_vote_xyz"] = agg_xyz                 # (B, K, 3)
        d["aggregated_vote_features"] = agg_features       # (B, K, 128)
        d["aggregated_vote_inds"] = fps_inds

        # --- proposal head (proposal_module.py:46-54) ---
        net = nn.Dense(128, use_bias=False, name="conv1")(agg_features)
        net = nn.relu(BatchNorm(128, name="bn1")(net, train, bn_momentum))
        net = nn.Dense(128, use_bias=False, name="conv2")(net)
        net = nn.relu(BatchNorm(128, name="bn2")(net, train, bn_momentum))
        out_ch = 2 + 3 + self.num_heading_bin * 2 + self.num_size_cluster * 4 + self.num_class
        net = nn.Dense(out_ch, name="conv3")(net)          # (B, K, out_ch)

        return self.decode_scores(net, d)

    def decode_scores(self, net: jax.Array, d: dict) -> dict:
        """Channel slicing + on-device box decode (proposal_module.py:105-144)."""
        NH, NS = self.num_heading_bin, self.num_size_cluster
        B, K, _ = net.shape

        objectness_scores = net[..., 0:2]
        center = d["aggregated_vote_xyz"] + net[..., 2:5]
        heading_scores = net[..., 5:5 + NH]
        heading_residuals_normalized = net[..., 5 + NH:5 + NH * 2]
        size_scores = net[..., 5 + NH * 2:5 + NH * 2 + NS]
        size_residuals_normalized = net[
            ..., 5 + NH * 2 + NS:5 + NH * 2 + NS * 4].reshape(B, K, NS, 3)
        sem_cls_scores = net[..., 5 + NH * 2 + NS * 4:]

        mean_size = jnp.asarray(np.asarray(self.mean_size_arr, np.float32))  # (NS,3)

        d["objectness_scores"] = objectness_scores
        d["center"] = center
        d["heading_scores"] = heading_scores
        d["heading_residuals_normalized"] = heading_residuals_normalized
        d["heading_residuals"] = heading_residuals_normalized * (jnp.pi / NH)
        d["size_scores"] = size_scores
        d["size_residuals_normalized"] = size_residuals_normalized
        d["size_residuals"] = size_residuals_normalized * mean_size[None, None]

        d["sem_cls_scores"] = sem_cls_scores

        # --- on-device decode_pred_box (replaces the CPU/numpy loop at
        # proposal_module.py:80-103) ---
        pred_size_class = jnp.argmax(size_scores, axis=-1)           # (B,K)
        pred_size_residual = jnp.take_along_axis(
            d["size_residuals"], pred_size_class[..., None, None], axis=2
        )[:, :, 0, :]                                                # (B,K,3)
        box_size = mean_size[pred_size_class] + pred_size_residual
        # ScanNet: heading is always 0 (class2angle, model_util_scannet.py:130-140)
        heading = jnp.zeros((B, K), dtype=center.dtype)
        d["bbox_corner"] = get_3d_box_batch(box_size, heading, center)  # (B,K,8,3)
        d["bbox_feature"] = d["aggregated_vote_features"]
        d["bbox_mask"] = jnp.argmax(objectness_scores, axis=-1)      # (B,K) 0/1
        d["bbox_sems"] = jnp.argmax(sem_cls_scores, axis=-1)
        d["sem_cls"] = d["bbox_sems"]
        return d

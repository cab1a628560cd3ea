"""MaskVoteNet — single-proposal feature extractor (models/mask_votenet.py).

Same PointNet++ backbone + voting as CapNet, but the proposal module
aggregates votes into ONE proposal with a huge ball (radius 5 m, 512 samples,
mask_votenet.py:145-153) and its head predicts only center offset, size
cls+residual, and semantic class (no objectness/heading,
mask_votenet.py:157-166).  The input carries an extra binary target-mask
channel (lib/dataset_maskvotenet.py:476-478), so this network learns to
describe exactly the masked object — used to extract per-GT-box features
(scripts/extract_gt_features.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from scan2cap_tpu.config import ModelConfig, SCANNET_MEAN_SIZE_ARR
from scan2cap_tpu.models.backbone import Pointnet2Backbone, PointnetSAModuleVotes
from scan2cap_tpu.models.layers import BatchNorm
from scan2cap_tpu.models.voting import VotingModule


class MaskProposalModule(nn.Module):
    num_class: int = 18
    num_size_cluster: int = 18
    num_proposal: int = 1

    @nn.compact
    def __call__(self, xyz, features, data_dict, train=True, bn_momentum=0.1):
        d = dict(data_dict)
        agg_xyz, agg_features, fps_inds = PointnetSAModuleVotes(
            self.num_proposal, 5.0, 512, (128, 128, 128),
            name="vote_aggregation")(xyz, features, None, train, bn_momentum)
        d["aggregated_vote_xyz"] = agg_xyz
        d["aggregated_vote_features"] = agg_features
        d["aggregated_vote_inds"] = fps_inds

        net = nn.Dense(128, use_bias=False, name="conv1")(agg_features)
        net = nn.relu(BatchNorm(128, name="bn1")(net, train, bn_momentum))
        net = nn.Dense(128, use_bias=False, name="conv2")(net)
        net = nn.relu(BatchNorm(128, name="bn2")(net, train, bn_momentum))
        out_ch = 3 + self.num_size_cluster * 4 + self.num_class
        net = nn.Dense(out_ch, name="conv3")(net)

        NS = self.num_size_cluster
        B, K, _ = net.shape
        d["center"] = agg_xyz + net[..., 0:3]
        d["size_scores"] = net[..., 3:3 + NS]
        size_res_norm = net[..., 3 + NS:3 + NS * 4].reshape(B, K, NS, 3)
        d["size_residuals_normalized"] = size_res_norm
        mean_size = jnp.asarray(SCANNET_MEAN_SIZE_ARR)
        d["size_residuals"] = size_res_norm * mean_size[None, None]
        d["sem_cls_scores"] = net[..., 3 + NS * 4:]
        return d


class MaskVoteNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, data_dict: dict, train: bool = True,
                 bn_momentum: jax.Array | float = 0.1) -> dict:
        cfg = self.cfg
        # +1 input channel: the binary target mask
        d = Pointnet2Backbone(cfg.input_feature_dim + 1, cfg.sa_npoints,
                              name="backbone_net")(data_dict, train, bn_momentum)
        d["seed_inds"] = d["fp2_inds"]
        d["seed_xyz"] = d["fp2_xyz"]
        d["seed_features"] = d["fp2_features"]

        vote_xyz, vote_features = VotingModule(cfg.vote_factor, 256, name="vgen")(
            d["fp2_xyz"], d["fp2_features"], train, bn_momentum)
        norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
        vote_features = vote_features / norm
        d["vote_xyz"] = vote_xyz
        d["vote_features"] = vote_features

        d = MaskProposalModule(
            cfg.num_class, cfg.num_size_cluster, cfg.num_proposals,
            name="proposal")(vote_xyz, vote_features, d, train, bn_momentum)
        return d

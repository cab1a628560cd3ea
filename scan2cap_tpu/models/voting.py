"""Hough voting module (models/voting_module.py:12-60).

Per-seed MLP (two Dense+BN+ReLU at seed width, then a Dense to
(3 + C) * vote_factor) producing an xyz offset and a feature residual per
vote.  Channels-last: conv1d == Dense on the trailing axis.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from scan2cap_tpu.models.layers import BatchNorm


class VotingModule(nn.Module):
    vote_factor: int = 1
    seed_feature_dim: int = 256

    @nn.compact
    def __call__(self, seed_xyz: jax.Array, seed_features: jax.Array,
                 train: bool = True,
                 bn_momentum: jax.Array | float = 0.1):
        """seed_xyz (B, S, 3), seed_features (B, S, C) ->
        vote_xyz (B, S*vf, 3), vote_features (B, S*vf, C)."""
        B, S, _ = seed_xyz.shape
        C = self.seed_feature_dim
        net = nn.Dense(C, name="conv1")(seed_features)
        net = nn.relu(BatchNorm(C, name="bn1")(net, train, bn_momentum))
        net = nn.Dense(C, name="conv2")(net)
        net = nn.relu(BatchNorm(C, name="bn2")(net, train, bn_momentum))
        net = nn.Dense((3 + C) * self.vote_factor, name="conv3")(net)

        net = net.reshape(B, S, self.vote_factor, 3 + C)
        offset = net[..., 0:3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(B, S * self.vote_factor, 3)
        residual = net[..., 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(
            B, S * self.vote_factor, C)
        return vote_xyz, vote_features

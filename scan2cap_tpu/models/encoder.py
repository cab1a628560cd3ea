"""PointNet++ object encoder (models/encoder_module.py).

SA1-4 → global max-pool → 128-d mapped feature + num_classes classifier.
Used by the object-centric experiments; ``whole_scene`` mode encodes every
valid object crop of a scene (the reference chunks a python loop over valid
objects, encoder_module.py:111-163 — here the object axis folds into the
batch and invalid crops are masked).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from scan2cap_tpu.models.backbone import PointnetSAModuleVotes


class PointnetEncoder(nn.Module):
    input_feature_dim: int = 0
    num_classes: int = 18
    whole_scene: bool = False
    sa_npoints: tuple = (2048, 1024, 512, 256)

    @nn.compact
    def __call__(self, data_dict: dict, train: bool = True,
                 bn_momentum: jax.Array | float = 0.1) -> dict:
        d = dict(data_dict)
        pc = d["point_clouds"]

        def encode(pc_flat):
            xyz = pc_flat[..., :3]
            features = pc_flat[..., 3:] if pc_flat.shape[-1] > 3 else None
            np1, np2, np3, np4 = self.sa_npoints
            # encoder inputs are raw object crops (autodiff leaves) —
            # scatter-free backward applies exactly as in the backbone
            xyz, features, _ = PointnetSAModuleVotes(
                np1, 0.2, 64, (64, 64, 128), leaf_inputs=True, name="sa1")(
                    xyz, features, None, train, bn_momentum)
            xyz, features, _ = PointnetSAModuleVotes(
                np2, 0.4, 32, (128, 128, 256), name="sa2")(
                    xyz, features, None, train, bn_momentum)
            xyz, features, _ = PointnetSAModuleVotes(
                np3, 0.8, 16, (128, 128, 256), name="sa3")(
                    xyz, features, None, train, bn_momentum)
            xyz, features, _ = PointnetSAModuleVotes(
                np4, 1.2, 16, (128, 128, 256), name="sa4")(
                    xyz, features, None, train, bn_momentum)
            pooled = jnp.max(features, axis=1)           # (B*, 256)
            feat = nn.relu(nn.Dense(128, name="map")(pooled))
            preds = nn.Dense(self.num_classes, name="classifier")(feat)
            return feat, preds

        if self.whole_scene:
            if train:
                # eval/extraction-only mode (the reference pairs it with
                # is_eval dataset filtering and chunks over VALID crops
                # only, encoder_module.py:111-163): train-mode BatchNorm
                # here would fold the zero-padded invalid crops into the
                # batch statistics — fail loudly instead of silently
                # training on polluted stats
                raise ValueError(
                    "PointnetEncoder(whole_scene=True) is eval/extraction-"
                    "only: train with per-object crops (whole_scene=False) "
                    "and reuse the weights for whole-scene encoding")
            B, M, N, C = pc.shape
            feat, preds = encode(pc.reshape(B * M, N, C))
            mask = d["target_masks"][..., None].astype(feat.dtype)
            d["enc_features"] = feat.reshape(B, M, 128) * mask
            d["enc_preds"] = preds.reshape(B, M, self.num_classes) * mask
        else:
            feat, preds = encode(pc)
            d["enc_features"] = feat
            d["enc_preds"] = preds
        return d

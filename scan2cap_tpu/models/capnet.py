"""CapNet — full detect-then-describe pipeline (models/capnet.py:16-123).

backbone → voting (+ L2 feature norm, capnet.py:96-98) → proposal →
[graph] → [caption].  One Flax module; the whole forward compiles to a
single XLA program with static shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scan2cap_tpu.config import ModelConfig, SCANNET_MEAN_SIZE_ARR
from scan2cap_tpu.models.backbone import Pointnet2Backbone
from scan2cap_tpu.models.voting import VotingModule
from scan2cap_tpu.models.proposal import ProposalModule
from scan2cap_tpu.models.graph import GraphModule
from scan2cap_tpu.models.caption import (
    SceneCaptionModule,
    TopDownSceneCaptionModule,
)


class CapNet(nn.Module):
    cfg: ModelConfig
    num_vocabs: int = 4
    use_oracle: bool = False
    # TP-friendly classifier width (0 = unpadded).  Set to
    # parallel.padded_vocab(num_vocabs, n_model) when training over a mesh
    # with a "model" axis: a divisible vocab lets XLA vocab-shard the caption
    # classifier instead of hidden-sharding it with batch-linear psums
    # (measured −42% collective bytes/scene, TPU_DESIGN §12).  Pad columns
    # are inert (caption._mask_pad_logits); the only delta vs unpadded is
    # f32 reassociation of the widened classifier gemm (last-ulp).
    num_vocabs_padded: int = 0

    @nn.compact
    def __call__(self, data_dict: dict, use_tf: bool = True,
                 is_eval: bool = False, train: bool = True,
                 bn_momentum: jax.Array | float = 0.1) -> dict:
        cfg = self.cfg

        # --------- detection branch ---------
        compute_dtype = (None if cfg.compute_dtype == "float32"
                         else cfg.compute_dtype)
        storage_dtype = (None if getattr(cfg, "storage_dtype", "float32")
                         == "float32" else cfg.storage_dtype)
        d = Pointnet2Backbone(cfg.input_feature_dim, cfg.sa_npoints,
                              compute_dtype,
                              storage_dtype=storage_dtype,
                              bf16_components=cfg.bf16_components,
                              spatial_axis=getattr(cfg, "spatial_axis", ""),
                              name="backbone_net")(
            data_dict, train, bn_momentum)

        d["seed_inds"] = d["fp2_inds"]
        d["seed_xyz"] = d["fp2_xyz"]
        d["seed_features"] = d["fp2_features"]

        vote_xyz, vote_features = VotingModule(
            cfg.vote_factor, 256, name="vgen")(
                d["fp2_xyz"], d["fp2_features"], train, bn_momentum)
        # L2-normalize vote features (capnet.py:97-98)
        norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
        vote_features = vote_features / norm
        d["vote_xyz"] = vote_xyz
        d["vote_features"] = vote_features

        d = ProposalModule(
            num_class=cfg.num_class,
            num_heading_bin=cfg.num_heading_bin,
            num_size_cluster=cfg.num_size_cluster,
            mean_size_arr=tuple(map(tuple, SCANNET_MEAN_SIZE_ARR.tolist())),
            num_proposal=cfg.num_proposals,
            name="proposal")(vote_xyz, vote_features, d, train, bn_momentum)

        # --------- graph enhancement ---------
        if cfg.num_graph_steps > 0:
            d = GraphModule(
                in_size=128, out_size=128,
                num_layers=cfg.num_graph_steps,
                num_proposals=cfg.num_proposals,
                feat_size=128,
                num_locals=cfg.num_locals,
                query_mode=cfg.query_mode,
                graph_mode=cfg.graph_mode,
                return_edge=cfg.use_relation,
                graph_aggr=cfg.graph_aggr,
                return_orientation=cfg.use_orientation,
                num_bins=cfg.num_bins,
                return_distance=cfg.use_distance,
                name="graph")(d, train)

        # --------- caption branch ---------
        if not cfg.no_caption:
            if cfg.use_topdown:
                d = TopDownSceneCaptionModule(
                    num_vocabs=self.num_vocabs,
                    num_vocabs_padded=self.num_vocabs_padded,
                    emb_size=cfg.emb_size,
                    feat_size=128,
                    hidden_size=cfg.hidden_size,
                    num_proposals=cfg.num_proposals,
                    num_locals=cfg.num_locals,
                    query_mode=cfg.query_mode,
                    use_relation=cfg.use_relation,
                    use_oracle=self.use_oracle,
                    max_des_len=cfg.max_des_len,
                    min_iou=cfg.min_iou,
                    name="caption")(d, use_tf, is_eval)
            else:
                d = SceneCaptionModule(
                    num_vocabs=self.num_vocabs,
                    num_vocabs_padded=self.num_vocabs_padded,
                    emb_size=cfg.emb_size,
                    feat_size=128,
                    hidden_size=cfg.hidden_size,
                    num_proposals=cfg.num_proposals,
                    max_des_len=cfg.max_des_len,
                    min_iou=cfg.min_iou,
                    name="caption")(d, use_tf, is_eval)

        return d

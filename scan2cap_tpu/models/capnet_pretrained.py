"""Caption-only CapNet over precomputed box features
(models/capnet_pretrained.py).

Graph + caption modules on top of stored proposal features: "gt" mode uses
128 GT boxes with oracle target selection via ``bbox_idx``; "votenet" mode
uses 256 stored VoteNet proposals with IoU-gated target selection
(capnet_pretrained.py:17,31).  This is the CPU-runnable caption slice.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from scan2cap_tpu.config import ModelConfig
from scan2cap_tpu.models.graph import GraphModule
from scan2cap_tpu.models.caption import (
    SceneCaptionModule, TopDownSceneCaptionModule)


class CapNetPretrained(nn.Module):
    cfg: ModelConfig
    mode: str = "gt"            # "gt" | "votenet"
    num_vocabs: int = 4
    # TP-friendly classifier width (0 = unpadded); see models/capnet.py
    num_vocabs_padded: int = 0

    @property
    def num_proposals(self) -> int:
        return 128 if self.mode == "gt" else 256

    @nn.compact
    def __call__(self, data_dict: dict, use_tf: bool = True,
                 is_eval: bool = False, train: bool = True) -> dict:
        cfg = self.cfg
        d = dict(data_dict)
        if cfg.num_graph_steps > 0:
            d = GraphModule(
                in_size=128, out_size=128,
                num_layers=cfg.num_graph_steps,
                num_proposals=self.num_proposals,
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

        if cfg.use_topdown:
            d = TopDownSceneCaptionModule(
                num_vocabs=self.num_vocabs,
                num_vocabs_padded=self.num_vocabs_padded,
                emb_size=cfg.emb_size, feat_size=128,
                hidden_size=cfg.hidden_size,
                num_proposals=self.num_proposals,
                num_locals=cfg.num_locals,
                query_mode=cfg.query_mode,
                use_relation=cfg.use_relation,
                use_oracle=(self.mode == "gt"),
                max_des_len=cfg.max_des_len,
                min_iou=cfg.min_iou,
                name="caption")(d, use_tf, is_eval)
        else:
            d = SceneCaptionModule(
                num_vocabs=self.num_vocabs,
                num_vocabs_padded=self.num_vocabs_padded,
                emb_size=cfg.emb_size, feat_size=128,
                hidden_size=cfg.hidden_size,
                num_proposals=self.num_proposals,
                max_des_len=cfg.max_des_len,
                min_iou=cfg.min_iou,
                name="caption")(d, use_tf, is_eval)
        return d

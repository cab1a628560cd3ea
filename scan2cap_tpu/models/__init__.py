"""Flax model stack: PointNet++ backbone → voting → proposals → relational
graph → caption decoders, assembled in CapNet (mirrors /root/reference/models)."""

from scan2cap_tpu.models.backbone import Pointnet2Backbone
from scan2cap_tpu.models.voting import VotingModule
from scan2cap_tpu.models.proposal import ProposalModule
from scan2cap_tpu.models.graph import GraphModule
from scan2cap_tpu.models.caption import (
    SceneCaptionModule,
    TopDownSceneCaptionModule,
    select_target,
)
from scan2cap_tpu.models.capnet import CapNet

__all__ = [
    "Pointnet2Backbone", "VotingModule", "ProposalModule", "GraphModule",
    "SceneCaptionModule", "TopDownSceneCaptionModule", "select_target", "CapNet",
]

"""Loss functions — ports of lib/loss_helper.py with identical weights,
thresholds, and normalizations, vectorized for XLA."""

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
from scan2cap_tpu.losses.total import get_scene_cap_loss

__all__ = [
    "compute_vote_loss", "compute_objectness_loss",
    "compute_box_and_sem_cls_loss", "compute_cap_loss",
    "compute_node_orientation_loss", "compute_node_distance_loss",
    "get_scene_cap_loss",
]

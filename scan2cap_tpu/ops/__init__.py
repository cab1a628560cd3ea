"""TPU-native point-cloud ops (XLA + Pallas).

These replace the reference's CUDA extension ``pointnet2._ext``
(lib/pointnet2/_ext_src) with pure-JAX implementations plus Pallas kernels
for the hot paths.  All ops are batched, static-shape, channels-last.
"""

from scan2cap_tpu.ops.sampling import furthest_point_sample, gather_points
from scan2cap_tpu.ops.grouping import (ball_query, group_all,
                                        group_points, query_and_group)
from scan2cap_tpu.ops.interpolate import three_nn, three_interpolate
from scan2cap_tpu.ops.nn_distance import nn_distance, huber_loss
from scan2cap_tpu.ops.boxes import (
    get_3d_box_batch,
    box3d_iou_batch,
    param2obb_batch_jnp,
)

__all__ = [
    "furthest_point_sample", "gather_points", "ball_query", "group_points",
    "query_and_group", "group_all", "three_nn", "three_interpolate", "nn_distance",
    "huber_loss", "get_3d_box_batch", "box3d_iou_batch", "param2obb_batch_jnp",
]

"""Configuration tree for scan2cap_tpu.

Replaces the reference's two-tier config (global ``CONF`` EasyDict in
``lib/config.py`` + per-entry-point argparse) with a single frozen dataclass
tree.  All *shape* constants are static here so every model/program compiles
to a fixed-shape XLA executable.

Constant parity (reference file:line):
  * MAX_DES_LEN=30, NUM_BINS=6, TRAIN.MIN_IOU_THRESHOLD=0.25,
    EVAL.MIN_IOU_THRESHOLD=0.5, OVERLAID_THRESHOLD=0.5  — lib/config.py:62-71
  * MAX_NUM_OBJ=128 — lib/dataset.py:28 ; 40k points / 256 proposals —
    scripts/train.py:320-321
  * 18 classes, 1 heading bin, mean size array — data/scannet/model_util_scannet.py:83-99
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# ScanNet dataset constants (data/scannet/model_util_scannet.py:83-99)
# ---------------------------------------------------------------------------

SCANNET_TYPE2CLASS = {
    "cabinet": 0, "bed": 1, "chair": 2, "sofa": 3, "table": 4, "door": 5,
    "window": 6, "bookshelf": 7, "picture": 8, "counter": 9, "desk": 10,
    "curtain": 11, "refrigerator": 12, "shower curtain": 13, "toilet": 14,
    "sink": 15, "bathtub": 16, "others": 17,
}
SCANNET_CLASS2TYPE = {v: k for k, v in SCANNET_TYPE2CLASS.items()}

# nyu40 ids kept for detection — excludes wall(1), floor(2), ceiling(22)
SCANNET_NYU40IDS = np.array(
    [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 23,
     24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40],
    dtype=np.int64,
)

# Per-class mean box sizes (meters), from the reference's
# meta_data/scannet_reference_means.npz (data values, 18 x 3).
SCANNET_MEAN_SIZE_ARR = np.array([
    [0.77504910, 0.94897728, 0.96542059],   # cabinet
    [1.86903267, 1.83214712, 1.19222992],   # bed
    [0.61214778, 0.61928731, 0.70480848],   # chair
    [1.44113898, 1.60452036, 0.83652295],   # sofa
    [1.04780726, 1.20164188, 0.63457007],   # table
    [0.56101232, 0.60847217, 1.71950401],   # door
    [1.07894895, 0.82033996, 1.16921199],   # window
    [0.84171092, 1.35047945, 1.68989250],   # bookshelf
    [0.23051737, 0.47640499, 0.56569256],   # picture
    [1.45484899, 1.97119895, 0.28643280],   # counter
    [1.07858031, 1.53705113, 0.86501906],   # desk
    [1.43119644, 0.76923111, 1.64982673],   # curtain
    [0.62969194, 0.70871287, 1.31433587],   # refrigerator
    [0.43925034, 0.41569594, 1.70002748],   # shower curtain
    [0.58504462, 0.57878438, 0.72029611],   # toilet
    [0.51158693, 0.50960673, 0.31287360],   # sink
    [1.17320759, 1.05987140, 0.51812528],   # bathtub
    [0.43294385, 0.51933507, 0.48437456],   # others
], dtype=np.float32)

MEAN_COLOR_RGB = np.array([109.8, 97.2, 83.8], dtype=np.float32)  # lib/dataset.py:29


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """Mirror of the reference ScannetDatasetConfig (static parts)."""

    num_class: int = 18
    num_heading_bin: int = 1       # ScanNet boxes are axis-aligned
    num_size_cluster: int = 18

    @property
    def mean_size_arr(self) -> np.ndarray:
        return SCANNET_MEAN_SIZE_ARR

    def class2angle_batch(self, pred_cls, residual):
        # ScanNet boxes are axis-aligned → heading is always 0
        # (model_util_scannet.py:136-140)
        return np.zeros(np.asarray(pred_cls).shape, dtype=np.float32)

    def class2size_batch(self, pred_cls, residual):
        return SCANNET_MEAN_SIZE_ARR[np.asarray(pred_cls)] + residual

    def param2obb_batch(self, center, heading_class, heading_residual,
                        size_class, size_residual):
        """(...,3),(...,),(...,),(...,),(...,3) -> (...,7) obb; heading negated
        as in model_util_scannet.py:156-172."""
        heading = self.class2angle_batch(heading_class, heading_residual)
        size = self.class2size_batch(size_class, size_residual)
        return np.concatenate(
            [center, size, (-heading)[..., None]], axis=-1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static shape + architecture constants of the CapNet pipeline."""

    num_points: int = 40000          # scripts/train.py:320
    num_proposals: int = 256         # scripts/train.py:321
    # SA-layer point counts (backbone_module.py:28-62); shrink for tests
    sa_npoints: Tuple[int, int, int, int] = (2048, 1024, 512, 256)
    max_num_obj: int = 128           # lib/dataset.py:28
    max_des_len: int = 30            # lib/config.py:63 (tokens excl. sos/eos)
    num_bins: int = 6                # lib/config.py:67 (edge orientation bins)
    vote_factor: int = 1
    num_class: int = 18
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    emb_size: int = 300              # GloVe dim
    feat_size: int = 128             # proposal feature dim
    hidden_size: int = 512           # caption decoder hidden
    num_locals: int = 10             # README.md:145 canonical config
    num_graph_steps: int = 0
    query_mode: str = "center"       # scripts/train.py:329 default
    graph_mode: str = "edge_conv"    # scripts/train.py:327
    graph_aggr: str = "add"
    use_relation: bool = False
    use_orientation: bool = False
    use_distance: bool = False
    use_topdown: bool = False
    # input features
    use_color: bool = False
    use_normal: bool = False
    use_multiview: bool = False
    use_height: bool = True          # lib/dataset.py "not no_height"
    no_caption: bool = False
    min_iou: float = 0.25            # CONF.TRAIN.MIN_IOU_THRESHOLD (caption gate)
    # numerics
    compute_dtype: str = "float32"   # bfloat16 for speed on TPU
    # storage-only narrowing: layer-boundary activation buffers in the
    # backbone MLPs are stored at this width while ALL matmul/BN compute
    # stays float32 (the quality-safe half of the bf16 lever; ignored for
    # modules already narrowed by compute_dtype)
    storage_dtype: str = "float32"
    # which backbone modules the narrow dtype applies to (bisection knob
    # for the bf16 quality study, TPU_DESIGN §8; ignored at float32)
    bf16_components: str = "sa1,sa2,sa3,sa4,fp"
    # point-axis (spatial) sharding: name of a mesh axis to split the SA
    # layers' query-center axis over (SURVEY §5.7; parallel/spatial.py
    # shard_map wrappers resolve the AMBIENT jax.set_mesh mesh).  Scales
    # scene size past one chip's FLOPs/HBM; "" = off.  Every sa_npoints
    # entry must divide by the axis size.
    spatial_axis: str = ""

    @property
    def input_feature_dim(self) -> int:
        d = int(self.use_height)
        d += 3 * int(self.use_color)
        d += 3 * int(self.use_normal)
        d += 128 * int(self.use_multiview)
        return d

    @property
    def num_des_steps(self) -> int:
        # tokens produced per caption: sos + 30 words + eos = 32 slots,
        # decoder runs max_des_len+1 steps off the sos token.
        return self.max_des_len + 2


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """lib/solver.py / scripts/train.py defaults."""

    batch_size: int = 16             # slurm/train.job:24
    lr: float = 1e-3                 # scripts/train.py:316
    wd: float = 1e-5                 # scripts/train.py:317
    seed: int = 42                   # lib/config.py:64
    epochs: int = 50
    val_step: int = 2000             # scripts/train.py:315
    criterion: str = "cider"
    # detection-only schedules (scripts/train.py:152-156)
    lr_decay_steps: Tuple[int, ...] = (80, 120, 160)
    lr_decay_rate: float = 0.1
    bn_momentum_init: float = 0.5
    bn_momentum_max: float = 0.001
    bn_decay_step: int = 20
    bn_decay_rate: float = 0.5
    min_iou_threshold: float = 0.25  # lib/config.py:66 (train-time caption gate)
    overlaid_threshold: float = 0.5  # lib/config.py:65


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    min_iou_threshold: float = 0.5   # lib/config.py:71
    nms_iou: float = 0.25            # lib/eval_helper.py POST_DICT
    conf_thresh: float = 0.05
    use_3d_nms: bool = True
    cls_nms: bool = True
    per_class_proposal: bool = True
    remove_empty_box: bool = False


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """All paths overridable via environment, defaulting under ./data."""

    base: str = dataclasses.field(
        default_factory=lambda: os.environ.get("SCAN2CAP_BASE", os.getcwd()))

    @property
    def data(self) -> str:
        return os.environ.get("SCAN2CAP_DATA", os.path.join(self.base, "data"))

    @property
    def scannet_data(self) -> str:
        return os.path.join(self.data, "scannet", "scannet_data")

    @property
    def scannet_meta(self) -> str:
        return os.path.join(self.data, "scannet", "meta_data")

    @property
    def multiview(self) -> str:
        return os.path.join(self.scannet_data, "enet_feats_maxpool.hdf5")

    @property
    def glove(self) -> str:
        return os.path.join(self.data, "glove.p")

    @property
    def output(self) -> str:
        return os.environ.get("SCAN2CAP_OUTPUT", os.path.join(self.base, "outputs"))


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    paths: PathConfig = dataclasses.field(default_factory=PathConfig)
    dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DC = DatasetConfig()

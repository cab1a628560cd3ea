"""Scan2Cap-2D — the standalone 2D-baseline sub-project
(/root/reference/Scan2Cap-2D), rebuilt on the shared TPU stack.

2D captioning baselines over rendered-viewpoint image features:
  * ShowAndTell2D — GRU decoder seeded by global(+target) features (snt.py);
  * ShowAttendAndTell2D — top-down attention over per-image context boxes
    (tdbu.py);
  * Retrieval2D — cosine nearest-neighbor caption transfer (retr.py).
Experiment axes (lib/conf.py): viewpoint {annotated, estimated, bev} ×
box source {oracle, mrcnn, votenet} × input features {G, T, C and combos}.
"""

from scan2cap_tpu.twod.models import (
    ShowAndTell2D, ShowAttendAndTell2D, Retrieval2D)
from scan2cap_tpu.twod.conf import TwoDConfig, get_config

__all__ = ["ShowAndTell2D", "ShowAttendAndTell2D", "Retrieval2D",
           "TwoDConfig", "get_config"]

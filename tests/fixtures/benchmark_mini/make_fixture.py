"""Generator for the checked-in benchmark mini-fixture (run once; outputs
are committed).  Hand-designed 2-scene dataset in the reference's file
formats — pred.json (benchmark/predict.py:207-233) and the
build_benchmark_gt.py GT bbox list — with analytically-known IoUs so the
pinned metric values in tests/test_benchmark_fixture.py are interpretable:

scene0000_00:
  GT chair  (id 3) box [0,0,0]..[1,1,1];   pred A: identical box (IoU 1.0),
    caption == GT caption.
  GT table  (id 7) box [2,0,0]..[3,2,1];   pred B: [2,0,0]..[3,1,1]
    (IoU 0.5), caption shares some tokens.
  pred C: [8,8,8]..[9,9,9] — matches nothing (IoU 0), nonsense caption.
scene0001_00:
  GT sofa (id 2) box [0,0,0]..[2,1,1];     pred D: [0.5,0,0]..[2.5,1,1]
    (IoU 1.5/2.5 = 0.6), caption partially matching.
"""

import json
import os

import numpy as np


def corners(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    c = []
    for sx in (0, 1):
        for sy in (0, 1):
            for sz in (0, 1):
                c.append([lo[0] if sx == 0 else hi[0],
                          lo[1] if sy == 0 else hi[1],
                          lo[2] if sz == 0 else hi[2]])
    return c


def sem_onehot(cls, n=18, lo=0.01):
    p = np.full(n, lo)
    p[cls] = 1.0 - lo * (n - 1)
    return p.tolist()


HERE = os.path.dirname(os.path.abspath(__file__))

GT = [
    {"scene_id": "scene0000_00", "object_id": "3", "object_name": "chair",
     "ann_id": "0", "token": ["a", "brown", "chair", "next", "to", "the",
                              "table"],
     "bbox": corners([0, 0, 0], [1, 1, 1])},
    {"scene_id": "scene0000_00", "object_id": "3", "object_name": "chair",
     "ann_id": "1", "token": ["the", "chair", "is", "near", "the", "table"],
     "bbox": corners([0, 0, 0], [1, 1, 1])},
    {"scene_id": "scene0000_00", "object_id": "7", "object_name": "table",
     "ann_id": "0", "token": ["a", "white", "table", "in", "the", "center",
                              "of", "the", "room"],
     "bbox": corners([2, 0, 0], [3, 2, 1])},
    {"scene_id": "scene0001_00", "object_id": "2", "object_name": "sofa",
     "ann_id": "0", "token": ["a", "long", "sofa", "against", "the", "wall"],
     "bbox": corners([0, 0, 0], [2, 1, 1])},
]

# class ids from SCANNET_TYPE2CLASS: chair=2, table=3, sofa=1
PRED = {
    "scene0000_00": [
        {"caption": "sos a brown chair next to the table eos",
         "box": corners([0, 0, 0], [1, 1, 1]),
         "sem_prob": sem_onehot(2), "obj_prob": [0.05, 0.95]},
        {"caption": "sos a wooden table with chairs eos",
         "box": corners([2, 0, 0], [3, 1, 1]),
         "sem_prob": sem_onehot(3), "obj_prob": [0.2, 0.8]},
        {"caption": "sos blue monitor on the desk eos",
         "box": corners([8, 8, 8], [9, 9, 9]),
         "sem_prob": sem_onehot(9), "obj_prob": [0.4, 0.6]},
    ],
    "scene0001_00": [
        {"caption": "sos a sofa next to the wall eos",
         "box": corners([0.5, 0, 0], [2.5, 1, 1]),
         "sem_prob": sem_onehot(1), "obj_prob": [0.1, 0.9]},
    ],
}


if __name__ == "__main__":
    with open(os.path.join(HERE, "gt_bbox.json"), "w") as f:
        json.dump(GT, f, indent=1)
    with open(os.path.join(HERE, "pred.json"), "w") as f:
        json.dump(PRED, f, indent=1)
    print("fixture written")

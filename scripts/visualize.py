"""Visualization CLI — rebuild of scripts/visualize.py.

Dumps per-scene PLYs: the colored scene cloud, predicted boxes (NMS'd,
objectness-filtered) and GT boxes as wireframe PLYs, plus a captions JSON —
viewable in MeshLab/CloudCompare (no trimesh dependency; own PLY writers).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, required=True)
    p.add_argument("--scene_id", type=str, required=True)
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args()


def visualize(args):
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, PathConfig, MEAN_COLOR_RGB
    from scan2cap_tpu.data.dataset import (
        ScannetReferenceDataset, get_scanrefer)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state, make_eval_step
    from scan2cap_tpu.train.checkpoints import CheckpointIO
    from scan2cap_tpu.eval.eval_helper import decode_caption
    from scan2cap_tpu.ops.nms import nms_3d
    from scan2cap_tpu.utils.ply import write_ply
    from scan2cap_tpu.utils.pc_utils import write_bbox_ply

    sys.path.insert(0, os.path.dirname(__file__))
    from train import model_config_from_info

    paths = PathConfig()
    folder = os.path.join(paths.output, args.folder)
    with open(os.path.join(folder, "info.json")) as f:
        info = json.load(f)
    mcfg = model_config_from_info(info)
    cfg = Config(model=mcfg)

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{args.dataset}_filtered_val.json")
    scanrefer_train, _, _, all_scenes = get_scanrefer(train_path, val_path)
    with open(val_path) as f:
        entries = [d for d in json.load(f) if d["scene_id"] == args.scene_id]
    if not entries:
        raise SystemExit(f"scene {args.scene_id} not in val split")

    common = dict(
        scannet_data_dir=paths.scannet_data, glove_path=paths.glove,
        num_points=mcfg.num_points, use_height=mcfg.use_height,
        use_color=mcfg.use_color, use_normal=mcfg.use_normal,
        use_multiview=mcfg.use_multiview, multiview_path=paths.multiview)
    train_ds = ScannetReferenceDataset(
        scanrefer_train, all_scenes, split="train", augment=False, **common)
    ds = ScannetReferenceDataset(
        entries[:1], all_scenes, split="val", augment=False,
        vocab=train_ds.vocabulary, glove=train_ds.glove, **common)

    sample = ds.__getitem__(0, rs=np.random.RandomState(args.seed))
    batch = {k: jnp.asarray(v)[None] for k, v in sample.items()}
    batch["glove_emb_table"] = jnp.asarray(train_ds.emb_table)

    model = CapNet(mcfg, num_vocabs=train_ds.num_vocabs,
                   num_vocabs_padded=int(info.get("num_vocabs_padded", 0)
                                         or 0))
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(args.seed))
    restored = CheckpointIO(os.path.join(folder, "ckpt")).restore_best_or_last(
        {"params": state.params, "batch_stats": state.batch_stats})
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"])
    # detection_loss=True: the per-object box PLYs are named/colored by the
    # ASSIGNED GT object id (reference visualize.py:375), which comes from
    # the detection loss's object_assignment
    out = make_eval_step(cfg, model, detection_loss=True)(state, batch)

    obj_prob = jax.nn.softmax(out["objectness_scores"], -1)[..., 1]
    cls = jnp.argmax(out["sem_cls_scores"], -1)
    keep = nms_3d(out["bbox_corner"], obj_prob, cls, 0.25, True)
    keep = np.asarray(keep & (jnp.argmax(out["objectness_scores"], -1) == 1))[0]
    corners = np.asarray(out["bbox_corner"])[0]
    caps = np.asarray(out["lang_cap"])[0]

    out_dir = os.path.join(folder, "vis", args.scene_id)
    os.makedirs(out_dir, exist_ok=True)

    # scene cloud
    pc = np.asarray(sample["point_clouds"])
    rgb = ((pc[:, 3:6] * 256.0 + MEAN_COLOR_RGB).clip(0, 255).astype(np.uint8)
           if mcfg.use_color else
           np.full((len(pc), 3), 180, np.uint8))
    write_ply(os.path.join(out_dir, "scene.ply"), pc[:, :3], rgb)

    # predicted + GT boxes (merged clouds, plus the reference's per-object
    # PLYs colored by the NYU40 palette indexed object_id % 40 —
    # scripts/visualize.py:365-401, byte-identical colors)
    from scan2cap_tpu.utils.colors import object_color

    det_ids = np.asarray(sample["scene_object_ids"])
    if keep.any():
        write_bbox_ply(os.path.join(out_dir, "pred_boxes.ply"),
                       corners[keep], color=(0, 255, 0))
        assignment = np.asarray(out["object_assignment"][0]).astype(int)
        for k in np.where(keep)[0]:
            oid = int(det_ids[assignment[k]])
            write_bbox_ply(
                os.path.join(out_dir, f"pred-{oid}.ply"),
                corners[k][None], color=object_color(oid))
    gt_mask = np.asarray(sample["gt_box_masks"]) == 1
    gt_corners = np.asarray(sample["gt_box_corner_label"])
    write_bbox_ply(os.path.join(out_dir, "gt_boxes.ply"),
                   gt_corners[gt_mask], color=(0, 0, 255))
    for i in np.where(gt_mask)[0]:
        oid = int(np.asarray(sample["gt_box_object_ids"])[i])
        write_bbox_ply(os.path.join(out_dir, f"gt-{oid}.ply"),
                       gt_corners[i][None], color=object_color(oid))

    captions = {
        str(int(k)): decode_caption(caps[k], ds.vocabulary["idx2word"])
        for k in np.where(keep)[0]}
    with open(os.path.join(out_dir, "captions.json"), "w") as f:
        json.dump(captions, f, indent=4)
    print(f"wrote visualization to {out_dir} "
          f"({int(keep.sum())} predicted boxes)")


if __name__ == "__main__":
    args = parse_args()
    visualize(args)

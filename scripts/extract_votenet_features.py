"""Extract VoteNet proposal features with a trained detection CapNet
(scripts/extract_votenet_features.py).

Runs CapNet(no_caption) over all scenes, keeps proposals surviving
NMS ∧ objectness, stores per-proposal features + nearest-GT object ids:
HDF5 keys ``"0|{scene}_object_ids/_features/_bbox_corners/_gt_ids/
_gt_corners"`` (extract_votenet_features.py:125-206) — the database consumed
by PretrainedVoteNetDataset.
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
    p.add_argument("--folder", type=str, default="",
                   help="trained (detection) CapNet run folder")
    p.add_argument("--pth", type=str, default="",
                   help="released VoteNet .pth (the reference's "
                        "PRETRAIN_VOTENET_* detectors, "
                        "extract_votenet_features.py:77-78) — with no run "
                        "folder, model config comes from the CLI flags")
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--num_proposals", type=int, default=256)
    p.add_argument("--no_height", action="store_true")
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--use_normal", action="store_true")
    p.add_argument("--use_multiview", action="store_true")
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=str, default=None)
    return p.parse_args()


def extract(args):
    import h5py
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, PathConfig
    from scan2cap_tpu.data.dataset import (
        ScannetReferenceDataset, Loader, get_scanrefer)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state, make_eval_step
    from scan2cap_tpu.train.checkpoints import CheckpointIO
    from scan2cap_tpu.ops.nms import nms_3d

    sys.path.insert(0, os.path.dirname(__file__))
    from train import model_config_from_args, model_config_from_info

    paths = PathConfig()
    if not args.folder and not args.pth:
        raise SystemExit("need --folder (trained run) or --pth "
                         "(released detector weights)")
    info = None
    if args.folder:
        folder = os.path.join(paths.output, args.folder)
        with open(os.path.join(folder, "info.json")) as f:
            info = json.load(f)
        targs = argparse.Namespace(**info)
    else:
        # fill the trainer-arg surface model_config_from_args expects with
        # its own defaults, overridden by this CLI's feature flags
        targs = argparse.Namespace(
            num_points=args.num_points, num_proposals=args.num_proposals,
            num_locals=-1,
            num_graph_steps=0, query_mode="corner", graph_mode="edge_conv",
            graph_aggr="add", use_relation=False, use_orientation=False,
            use_distance=False, use_topdown=False, use_color=args.use_color,
            use_normal=args.use_normal, use_multiview=args.use_multiview,
            no_height=args.no_height, no_caption=True)
    base = (model_config_from_info(info) if info is not None
            else model_config_from_args(targs))
    mcfg = base.__class__(**{**base.__dict__, "no_caption": True})
    cfg = Config(model=mcfg)

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{args.dataset}_filtered_val.json")
    scanrefer_train, _, _, all_scenes = get_scanrefer(train_path, val_path)
    with open(os.path.join(paths.data,
                           f"{args.dataset}_filtered_{args.split}.json")) as f:
        split_data = json.load(f)
    by_scene = {}
    for d in split_data:
        by_scene.setdefault(d["scene_id"], d)
    entries = [by_scene[s] for s in sorted(by_scene)]

    common = dict(
        scannet_data_dir=paths.scannet_data, glove_path=paths.glove,
        num_points=mcfg.num_points, use_height=mcfg.use_height,
        use_color=mcfg.use_color, use_normal=mcfg.use_normal,
        use_multiview=mcfg.use_multiview, multiview_path=paths.multiview)
    train_ds = ScannetReferenceDataset(
        scanrefer_train, all_scenes, split="train", augment=False, **common)
    ds = ScannetReferenceDataset(
        entries, all_scenes, split=args.split, augment=False,
        vocab=train_ds.vocabulary, glove=train_ds.glove, **common)
    loader = Loader(ds, args.batch_size, shuffle=False, seed=args.seed,
                    drop_last=False)

    model = CapNet(mcfg, num_vocabs=train_ds.num_vocabs)
    example = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    state = create_train_state(cfg, model, example, jax.random.PRNGKey(0))
    if args.pth:
        from scan2cap_tpu.convert import mount_detection_weights
        state = mount_detection_weights(state, args.pth)
    else:
        restored = CheckpointIO(
            os.path.join(folder, "ckpt")).restore_best_or_last(
            {"params": state.params, "batch_stats": state.batch_stats})
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
    eval_step = make_eval_step(cfg, model)

    out_path = args.out or os.path.join(
        paths.data, f"votenet_{args.dataset}_predictions_{args.split}.hdf5")
    with h5py.File(out_path, "w") as db:
        for batch in loader:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            out = eval_step(state, jb)
            obj_prob = jax.nn.softmax(out["objectness_scores"], -1)[..., 1]
            cls = jnp.argmax(out["sem_cls_scores"], -1)
            keep = nms_3d(out["bbox_corner"], obj_prob, cls, 0.25, True)
            keep = np.asarray(
                keep & (jnp.argmax(out["objectness_scores"], -1) == 1))
            feats = np.asarray(out["bbox_feature"])
            corners = np.asarray(out["bbox_corner"])
            assign = np.asarray(out["object_assignment"])
            for b in range(keep.shape[0]):
                scene_id = ds.scanrefer[int(batch["dataset_idx"][b])]["scene_id"]
                idx = np.where(keep[b])[0]
                obj_ids = np.asarray(batch["scene_object_ids"][b])[assign[b, idx]]
                gt_mask = np.asarray(batch["gt_box_masks"][b]) == 1
                prefix = f"0|{scene_id}"
                db[prefix + "_object_ids"] = obj_ids
                db[prefix + "_features"] = feats[b, idx]
                db[prefix + "_bbox_corners"] = corners[b, idx]
                db[prefix + "_gt_ids"] = np.asarray(
                    batch["gt_box_object_ids"][b])[gt_mask]
                db[prefix + "_gt_corners"] = np.asarray(
                    batch["gt_box_corner_label"][b])[gt_mask]
    print(f"wrote {out_path}")


if __name__ == "__main__":
    args = parse_args()
    np.random.seed(args.seed)
    extract(args)

"""Extract GT-box features with a trained MaskVoteNet
(scripts/extract_gt_features.py).

Runs MaskVoteNet over every (scene, object) pair for ``--epoch`` augmented
passes and writes HDF5 keys
``"{epoch}|{scene_id}_gt_ids / _features / _bbox_corners / _gt_corners"``
(extract_gt_features.py:100-165,227-240) — the database consumed by
PretrainedGTDataset.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", type=str, default="",
                   help="trained MaskVoteNet run folder")
    p.add_argument("--pth", type=str, default="",
                   help="released MaskVoteNet .pth (the reference's "
                        "PRETRAIN_MASK_VOTENET_* extractors, "
                        "extract_gt_features.py:68-69) — no run folder "
                        "needed; model config comes from the CLI flags")
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--no_height", action="store_true")
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--use_normal", action="store_true")
    p.add_argument("--use_multiview", action="store_true")
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--epoch", type=int, default=100,
                   help="number of augmented passes")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", type=str, default=None)
    return p.parse_args()


def extract(args):
    import h5py
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, ModelConfig, PathConfig
    from scan2cap_tpu.data.dataset import Loader, get_scanrefer
    from scan2cap_tpu.data.dataset_maskvotenet import MaskScannetReferenceDataset
    from scan2cap_tpu.models.mask_votenet import MaskVoteNet
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    paths = PathConfig()
    if not args.folder and not args.pth:
        raise SystemExit("need --folder (trained run) or --pth "
                         "(released extractor weights)")
    if args.folder:
        folder = os.path.join(paths.output, args.folder)
        with open(os.path.join(folder, "info.json")) as f:
            info = json.load(f)
    else:
        info = {"num_points": args.num_points, "no_height": args.no_height,
                "use_color": args.use_color, "use_normal": args.use_normal,
                "use_multiview": args.use_multiview}
    # same CI shrink knob as scripts/train_maskvotenet.py — the restored
    # checkpoint's shapes must match the training-time pyramid
    tiny = dict(sa_npoints=(128, 64, 32, 16)) \
        if os.environ.get("SCAN2CAP_TEST_TINY") else {}
    mcfg = ModelConfig(
        num_points=info["num_points"], num_proposals=1, max_num_obj=1,
        use_height=not info.get("no_height", False),
        use_color=info.get("use_color", False),
        use_normal=info.get("use_normal", False),
        use_multiview=info.get("use_multiview", False), no_caption=True,
        **tiny)

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{args.dataset}_filtered_val.json")
    scanrefer_train, _, _, all_scenes = get_scanrefer(train_path, val_path)
    with open(os.path.join(paths.data,
                           f"{args.dataset}_filtered_{args.split}.json")) as f:
        entries = json.load(f)

    ds = MaskScannetReferenceDataset(
        entries, all_scenes,
        scannet_data_dir=paths.scannet_data, glove_path=paths.glove,
        num_points=mcfg.num_points, use_height=mcfg.use_height,
        use_color=mcfg.use_color, use_normal=mcfg.use_normal,
        use_multiview=mcfg.use_multiview, multiview_path=paths.multiview,
        augment=(args.split == "train"))

    model = MaskVoteNet(mcfg)
    loader = Loader(ds, args.batch_size, shuffle=False, seed=args.seed,
                    drop_last=False)
    example = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    init = jax.jit(model.init, static_argnames=("train",))
    variables = init(jax.random.PRNGKey(0), example, train=False)
    if args.pth:
        # MaskVoteNet's torch tree uses the same module names/Sequential
        # indices as VoteNet (models/mask_votenet.py:145-166), so the
        # VoteNet converter applies verbatim
        from scan2cap_tpu.convert import convert_votenet_checkpoint, _merge
        conv_p, conv_s = convert_votenet_checkpoint(args.pth)
        restored = {"params": _merge(variables["params"], conv_p),
                    "batch_stats": _merge(variables["batch_stats"], conv_s)}
    else:
        restored = CheckpointIO(
            os.path.join(folder, "ckpt")).restore_best_or_last(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]})

    @jax.jit
    def forward(batch):
        out = model.apply(restored, batch, train=False)
        return (out["aggregated_vote_features"][:, 0],   # (B, 128)
                out["center"][:, 0])

    out_path = args.out or os.path.join(
        paths.data, f"gt_{args.dataset}_features_{args.split}.hdf5")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    n_epochs = args.epoch if args.split == "train" else 1
    with h5py.File(out_path, "w") as db:
        for epoch in range(n_epochs):
            per_scene = defaultdict(lambda: {"ids": [], "feats": [],
                                             "corners": []})
            loader.epoch = epoch
            for batch in loader:
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                feats, _ = forward(jb)
                feats = np.asarray(feats)
                for b in range(len(feats)):
                    scene_id = ds.scanrefer[int(batch["dataset_idx"][b])]["scene_id"]
                    s = per_scene[scene_id]
                    s["ids"].append(int(batch["object_id"][b]))
                    s["feats"].append(feats[b])
                    s["corners"].append(np.asarray(batch["bbox_corner_label"][b]))
            for scene_id, s in per_scene.items():
                prefix = f"{epoch}|{scene_id}"
                db[prefix + "_gt_ids"] = np.asarray(s["ids"])
                db[prefix + "_features"] = np.stack(s["feats"])
                db[prefix + "_bbox_corners"] = np.stack(s["corners"])
                db[prefix + "_gt_corners"] = np.stack(s["corners"])
            print(f"epoch {epoch}: {len(per_scene)} scenes")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    args = parse_args()
    np.random.seed(args.seed)
    extract(args)

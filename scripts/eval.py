"""Evaluation CLI — mirror of /root/reference/scripts/eval.py.

Evaluates a trained run folder: caption metrics (CiDEr/BLEU/ROUGE/METEOR at
--min_iou) and/or detection mAP@0.25/0.5.  Flags must match the train run
(recorded in info.json — README.md:27).
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
    p.add_argument("--folder", type=str, required=True,
                   help="output folder containing ckpt/ and info.json")
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--min_iou", type=float, default=0.5)
    p.add_argument("--eval_caption", action="store_true")
    p.add_argument("--eval_detection", action="store_true")
    p.add_argument("--use_last", action="store_true",
                   help="evaluate model_last instead of best")
    p.add_argument("--use_train", action="store_true",
                   help="evaluate on the train split (scripts/eval.py:259)")
    p.add_argument("--no_nms", action="store_true",
                   help="skip NMS in caption-eval post-processing")
    p.add_argument("--use_pretrained", type=str, default=None,
                   help="evaluate warm-start detection weights instead of "
                        "the folder checkpoint: a converted torch .pth "
                        "(the reference's --eval_pretrained) or a run name")
    p.add_argument("--force", action="store_true")
    p.add_argument("--mesh", type=str, default=None, metavar="DATA,MODEL",
                   help="run the eval step over a (data, model) device "
                        "mesh: scenes shard over DATA (uneven final "
                        "batches are padded and sliced back — exact), the "
                        "caption decode's proposal axis over MODEL; token "
                        "ids are bitwise-identical to single-device "
                        "(tests/test_parallel_eval.py)")
    p.add_argument("--save_interm", action="store_true",
                   help="dump per-object boxes/captions/attention to "
                        "interm.json (reference --save_interm, "
                        "lib/eval_helper.py:242-275)")
    return p.parse_args()


def evaluate(args):
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, PathConfig
    from scan2cap_tpu.data.dataset import (
        ScannetReferenceDataset, Loader, get_scanrefer)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state, make_eval_step
    from scan2cap_tpu.train.checkpoints import CheckpointIO
    from scan2cap_tpu.eval.eval_helper import eval_cap, prepare_corpus
    from scan2cap_tpu.eval.ap_helper import (
        APCalculator, parse_predictions_device, assemble_pred_map_cls,
        parse_groundtruths)

    sys.path.insert(0, os.path.dirname(__file__))
    from train import model_config_from_info  # reuse arg->config mapping

    paths = PathConfig()
    folder = os.path.join(paths.output, args.folder)
    with open(os.path.join(folder, "info.json")) as f:
        info = json.load(f)
    targs = argparse.Namespace(**info)
    mcfg = model_config_from_info(info)
    cfg = Config(model=mcfg)

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{args.dataset}_filtered_val.json")
    scanrefer_train, eval_train, eval_val, all_scenes = get_scanrefer(
        train_path, val_path, getattr(targs, "num_scenes", -1))
    eval_list = eval_train if args.use_train else eval_val
    eval_split = "train" if args.use_train else "val"

    common = dict(
        scannet_data_dir=paths.scannet_data,
        glove_path=paths.glove,
        num_points=mcfg.num_points,
        use_height=mcfg.use_height,
        use_color=mcfg.use_color,
        use_normal=mcfg.use_normal,
        use_multiview=mcfg.use_multiview,
        multiview_path=paths.multiview,
    )
    train_ds = ScannetReferenceDataset(
        scanrefer_train, all_scenes, split="train", augment=False, **common)
    val_ds = ScannetReferenceDataset(
        eval_list, all_scenes, split=eval_split, augment=False,
        vocab=train_ds.vocabulary, glove=train_ds.glove, **common)
    val_loader = Loader(val_ds, args.batch_size, shuffle=False,
                        seed=args.seed, drop_last=False)

    # a mesh-trained checkpoint carries a TP-padded classifier; rebuild the
    # same width so the restore target matches (pad columns are masked to
    # -1e30 — single-device eval semantics are unchanged)
    vocab_pad = int(info.get("num_vocabs_padded", 0) or 0)
    model = CapNet(mcfg, num_vocabs=train_ds.num_vocabs,
                   num_vocabs_padded=vocab_pad)
    example = next(iter(val_loader))
    example = {k: jnp.asarray(v) for k, v in example.items()}
    example["glove_emb_table"] = jnp.asarray(train_ds.emb_table)
    state = create_train_state(cfg, model, example, jax.random.PRNGKey(args.seed))
    if args.use_pretrained and args.use_pretrained.endswith(".pth"):
        # .pth eval: a FULL Scan2Cap model.pth (detection + graph + caption,
        # the reference's scripts/eval.py:106-108 artifact) mounts everything
        # and supports caption eval; a detection-only VoteNet .pth
        # (README.md:160-164 released weights) leaves the caption decoder at
        # random init, so caption eval is rejected for those.
        from scan2cap_tpu.convert import (
            _load_state_dict, mount_capnet_weights, mount_detection_weights)
        sd = _load_state_dict(args.use_pretrained)  # load ONCE, mount below
        has_caption = any(k.startswith("caption.") for k in sd)
        if has_caption:
            state = mount_capnet_weights(state, sd)
        elif args.eval_caption:
            raise SystemExit(
                "--use_pretrained <.pth> holds detection weights only; "
                "combine it with --eval_detection, not --eval_caption")
        else:
            state = mount_detection_weights(state, sd)
    else:
        src = (os.path.join(paths.output, args.use_pretrained, "ckpt")
               if args.use_pretrained else os.path.join(folder, "ckpt"))
        ckpt = CheckpointIO(src)
        restored = (ckpt.restore("last", {"params": state.params,
                                         "batch_stats": state.batch_stats})
                    if args.use_last else ckpt.restore_best_or_last(
                        {"params": state.params,
                         "batch_stats": state.batch_stats}))
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
    if args.save_interm and not args.eval_caption:
        print("WARNING: --save_interm only produces output with "
              "--eval_caption; ignoring it")
        args.save_interm = False
    eval_step = make_eval_step(cfg, model, keep_attn=args.save_interm)

    if args.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from scan2cap_tpu.parallel import mesh_eval_fn, parse_mesh

        mesh = parse_mesh(args.mesh)
        # eval params replicate (the decode shards its PROPOSAL axis over
        # "model" via the ambient mesh — no vocab padding needed here)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        eval_step = mesh_eval_fn(eval_step, mesh)
        print(f"mesh: {dict(mesh.shape)}", flush=True)

    if args.eval_caption:
        with open(os.path.join(paths.data,
                               "ScanRefer_filtered_organized.json")) as f:
            organized = json.load(f)
        split_path = train_path if args.use_train else val_path
        corpus = prepare_corpus(
            [d for d in json.load(open(split_path))
             if d["scene_id"] in {e["scene_id"] for e in eval_list}])
        intermediates = {} if args.save_interm else None
        bleu, cider, rouge, meteor = eval_cap(
            eval_step, state, val_ds, val_loader, organized,
            min_iou=args.min_iou, corpus=corpus, use_nms=not args.no_nms,
            intermediates=intermediates)
        if args.save_interm:
            interm_path = os.path.join(folder, "interm.json")
            with open(interm_path, "w") as f:
                json.dump(intermediates, f)
            print(f"saved intermediate results to {interm_path}")
        print(f"[BLEU-1] {bleu[0][0]:.4f}")
        print(f"[BLEU-2] {bleu[0][1]:.4f}")
        print(f"[BLEU-3] {bleu[0][2]:.4f}")
        print(f"[BLEU-4] {bleu[0][3]:.4f}")
        print(f"[CIDEr]  {cider[0]:.4f}")
        print(f"[ROUGE]  {rouge[0]:.4f}")
        print(f"[METEOR] {meteor[0]:.4f}")

    if args.eval_detection:
        calcs = {t: APCalculator(t) for t in (0.25, 0.5)}
        for batch in val_loader:
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
            jbatch["glove_emb_table"] = jnp.asarray(train_ds.emb_table)
            out = eval_step(state, jbatch)
            # point_clouds is not in the eval_step keep_keys; wire the input
            # cloud through so remove_empty_box (POST_DICT parity) is active
            parsed = jax.device_get(parse_predictions_device(
                {**out, "point_clouds": jbatch["point_clouds"]}))
            preds = assemble_pred_map_cls(
                np.asarray(out["bbox_corner"]), parsed)
            gts = parse_groundtruths(batch)
            for c in calcs.values():
                c.step(preds, gts)
        for t, c in calcs.items():
            metrics = c.compute_metrics()
            print(f"--- mAP@{t}: {metrics['mAP']:.4f}  AR@{t}: {metrics['AR']:.4f}")


if __name__ == "__main__":
    args = parse_args()
    np.random.seed(args.seed)
    evaluate(args)

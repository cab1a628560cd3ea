"""Evaluate a pretrained-track (caption-only) run
(scripts/eval_pretrained.py → lib/eval_helper_pretrained.py).

"gt" mode: candidates keyed by the stored object ids (oracle boxes,
feed_gt_cap); "votenet" mode: IoU-gated like the scene path
(feed_votenet_cap).
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
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--min_iou", type=float, default=0.5)
    p.add_argument("--features", type=str, default=None)
    return p.parse_args()


def evaluate(args):
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, ModelConfig, PathConfig
    from scan2cap_tpu.data.dataset import Loader, get_scanrefer
    from scan2cap_tpu.data.dataset_pretrained import (
        PretrainedGTDataset, PretrainedVoteNetDataset)
    from scan2cap_tpu.data.vocab import load_glove
    from scan2cap_tpu.models.capnet_pretrained import CapNetPretrained
    from scan2cap_tpu.train.checkpoints import CheckpointIO
    from scan2cap_tpu.eval.eval_helper import (
        prepare_corpus, score_captions)

    paths = PathConfig()
    folder = os.path.join(paths.output, args.folder)
    with open(os.path.join(folder, "info.json")) as f:
        info = json.load(f)
    mode = info["mode"]
    K = 128 if mode == "gt" else 256
    mcfg = ModelConfig(
        num_proposals=K, num_locals=info["num_locals"],
        num_graph_steps=info["num_graph_steps"],
        query_mode=info["query_mode"], graph_mode=info["graph_mode"],
        graph_aggr=info["graph_aggr"], use_topdown=info["use_topdown"],
        use_relation=info["use_relation"],
        use_orientation=info["use_orientation"],
        use_distance=info["use_distance"])

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{args.dataset}_filtered_val.json")
    scanrefer_train, _, _, _ = get_scanrefer(train_path, val_path)
    with open(val_path) as f:
        val_entries = json.load(f)
    by_scene = {}
    for d in val_entries:
        by_scene.setdefault(d["scene_id"], d)
    eval_entries = [by_scene[s] for s in sorted(by_scene)]

    glove = load_glove(paths.glove)
    if mode == "gt":
        feats = args.features or os.path.join(
            paths.data, f"gt_{args.dataset}_features_val.hdf5")
        train_ds = PretrainedGTDataset(scanrefer_train, feats, split="val",
                                       glove=glove, K=K)
        ds = PretrainedGTDataset(eval_entries, feats, split="val",
                                 glove=glove, vocab=train_ds.vocabulary, K=K)
    else:
        feats = args.features or os.path.join(
            paths.data, f"votenet_{args.dataset}_predictions_val.hdf5")
        train_ds = PretrainedVoteNetDataset(scanrefer_train, feats,
                                            split="val", glove=glove, K=K)
        ds = PretrainedVoteNetDataset(eval_entries, feats, split="val",
                                      glove=glove,
                                      vocab=train_ds.vocabulary, K=K)
    loader = Loader(ds, args.batch_size, shuffle=False, seed=args.seed,
                    drop_last=False)

    model = CapNetPretrained(mcfg, mode=mode, num_vocabs=train_ds.num_vocabs)
    example = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    example["glove_emb_table"] = jnp.asarray(train_ds.emb_table)
    init = jax.jit(model.init, static_argnames=("use_tf", "is_eval", "train"))
    variables = init(jax.random.PRNGKey(0), example, use_tf=True,
                     is_eval=False, train=False)
    # the solver always checkpoints a batch_stats collection (empty when the
    # config has no BN layers, e.g. gt mode with num_graph_steps=0) — the
    # restore target must carry the same structure
    target = {"params": variables["params"],
              "batch_stats": dict(variables.get("batch_stats", {}))}
    variables = CheckpointIO(os.path.join(folder, "ckpt")).restore_best_or_last(
        target)

    @jax.jit
    def eval_step(batch):
        return model.apply(variables, batch, use_tf=False, is_eval=True,
                           train=False)

    with open(os.path.join(paths.data,
                           "ScanRefer_filtered_organized.json")) as f:
        organized = json.load(f)

    from scan2cap_tpu.eval.eval_pretrained import feed_pretrained_cap
    candidates = feed_pretrained_cap(
        eval_step, ds, loader, organized, mode=mode, min_iou=args.min_iou)

    corpus = prepare_corpus(val_entries)
    bleu, cider, rouge, meteor = score_captions(corpus, candidates)
    print(f"[BLEU-4] {bleu[0][3]:.4f}")
    print(f"[CIDEr]  {cider[0]:.4f}")
    print(f"[ROUGE]  {rouge[0]:.4f}")
    print(f"[METEOR] {meteor[0]:.4f}")


if __name__ == "__main__":
    args = parse_args()
    np.random.seed(args.seed)
    evaluate(args)

"""Caption-only training over precomputed features
(scripts/train_pretrained.py) — the CPU-runnable config from BASELINE.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--mode", type=str, default="gt", choices=["gt", "votenet"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epoch", type=int, default=50)
    p.add_argument("--verbose", type=int, default=10)
    p.add_argument("--val_step", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--num_locals", type=int, default=-1)
    p.add_argument("--num_graph_steps", type=int, default=0)
    p.add_argument("--query_mode", type=str, default="center")
    p.add_argument("--graph_mode", type=str, default="edge_conv")
    p.add_argument("--graph_aggr", type=str, default="add")
    p.add_argument("--use_topdown", action="store_true")
    p.add_argument("--use_relation", action="store_true")
    p.add_argument("--use_orientation", action="store_true")
    p.add_argument("--use_distance", action="store_true")
    p.add_argument("--criterion", type=str, default="cider")
    p.add_argument("--features", type=str, default=None,
                   help="HDF5 feature database path")
    p.add_argument("--mesh", type=str, default=None, metavar="DATA,MODEL",
                   help="train over a (data, model) device mesh — "
                        "sequences shard over DATA; DP (e.g. 8,1) is the "
                        "natural shape for this decoder-only stage (an "
                        "unpadded classifier under MODEL>1 falls back to "
                        "hidden-axis sharding: correct, more traffic)")
    return p.parse_args()


def train(args):
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, ModelConfig, PathConfig, TrainConfig
    from scan2cap_tpu.data.dataset import Loader, get_scanrefer
    from scan2cap_tpu.data.dataset_pretrained import (
        PretrainedGTDataset, PretrainedVoteNetDataset)
    from scan2cap_tpu.data.vocab import load_glove
    from scan2cap_tpu.models.capnet_pretrained import CapNetPretrained
    from scan2cap_tpu.losses.pretrained import get_pretrained_loss
    from scan2cap_tpu.train.step import TrainState, make_optimizer
    from scan2cap_tpu.train.solver import Solver

    paths = PathConfig()
    K = 128 if args.mode == "gt" else 256
    mcfg = ModelConfig(
        num_proposals=K, num_locals=args.num_locals,
        num_graph_steps=args.num_graph_steps, query_mode=args.query_mode,
        graph_mode=args.graph_mode, graph_aggr=args.graph_aggr,
        use_topdown=args.use_topdown, use_relation=args.use_relation,
        use_orientation=args.use_orientation, use_distance=args.use_distance)
    cfg = Config(model=mcfg, train=TrainConfig(
        batch_size=args.batch_size, lr=args.lr, wd=args.wd, seed=args.seed))

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{args.dataset}_filtered_val.json")
    scanrefer_train, _, _, _ = get_scanrefer(train_path, val_path)
    glove = load_glove(paths.glove)

    scan2cad = None
    if args.use_orientation:
        with open(os.path.join(paths.data,
                               "scannet_instance_rotations.json")) as f:
            scan2cad = json.load(f)

    if args.mode == "gt":
        feats = args.features or os.path.join(
            paths.data, f"gt_{args.dataset}_features_train.hdf5")
        train_ds = PretrainedGTDataset(
            scanrefer_train, feats, split="train", glove=glove,
            scan2cad_rotation=scan2cad, K=K)
    else:
        feats = args.features or os.path.join(
            paths.data, f"votenet_{args.dataset}_predictions_train.hdf5")
        train_ds = PretrainedVoteNetDataset(
            scanrefer_train, feats, split="train", glove=glove,
            scan2cad_rotation=scan2cad, K=K)
    train_loader = Loader(train_ds, args.batch_size, shuffle=True,
                          seed=args.seed)

    model = CapNetPretrained(mcfg, mode=args.mode,
                             num_vocabs=train_ds.num_vocabs)
    example = {k: jnp.asarray(v) for k, v in next(iter(train_loader)).items()}
    example["glove_emb_table"] = jnp.asarray(train_ds.emb_table)
    init = jax.jit(model.init, static_argnames=("use_tf", "is_eval", "train"))
    variables = init(jax.random.PRNGKey(args.seed), example,
                     use_tf=True, is_eval=False, train=False)
    tx = make_optimizer(args.wd)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx)

    mode = args.mode
    orientation = args.use_orientation
    distance = args.use_distance

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, lr, bn_momentum):
        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, use_tf=True, is_eval=False, train=True)
            out = get_pretrained_loss(out, mode=mode, orientation=orientation,
                                      distance=distance)
            return out["loss"], out
        (loss, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads, lr)
        keys = ("loss", "cap_loss", "cap_acc", "ori_loss", "ori_acc",
                "dist_loss")
        return state, {k: out[k] for k in keys if k in out}

    # in-training caption eval (lib/solver_pretrained.py:283-295) —
    # wired when the val feature DB + organized json are present
    eval_fn = None
    if args.features:
        # swap only the basename's LAST "train" for "val" — a blanket
        # path.replace("train","val") would also rewrite directory
        # components (/data/retrain_v2/...) and silently disable eval on
        # the mangled path
        import re
        head, base = os.path.split(args.features)
        val_db = os.path.join(
            head, re.sub(r"train(?!.*train)", "val", base, count=1))
    else:
        val_db = os.path.join(paths.data,
                              (f"gt_{args.dataset}_features_val.hdf5"
                               if args.mode == "gt" else
                               f"votenet_{args.dataset}_predictions_val.hdf5"))
    organized_path = os.path.join(paths.data,
                                  "ScanRefer_filtered_organized.json")
    if os.path.exists(val_db) and os.path.exists(organized_path):
        from scan2cap_tpu.eval.eval_helper import prepare_corpus
        from scan2cap_tpu.eval.eval_pretrained import eval_pretrained_cap
        from scan2cap_tpu.data.dataset import Loader as _Loader

        with open(organized_path) as f:
            organized = json.load(f)
        with open(val_path) as f:
            val_entries = json.load(f)
        by_scene = {}
        for d in val_entries:
            by_scene.setdefault(d["scene_id"], d)
        eval_entries = [by_scene[s] for s in sorted(by_scene)]
        ds_cls = PretrainedGTDataset if args.mode == "gt" \
            else PretrainedVoteNetDataset
        val_ds = ds_cls(eval_entries, val_db, split="val", glove=glove,
                        vocab=train_ds.vocabulary, K=K)
        val_loader = _Loader(val_ds, args.batch_size, shuffle=False,
                             seed=args.seed, drop_last=False)
        corpus = prepare_corpus(val_entries)

        # jit ONCE with the state leaves as arguments: a fresh closure per
        # eval_fn call would miss jax.jit's cache (keyed on the function
        # object) and recompile the whole eval program at every val step
        @jax.jit
        def estep(params, batch_stats, batch):
            return model.apply({"params": params, "batch_stats": batch_stats},
                               batch, use_tf=False, is_eval=True, train=False)

        def eval_fn(state):
            bleu, cider, rouge, meteor = eval_pretrained_cap(
                lambda b: estep(state.params, state.batch_stats, b),
                val_ds, val_loader, organized, corpus, mode=args.mode)
            return {"bleu-4": bleu[0][3], "cider": cider[0],
                    "rouge": rouge[0], "meteor": meteor[0]}

    if args.mesh:
        from scan2cap_tpu.parallel import (mesh_step_fn, setup_mesh,
                                           shard_train_state)
        mesh = setup_mesh(args.mesh, args.batch_size)
        state = shard_train_state(state, mesh)
        train_step = mesh_step_fn(train_step, mesh)
        print(f"mesh: {dict(mesh.shape)}", flush=True)

    stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    if args.tag:
        stamp += "_" + args.tag.upper()
    solver = Solver(cfg, model, state, train_step, train_loader,
                    eval_fn=eval_fn, stamp=stamp, criterion=args.criterion,
                    verbose=args.verbose, val_step=args.val_step)
    with open(os.path.join(solver.output, "info.json"), "w") as f:
        json.dump(dict(vars(args), num_train=len(train_ds)), f, indent=4)
    solver(args.epoch, args.verbose)


if __name__ == "__main__":
    args = parse_args()
    np.random.seed(args.seed)
    train(args)

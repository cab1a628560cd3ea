"""MaskVoteNet pretraining CLI (scripts/train_maskvotenet.py).

Trains the single-proposal feature extractor; best model selected by mIoU
(lib/solver_maskvotenet.py tracks miou/sem_cls_acc).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--dataset", type=str, default="ScanRefer")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epoch", type=int, default=20)
    p.add_argument("--verbose", type=int, default=10)
    p.add_argument("--val_step", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--no_height", action="store_true")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--use_normal", action="store_true")
    p.add_argument("--use_multiview", action="store_true")
    p.add_argument("--mesh", type=str, default=None, metavar="DATA,MODEL",
                   help="train over a (data, model) device mesh; this "
                        "detection-only model has no TP-worthy params, so "
                        "DP (e.g. 8,1) is the natural shape — scenes shard "
                        "over DATA, gradients all-reduce via XLA")
    return p.parse_args()


def train(args):
    import jax
    import jax.numpy as jnp
    import functools

    from scan2cap_tpu.config import Config, ModelConfig, PathConfig, TrainConfig
    from scan2cap_tpu.data.dataset import Loader, get_scanrefer
    from scan2cap_tpu.data.dataset_maskvotenet import MaskScannetReferenceDataset
    from scan2cap_tpu.models.mask_votenet import MaskVoteNet
    from scan2cap_tpu.losses.mask_votenet import get_mask_votenet_loss
    from scan2cap_tpu.train.step import TrainState, make_optimizer
    from scan2cap_tpu.train.solver import Solver

    paths = PathConfig()
    # CI hook: shrink the SA pyramid so fixture-size scenes run fast on CPU
    # (same knob as scripts/train.py)
    tiny = dict(sa_npoints=(128, 64, 32, 16)) \
        if os.environ.get("SCAN2CAP_TEST_TINY") else {}
    mcfg = ModelConfig(
        num_points=args.num_points, num_proposals=1, max_num_obj=1,
        use_height=not args.no_height, use_color=args.use_color,
        use_normal=args.use_normal, use_multiview=args.use_multiview,
        no_caption=True, **tiny)
    cfg = Config(model=mcfg, train=TrainConfig(
        batch_size=args.batch_size, lr=args.lr, wd=args.wd, seed=args.seed))

    train_path = os.path.join(paths.data, f"{args.dataset}_filtered_train.json")
    val_path = os.path.join(paths.data, f"{args.dataset}_filtered_val.json")
    scanrefer_train, _, eval_val, all_scenes = get_scanrefer(train_path, val_path)

    common = dict(
        scannet_data_dir=paths.scannet_data, glove_path=paths.glove,
        num_points=args.num_points, use_height=not args.no_height,
        use_color=args.use_color, use_normal=args.use_normal,
        use_multiview=args.use_multiview, multiview_path=paths.multiview)
    train_ds = MaskScannetReferenceDataset(
        scanrefer_train, all_scenes, split="train",
        augment=not args.no_augment, **common)
    train_loader = Loader(train_ds, args.batch_size, shuffle=True,
                          seed=args.seed)

    model = MaskVoteNet(mcfg)
    example = {k: jnp.asarray(v) for k, v in next(iter(train_loader)).items()}
    init = jax.jit(model.init, static_argnames=("train",))
    variables = init(jax.random.PRNGKey(args.seed), example, train=False)
    tx = make_optimizer(args.wd)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), tx=tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, lr, bn_momentum):
        def loss_fn(params, stats):
            out, mut = model.apply(
                {"params": params, "batch_stats": stats}, batch,
                train=True, bn_momentum=bn_momentum, mutable=["batch_stats"])
            out = get_mask_votenet_loss(out)
            return out["loss"], (out, mut["batch_stats"])
        (loss, (out, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        state = state.apply_gradients(grads, lr).replace(batch_stats=stats)
        keys = ("loss", "vote_loss", "box_loss", "center_loss", "size_cls_loss",
                "size_reg_loss", "sem_cls_loss", "sem_cls_acc", "miou")
        return state, {k: out[k] for k in keys if k in out}

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
                    eval_fn=None, stamp=stamp, criterion="miou",
                    verbose=args.verbose, lr_decay=True, bn_decay=True)
    with open(os.path.join(solver.output, "info.json"), "w") as f:
        json.dump(dict(vars(args), num_train=len(train_ds)), f, indent=4)
    solver(args.epoch, args.verbose)


if __name__ == "__main__":
    args = parse_args()
    np.random.seed(args.seed)
    train(args)

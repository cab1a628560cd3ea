"""End-to-end training demo on synthetic scenes (no ScanNet download needed).

Runs the SURVEY.md §7 milestone-1 check at full scale: VoteNet-style
detection training (backbone + voting + proposal + detection losses) on
synthetic single scenes, showing vote/objectness/box losses decreasing and
mAP@0.25 > 0 against the synthetic GT.  Add --caption for the full CapNet.

Synthetic batches are generated host-side once and cycled (the tunnel to the
TPU in this environment is slow; real deployments stream per-step batches).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--num_batches", type=int, default=4,
                   help="distinct synthetic batches cycled during training")
    p.add_argument("--caption", action="store_true")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 backbone MLP chain (geometry stays f32)")
    p.add_argument("--bf16_components", type=str,
                   default="sa1,sa2,sa3,sa4,fp",
                   help="with --bf16: which backbone modules narrow "
                        "(bisection knob, TPU_DESIGN §8)")
    p.add_argument("--bf16_storage", action="store_true",
                   help="storage-only bfloat16: layer-boundary activation "
                        "buffers half-width, all matmul/BN compute f32 "
                        "(gated by --bf16_components; subsumed by --bf16)")
    p.add_argument("--mesh", type=str, default=None, metavar="DATA,MODEL",
                   help="run the train/eval steps over a (data, model) "
                        "device mesh, e.g. 8,1 (DP) or 4,2 (DP+TP); with "
                        "MODEL>1 the caption classifier is auto-padded to a "
                        "TP-friendly width (parallel.padded_vocab)")
    p.add_argument("--use_normal", action="store_true")
    p.add_argument("--use_multiview", action="store_true")
    p.add_argument("--use_pretrained", type=str, default=None,
                   help="warm-start the detection modules from a "
                        "reference-layout VoteNet .pth (the reference's "
                        "flagship recipe loads "
                        "pretrained/PRETRAIN_VOTENET_XYZ_MULTIVIEW_NORMAL; "
                        "pass --use_normal --use_multiview to match its "
                        "input width)")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    from scan2cap_tpu.config import Config, ModelConfig
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import create_train_state, make_train_step, make_eval_step
    from scan2cap_tpu.eval.ap_helper import (
        APCalculator, parse_predictions_device, assemble_pred_map_cls,
        parse_groundtruths)

    args = parse_args()
    mcfg = ModelConfig(num_points=args.num_points,
                       no_caption=not args.caption, min_iou=-1.0,
                       use_normal=args.use_normal,
                       use_multiview=args.use_multiview,
                       compute_dtype="bfloat16" if args.bf16 else "float32",
                       storage_dtype=("bfloat16" if args.bf16_storage
                                      else "float32"),
                       bf16_components=args.bf16_components)
    cfg = Config(model=mcfg)
    vocab = make_vocab(num_vocabs=128, emb_size=mcfg.emb_size)

    print("building synthetic batches...", flush=True)
    from scan2cap_tpu.data.synthetic import stage_scene_batch
    batches = [make_scene_batch(mcfg, batch_size=args.batch_size,
                                num_objects=6, vocab=vocab, seed=s)
               for s in range(args.num_batches + 1)]
    # zero feature channels (normal/multiview) are assembled on device —
    # the full flagship cloud would be ~170 MB/batch over this host link
    jbatches = [stage_scene_batch(b, mcfg) for b in batches]

    mesh = None
    vocab_pad = 0
    if args.mesh:
        from scan2cap_tpu.parallel import (make_mesh, mesh_step_fn,
                                           padded_vocab, shard_batch,
                                           shard_train_state)
        n_data, n_model = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        if n_model > 1:
            vocab_pad = padded_vocab(128, n_model)
        print(f"mesh: data={n_data} model={n_model}"
              f"{f' vocab padded 128->{vocab_pad}' if vocab_pad else ''}",
              flush=True)

    model = CapNet(mcfg, num_vocabs=128, num_vocabs_padded=vocab_pad)
    state = create_train_state(cfg, model, jbatches[0],
                               jax.random.PRNGKey(args.seed))
    if args.use_pretrained:
        from scan2cap_tpu.convert import mount_detection_weights
        state = mount_detection_weights(state, args.use_pretrained)
        print(f"warm-started detection modules from {args.use_pretrained}",
              flush=True)
    step = make_train_step(cfg, model, detection=True,
                           caption=args.caption, donate=False)
    if mesh is not None:
        state = shard_train_state(state, mesh)
        jbatches = [shard_batch(b, mesh) for b in jbatches]
        step = mesh_step_fn(step, mesh)
    lr = jnp.asarray(args.lr)
    mom = jnp.asarray(0.1)

    t_start = time.time()
    first = {}
    for i in range(args.steps):
        state, metrics = step(state, jbatches[i % args.num_batches], lr, mom)
        if i == 0:
            first = {k: float(v) for k, v in metrics.items()}
            print(f"[step 0] compile+run {time.time() - t_start:.1f}s", flush=True)
            t_start = time.time()  # exclude compile from throughput
        if i % 25 == 0 or i == args.steps - 1:
            print(f"[step {i}] loss {float(metrics['loss']):.3f} "
                  f"vote {float(metrics['vote_loss']):.3f} "
                  f"obj {float(metrics['objectness_loss']):.3f} "
                  f"box {float(metrics['box_loss']):.3f} "
                  f"obj_acc {float(metrics['obj_acc']):.3f}", flush=True)
    float(metrics["loss"])  # drain the async queue before timing
    steps_per_sec = (args.steps - 1) / (time.time() - t_start)
    print(f"train throughput ~{steps_per_sec * args.batch_size:.2f} scenes/s "
          f"({steps_per_sec:.2f} steps/s)", flush=True)

    # held-out synthetic batch -> detection mAP
    eval_step = make_eval_step(cfg, model)
    if mesh is not None:
        eval_step = mesh_step_fn(eval_step, mesh)
    out = eval_step(state, jbatches[-1])
    # include the input cloud so the remove_empty_box filter is active
    parsed = jax.device_get(parse_predictions_device(
        {**out, "point_clouds": jbatches[-1]["point_clouds"]}))
    preds = assemble_pred_map_cls(np.asarray(out["bbox_corner"]), parsed)
    gts = parse_groundtruths(batches[-1])
    calc = APCalculator(0.25)
    calc.step(preds, gts)
    m = calc.compute_metrics()
    last = {k: float(v) for k, v in metrics.items()}
    print(f"final: loss {first['loss']:.2f} -> {last['loss']:.2f}; "
          f"mAP@0.25 = {m['mAP']:.4f}, AR = {m['AR']:.4f}")
    assert last["loss"] < first["loss"], "loss did not decrease"
    assert m["mAP"] > 0, "mAP is zero"
    print("milestone check passed")


if __name__ == "__main__":
    main()

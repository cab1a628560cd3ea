"""Quality-trajectory regression artifact (VERDICT r3 item 6).

Trains the flagship CapNet config (multiview+normal+height features,
top-down decoder, 2-step relational graph, 256 proposals over 40k points —
/root/reference/slurm/train.job:24) on synthetic scenes and records the
quality curve every ``--eval_every`` steps:

  * detection mAP@0.25 on a HELD-OUT synthetic batch (geometry generalizes);
  * caption CiDEr on the TRAINING scenes (synthetic captions are random
    token sequences, so held-out caption quality is unlearnable by
    construction — the memorization curve is the signal: a silent
    quality regression in the caption/attention path flattens it, exactly
    the failure mode the bf16 study measured in detection).

The resulting JSON curve is checked into docs/measurements/ and a loose
pinned bound on it is asserted by tests/test_quality_trajectory.py, so perf
work cannot silently trade away training quality (TPU_DESIGN §8: such
regressions are invisible to op-level parity tests and COMPOUND).

The flagship feature channels beyond xyz are zero for synthetic scenes
except height, so the staging path uploads only xyz + height + vote labels
and assembles the zero channels ON DEVICE (this host's tunnel is
~1.6 MB/s; the full 135-channel cloud would be ~170 MB/batch).

Run (TPU): python scripts/quality_trajectory.py --eval_batches 4 \
    --out docs/measurements/r4/quality_trajectory.json
(the checked-in artifact uses the 32-scene eval; see --eval_batches help)
Tiny (CPU, the slow-test config): add --tiny --steps 200 --eval_every 40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--eval_every", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_batches", type=int, default=4,
                   help="distinct synthetic batches cycled during training")
    p.add_argument("--eval_batches", type=int, default=1,
                   help="HELD-OUT batches for the detection eval; the "
                        "default 8-scene eval is too noisy to compare "
                        "training variants (TPU_DESIGN §8: f32 tails span "
                        "0.29-0.49 across seeds at eval_batches=1)")
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--seeds", type=str, default="",
                   help="comma-separated list; runs every seed in ONE "
                        "process (batches staged once, programs compiled "
                        "once — on this host each fresh process pays a "
                        "multi-minute tunnel cool-down, so paired studies "
                        "should batch their seeds). --out must contain "
                        "'{seed}'")
    p.add_argument("--out", type=str, default="")
    p.add_argument("--tiny", action="store_true",
                   help="CPU-sized config for the regression test")
    p.add_argument("--bf16_storage", action="store_true",
                   help="storage-only bfloat16 backbone buffers (quality "
                        "gate for the storage-dtype experiment)")
    p.add_argument("--mesh", type=str, default=None, metavar="DATA,MODEL",
                   help="train over a (data, model) device mesh — the mesh "
                        "quality-trajectory gate (VERDICT r4 #5): run the "
                        "tiny config on the 8-virtual-CPU mesh "
                        "(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_"
                        "platform_device_count=8) so mesh training gets the "
                        "same silent-regression guard single-device "
                        "training has")
    args = p.parse_args()
    if args.seeds and len(args.seeds.split(",")) > 1:
        if not (args.out and "{seed}" in args.out):
            p.error("--seeds needs --out with a '{seed}' placeholder")
    return args


def make_config(args):
    from scan2cap_tpu.config import Config, ModelConfig

    if args.tiny:
        mcfg = ModelConfig(
            num_points=min(args.num_points, 1024), num_proposals=32,
            sa_npoints=(256, 128, 64, 32), max_num_obj=8, num_locals=4,
            num_graph_steps=2, use_topdown=True, use_relation=True,
            use_orientation=True, min_iou=-1.0)
    else:
        mcfg = ModelConfig(
            num_points=args.num_points, num_graph_steps=2, num_locals=10,
            use_topdown=True, use_relation=True, use_orientation=True,
            use_normal=True, use_multiview=True, min_iou=-1.0)
    if args.bf16_storage:
        mcfg = ModelConfig(**{**mcfg.__dict__, "storage_dtype": "bfloat16"})
    return Config(model=mcfg)


def main():
    import jax

    # env var alone does not beat an installed TPU plugin's platform
    # selection on this host (tests/conftest.py) — pin through the config
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from scan2cap_tpu.data.synthetic import (make_scene_batch, make_vocab,
                                             stage_scene_batch)
    from scan2cap_tpu.eval.ap_helper import (
        APCalculator, assemble_pred_map_cls, parse_groundtruths,
        parse_predictions_device)
    from scan2cap_tpu.eval.capeval import Cider
    from scan2cap_tpu.eval.eval_helper import (decode_caption,
                                               postprocess_scene_cap)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.train import (create_train_state, make_eval_step,
                                    make_train_step)

    args = parse_args()
    cfg = make_config(args)
    mcfg = cfg.model
    vocab = make_vocab(num_vocabs=128, emb_size=mcfg.emb_size)
    idx2word = vocab["idx2word"]

    print(f"building {args.num_batches}+{args.eval_batches} synthetic "
          f"batches (N={mcfg.num_points}, B={args.batch_size})...",
          flush=True)
    host_batches = [make_scene_batch(mcfg, batch_size=args.batch_size,
                                     num_objects=6, vocab=vocab, seed=s)
                    for s in range(args.num_batches + args.eval_batches)]
    t0 = time.time()
    jbatches = [stage_scene_batch(b, mcfg) for b in host_batches]
    jax.block_until_ready(jbatches)
    print(f"staged in {time.time() - t0:.0f}s", flush=True)

    mesh = None
    vocab_pad = 0
    if args.mesh:
        from scan2cap_tpu.parallel import (mesh_eval_fn, mesh_step_fn,
                                           padded_vocab, setup_mesh,
                                           shard_train_state)
        mesh = setup_mesh(args.mesh, args.batch_size)
        n_model = dict(mesh.shape)["model"]
        if n_model > 1:
            vocab_pad = padded_vocab(128, n_model)
        print(f"mesh: {dict(mesh.shape)}"
              + (f" vocab padded 128->{vocab_pad}" if vocab_pad else ""),
              flush=True)

    model = CapNet(mcfg, num_vocabs=128, num_vocabs_padded=vocab_pad)
    step = make_train_step(cfg, model, detection=True, caption=True,
                           orientation=True, donate=False)
    eval_step = make_eval_step(cfg, model)
    if mesh is not None:
        step = mesh_step_fn(step, mesh)
        eval_step = mesh_eval_fn(eval_step, mesh)
    # caption gate at IoU 0.25 (vs the benchmark's 0.5): the trajectory
    # scores only ~32 synthetic scenes, and at 0.5 a handful of borderline
    # boxes flipping across the gate makes the CiDEr curve useless as a
    # regression signal (measured: 4.77 -> 0.04 between adjacent evals)
    post_fn = jax.jit(
        lambda out, batch: postprocess_scene_cap(out, batch, min_iou=0.25))
    lr = jnp.asarray(args.lr)
    mom = jnp.asarray(0.1)

    def eval_detection(state, batch_pairs):
        """mAP/AR over ALL held-out batches in one APCalculator — the
        regression signal needs more than one 8-scene batch to rise above
        eval noise when comparing training variants."""
        calc = APCalculator(0.25)
        for jb, hb in batch_pairs:
            out = eval_step(state, jb)
            parsed = jax.device_get(parse_predictions_device(
                {**out, "point_clouds": jb["point_clouds"]}))
            preds = assemble_pred_map_cls(
                np.asarray(out["bbox_corner"]), parsed)
            calc.step(preds, parse_groundtruths(hb))
        m = calc.compute_metrics()
        return float(m["mAP"]), float(m["AR"])

    def eval_cider(state, batch_pairs):
        """CiDEr of the free-running decode on the TRAINING scenes, scored
        across ALL train batches at once (one 8-scene batch is far too few
        candidates for a stable document-frequency-based metric)."""
        corpus, cands = {}, {}
        for bi, (jb, hb) in enumerate(batch_pairs):
            out = eval_step(state, jb)
            post = post_fn(out, jb)
            keep = np.asarray(post["keep"])
            det = np.asarray(post["detected_object_ids"])
            ious = np.asarray(post["ious"])
            caps = np.asarray(post["captions"])
            for b in range(keep.shape[0]):
                oid = int(hb["object_id"][b])
                key = f"batch{bi}|scene{b}|{oid}"
                corpus[key] = [decode_caption(hb["lang_ids"][b], idx2word)]
                cand, best = "sos eos", -1.0
                for k in np.where(keep[b])[0]:
                    if int(det[b, k]) == oid and ious[b, k] > best:
                        best = float(ious[b, k])
                        cand = decode_caption(caps[b, k], idx2word)
                cands[key] = [cand]
        return float(Cider().compute_score(corpus, cands)[0])

    nb = args.num_batches
    train_pairs = list(zip(jbatches[:nb], host_batches[:nb]))
    eval_pairs = list(zip(jbatches[nb:], host_batches[nb:]))

    def run_seed(seed):
        state = create_train_state(cfg, model, jbatches[0],
                                   jax.random.PRNGKey(seed))
        if mesh is not None:
            state = shard_train_state(state, mesh)
        curve = {"step": [], "loss": [], "cap_loss": [], "cap_acc": [],
                 "map25": [], "ar25": [], "cider_train": []}

        def record(step_i, metrics):
            m25, ar = eval_detection(state, eval_pairs)
            cid = eval_cider(state, train_pairs)
            curve["step"].append(step_i)
            curve["loss"].append(
                round(float(metrics["loss"]), 4) if metrics else None)
            curve["cap_loss"].append(
                round(float(metrics["cap_loss"]), 4) if metrics else None)
            curve["cap_acc"].append(
                round(float(metrics["cap_acc"]), 4) if metrics else None)
            curve["map25"].append(round(m25, 4))
            curve["ar25"].append(round(ar, 4))
            curve["cider_train"].append(round(cid, 4))
            print(f"seed {seed} step {step_i:4d}: loss "
                  f"{curve['loss'][-1]} mAP@0.25 {m25:.4f} AR {ar:.4f} "
                  f"CiDEr(train) {cid:.4f}", flush=True)

        record(0, None)
        t_train = time.time()
        metrics = None
        for i in range(1, args.steps + 1):
            state, metrics = step(
                state, jbatches[(i - 1) % args.num_batches], lr, mom)
            if i % args.eval_every == 0 or i == args.steps:
                record(i, metrics)
        wall = time.time() - t_train

        return {
            "config": {"tiny": args.tiny, "num_points": mcfg.num_points,
                       "num_proposals": mcfg.num_proposals,
                       "batch_size": args.batch_size, "steps": args.steps,
                       "num_batches": args.num_batches,
                       "eval_batches": args.eval_batches, "lr": args.lr,
                       "seed": seed, "mesh": args.mesh,
                       "flagship": not args.tiny},
            "platform": jax.devices()[0].platform,
            "curve": curve,
            "final": {"map25": curve["map25"][-1],
                      "ar25": curve["ar25"][-1],
                      "cider_train": curve["cider_train"][-1],
                      "loss": curve["loss"][-1]},
            "train_wall_s": round(wall, 1),
            "train_scenes_per_sec": round(
                args.steps * args.batch_size / wall, 2),
        }

    seeds = ([int(s) for s in args.seeds.split(",") if s.strip()]
             if args.seeds else [args.seed])
    for seed in seeds:
        line = json.dumps(run_seed(seed))
        print(line)
        if args.out:
            with open(args.out.replace("{seed}", str(seed)), "w") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()

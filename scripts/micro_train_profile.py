"""Per-op device profile of the FULL caption train step (fwd+bwd) at B=16.

Companion to micro_train_breakdown.py: same in-jit synthetic batch, but
wraps the warm steps in jax.profiler.trace and prints per-op totals via
profile_report.summarize. Finds where the ~190 ms train step goes.

Run: python scripts/micro_train_profile.py [--steps 4] [--top 30]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("SCAN2CAP_MICRO_BATCH", "16"))
NUM_VOCABS = 3433


def main(steps: int, top: int, trace_dir: str, detect_only: bool):
    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.data.synthetic import (make_device_train_batch,
                                             make_scene_batch, make_vocab)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.losses.total import get_scene_cap_loss
    from profile_report import summarize

    if detect_only:
        cfg = ModelConfig(no_caption=True, use_normal=True,
                          use_multiview=True)
    else:
        cfg = ModelConfig(num_graph_steps=2, num_locals=10,
                          use_topdown=True, use_relation=True,
                          use_orientation=True,
                          use_normal=True, use_multiview=True)
    vocab = make_vocab(num_vocabs=NUM_VOCABS, emb_size=300)
    emb_table = jnp.asarray(vocab["emb_table"])

    model = CapNet(cfg, num_vocabs=NUM_VOCABS)
    batch = make_device_train_batch(cfg, BATCH, vocab, key_seed=7)
    init = jax.jit(model.init, static_argnames=("use_tf", "is_eval", "train"))
    variables = init(jax.random.PRNGKey(0), batch,
                     use_tf=True, is_eval=False, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    caption = not cfg.no_caption

    def loss_fn(params, stats, batch):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, batch,
            use_tf=True, is_eval=False, train=True, bn_momentum=0.1,
            mutable=["batch_stats"])
        out = get_scene_cap_loss(
            out, detection=True, caption=caption,
            orientation=caption and cfg.use_orientation,
            distance=False)
        return out["loss"], mut["batch_stats"]

    @jax.jit
    def fwdbwd(params, stats, batch, key):
        b = dict(batch)
        b["point_clouds"] = batch["point_clouds"] + 1e-6 * jax.random.normal(
            key, batch["point_clouds"].shape)
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, b)
        return loss + sum(jnp.sum(jnp.abs(g))
                          for g in jax.tree_util.tree_leaves(grads))

    float(fwdbwd(params, stats, batch, jax.random.PRNGKey(1)))
    print("compiled", flush=True)
    with jax.profiler.trace(trace_dir):
        for s in range(steps):
            float(fwdbwd(params, stats, batch, jax.random.PRNGKey(10 + s)))
    print(f"trace written to {trace_dir}", flush=True)
    summarize(trace_dir, top=top)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--detect_only", action="store_true")
    p.add_argument("--trace", type=str, default="/tmp/train_trace")
    args = p.parse_args()
    main(args.steps, args.top, args.trace, args.detect_only)

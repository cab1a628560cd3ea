"""Train-step timing on the TPU: detection-only and full-caption configs,
forward-only vs forward+backward, at B=16 (in-jit synthetic batches).

Run: python scripts/micro_train_breakdown.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("SCAN2CAP_MICRO_BATCH", "16"))
NUM_VOCABS = 3433


def main():
    from scan2cap_tpu.config import Config, ModelConfig, TrainConfig
    from scan2cap_tpu.data.synthetic import (make_device_train_batch,
                                             make_scene_batch, make_vocab)
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.losses.total import get_scene_cap_loss

    dtype = os.environ.get("SCAN2CAP_MICRO_DTYPE", "float32")
    configs = {
        "detect_only": ModelConfig(no_caption=True,
                                   use_normal=True, use_multiview=True,
                                   compute_dtype=dtype),
        "full": ModelConfig(num_graph_steps=2, num_locals=10,
                            use_topdown=True, use_relation=True,
                            use_orientation=True,
                            use_normal=True, use_multiview=True,
                            compute_dtype=dtype),
    }
    vocab = make_vocab(num_vocabs=NUM_VOCABS, emb_size=300)
    emb_table = jnp.asarray(vocab["emb_table"])

    for name, cfg in configs.items():
        model = CapNet(cfg, num_vocabs=NUM_VOCABS)
        batch = make_device_train_batch(cfg, BATCH, vocab, key_seed=7)
        init = jax.jit(model.init,
                       static_argnames=("use_tf", "is_eval", "train"))
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
        def fwd(params, stats, batch, key):
            b = dict(batch)
            b["point_clouds"] = batch["point_clouds"] + 1e-6 * jax.random.normal(
                key, batch["point_clouds"].shape)
            loss, _ = loss_fn(params, stats, b)
            return loss

        @jax.jit
        def fwdbwd(params, stats, batch, key):
            b = dict(batch)
            b["point_clouds"] = batch["point_clouds"] + 1e-6 * jax.random.normal(
                key, batch["point_clouds"].shape)
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, b)
            return loss + sum(jnp.sum(jnp.abs(g))
                              for g in jax.tree_util.tree_leaves(grads))

        print(f"{name}: inputs ready", flush=True)
        for tag, fn in (("fwd  ", fwd), ("fwd+bwd", fwdbwd)):
            float(fn(params, stats, batch, jax.random.PRNGKey(1)))
            print(f"{name} {tag}: compiled", flush=True)
            ts = []
            for s in range(5):
                t0 = time.perf_counter()
                float(fn(params, stats, batch, jax.random.PRNGKey(10 + s)))
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            print(f"{name:12s} {tag}: {dt*1e3:7.1f} ms "
                  f"({BATCH/dt:6.1f} scenes/s)")


if __name__ == "__main__":
    main()

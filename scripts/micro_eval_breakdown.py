"""Per-stage timing of the CapNet eval path on the TPU.

Times detection-only, +graph, and full (+caption decode) configs with
in-jit repetition (the tunnel's ~27ms dispatch overhead swamps single
dispatches).

Run: python scripts/micro_eval_breakdown.py
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
REP = 4


def main():
    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
    from scan2cap_tpu.models import CapNet

    dtype = os.environ.get("SCAN2CAP_MICRO_DTYPE", "float32")
    configs = {
        "detect_only": ModelConfig(no_caption=True,
                                   use_normal=True, use_multiview=True,
                                   compute_dtype=dtype),
        "detect+graph": ModelConfig(no_caption=True, num_graph_steps=2,
                                    num_locals=10, use_relation=True,
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
        init_batch = make_scene_batch(cfg, batch_size=1, num_objects=4,
                                      vocab=vocab, seed=0)
        lang_feat = jnp.asarray(
            np.tile(init_batch["lang_feat"][:1], (BATCH, 1, 1)))
        init = jax.jit(model.init,
                       static_argnames=("use_tf", "is_eval", "train"))
        variables = init(
            jax.random.PRNGKey(0),
            {**{k: jnp.asarray(v) for k, v in init_batch.items()},
             "glove_emb_table": emb_table},
            use_tf=True, is_eval=False, train=False)
        params, stats = variables["params"], variables["batch_stats"]
        in_dim = 3 + cfg.input_feature_dim
        N = cfg.num_points

        @jax.jit
        def eval_rep(params, batch_stats, key):
            def one(key):
                kxyz, kfeat = jax.random.split(key)
                xyz = jax.random.uniform(kxyz, (BATCH, N, 3),
                                         minval=-4.0, maxval=4.0)
                feats = jax.random.normal(kfeat, (BATCH, N, in_dim - 3)) * 0.1
                pc = jnp.concatenate([xyz, feats], axis=-1)
                batch = {"point_clouds": pc, "lang_feat": lang_feat,
                         "glove_emb_table": emb_table}
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    batch, use_tf=False, is_eval=True, train=False)
                s = jnp.sum(out["bbox_corner"]) + jnp.sum(
                    out["objectness_scores"])
                if "lang_cap" in out:
                    s = s + jnp.sum(out["lang_cap"])
                return s
            acc = jnp.float32(0)
            key0 = key
            for i in range(REP):
                key0 = jax.random.fold_in(key0, i)
                acc = acc + one(key0)
            return acc

        float(eval_rep(params, stats, jax.random.PRNGKey(1)))
        ts = []
        for s in range(4):
            t0 = time.perf_counter()
            float(eval_rep(params, stats, jax.random.PRNGKey(100 + s)))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts)) / REP
        print(f"{name:14s}: {dt*1e3:7.1f} ms/batch  "
              f"({BATCH/dt:6.1f} scenes/s)")


if __name__ == "__main__":
    main()

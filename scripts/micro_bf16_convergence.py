"""bf16-vs-f32 training equivalence check on the TPU.

Trains the full caption config from the same init twice — compute_dtype
float32 vs bfloat16 (backbone MLP chain narrowed, geometry/decomposition
still f32, see models/backbone.py) — for STEPS steps on the same synthetic
batch stream and prints the loss trajectories.  Rounding differences make
the paths diverge step-by-step; equivalence means the smoothed loss levels
track each other.

Run: python scripts/micro_bf16_convergence.py [--steps 200]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 16
NUM_VOCABS = 3433


def run(dtype: str, steps: int):
    from scan2cap_tpu.config import Config, ModelConfig
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.losses import get_scene_cap_loss
    from scan2cap_tpu.train import create_train_state

    cfg = ModelConfig(num_graph_steps=2, num_locals=10,
                      use_topdown=True, use_relation=True,
                      use_orientation=True, use_normal=True,
                      use_multiview=True, compute_dtype=dtype)
    vocab = make_vocab(num_vocabs=NUM_VOCABS, emb_size=300)
    model = CapNet(cfg, num_vocabs=NUM_VOCABS)
    from scan2cap_tpu.data.synthetic import make_device_train_batch
    batch = make_device_train_batch(cfg, BATCH, vocab, key_seed=11)

    state = create_train_state(Config(model=cfg), model, batch,
                               jax.random.PRNGKey(0))

    def loss_fn(params, stats, b):
        out, mut = model.apply({"params": params, "batch_stats": stats}, b,
                               use_tf=True, is_eval=False, train=True,
                               bn_momentum=0.1, mutable=["batch_stats"])
        out = get_scene_cap_loss(out, detection=True, caption=True,
                                 orientation=True, distance=False)
        return out["loss"], mut["batch_stats"]

    @jax.jit
    def train_chunk(state, batch, start):
        def body(st, i):
            b = dict(batch)
            # per-step jitter so the stream isn't one frozen batch
            b["point_clouds"] = batch["point_clouds"] + 1e-6 * (start + i + 1)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, st.batch_stats, b)
            st = st.apply_gradients(grads, jnp.float32(1e-3))
            st = st.replace(batch_stats=new_stats)
            return st, loss
        st, losses = jax.lax.scan(body, state,
                                  jnp.arange(20, dtype=jnp.float32))
        return st, losses

    all_losses = []
    t0 = time.perf_counter()
    for chunk in range(steps // 20):
        state, losses = train_chunk(state, batch, jnp.float32(chunk * 20))
        all_losses.append(np.asarray(losses))
    wall = time.perf_counter() - t0
    tr = np.concatenate(all_losses)
    print(f"[{dtype}] {steps} steps in {wall:.1f}s "
          f"({wall/steps*1e3:.1f} ms/step incl. dispatch)")
    for i in range(0, len(tr), 20):
        print(f"  step {i:4d}-{i+19:4d}: mean loss {tr[i:i+20].mean():8.4f}")
    return tr


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()
    f32 = run("float32", args.steps)
    bf16 = run("bfloat16", args.steps)
    tail = args.steps // 4
    a, b = f32[-tail:].mean(), bf16[-tail:].mean()
    print(f"tail-{tail} mean loss: f32 {a:.4f}  bf16 {b:.4f}  "
          f"rel diff {abs(a-b)/abs(a)*100:.2f}%")

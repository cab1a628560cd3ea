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


def measure_train(cfg, model, vocab, emb_table):
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
        out = get_scene_cap_loss(out, detection=True, caption=True,
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


def measure_floors(B=16, N=40000, M=2048, S=64, R=0.2, REP=8):
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

    def timed_call(fn_j, *args):
        float(fn_j(*args, jnp.float32(0)))  # compile + warmup
        ts = []
        for s in range(5):
            t0 = time.perf_counter()
            float(fn_j(*args, jnp.float32((s + 1) * 1e-9)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # the dispatch+readback cost every timed call below also pays: a trivial
    # program whose execution is ~0, so its wall time IS the overhead.
    overhead_s = timed_call(jax.jit(lambda salt: salt + 1.0))

    def timed(fn, *args):
        t = timed_call(jax.jit(fn), *args)
        return max(0.0, t - overhead_s) / REP * 1e3

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

    def entry(measured, floor, basis):
        return {"measured_ms": round(measured, 2), "floor_ms": floor,
                "ratio": round(measured / floor, 2) if floor > 0 else None,
                "floor_basis": basis}

    slices = B * M * S
    return {
        "shapes": f"B={B} N={N} M={M} S={S} (sa1 eval config)",
        "dispatch_overhead_ms": round(overhead_s * 1e3, 1),
        "rep": REP,
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
    }


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

    if os.environ.get("SCAN2CAP_BENCH_TRAIN", "1") != "0":
        train_sps, train_ms = measure_train(cfg, model, vocab, emb_table)
    else:  # eval-only sweeps (e.g. SCAN2CAP_BENCH_BATCH A/Bs) skip the ~2 min
        train_sps = train_ms = None

    floors = None
    if os.environ.get("SCAN2CAP_BENCH_FLOORS", "1") != "0":
        floors = measure_floors()

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

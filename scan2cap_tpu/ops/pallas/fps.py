"""Furthest-point sampling as a single Pallas kernel.

The pure-XLA FPS (ops/sampling.py) is a 2048-iteration ``lax.fori_loop``
whose (B, N) running-min state round-trips HBM every step; here the whole
loop runs inside one kernel with the state resident in VMEM.

Two structural choices make the kernel fast:

* the point axis is laid out as an (8, N/8) tile per scene so every VPU
  sublane is busy (a (1, N) row would idle 7 of 8 sublanes);
* up to 8 scenes run in ONE program, stacked on the sublane axis (64 rows).
  FPS is a 2048-step serial loop; with one scene per program each step's
  reduce→scalar→broadcast round-trips (last-point gather, argmax value,
  winner index) serialize on the scalar unit, ~2700 cycles/step.  Batched,
  every per-scene statistic stays vectorial: cross-row (within an 8-row
  scene group) max/min/sum reductions are masked Hillis-Steele scans over
  sublane rolls — pure VPU data movement, bit-exact (the MXU alternative,
  contraction with a block-diagonal matrix, silently truncates f32 values
  to bf16 passes and breaks argmax ties).  The 8 scenes' latency chains
  overlap (47ms -> ~13ms at B=8, N=40k).

Semantics identical to the CUDA kernel (sampling_gpu.cu:69-173): seed 0,
||p||² <= 1e-3 points excluded, argmax ties resolved to the lowest original
index (row-major position == original index), strict-compare scan order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8          # sublane rows per scene
_SCENES = 8        # scenes per program (sublane axis = _ROWS * _SCENES; 16 OOMs VMEM)


def _roll_rows(v: jax.Array, shift: int) -> jax.Array:
    """Cyclic sublane roll: result[i] = v[(i - shift) % R]."""
    return pltpu.roll(v, shift % v.shape[0], 0)   # pltpu.roll wants shift >= 0


def _group_scan(v: jax.Array, r8: jax.Array, op, unit) -> jax.Array:
    """Reduce ``op`` over each aligned 8-row group of ``v`` (R, C) and
    broadcast the result back to all rows of the group.  Masked
    Hillis-Steele prefix+suffix scans over cyclic sublane rolls; exact
    (no MXU, no precision change, no scalar-unit round trip)."""
    pre, suf = v, v
    for k in (1, 2, 4):
        pre = op(pre, jnp.where(r8 >= k, _roll_rows(pre, k), unit))
        suf = op(suf, jnp.where(r8 < _ROWS - k, _roll_rows(suf, -k), unit))
    return op(pre, suf)   # both include self; op must be idempotent on self


def _pair_combine(m1, c1, m2, c2):
    """Argmax-combine for (score, index) pairs: larger score wins, equal
    scores tie-break to the smaller index (the CUDA scan-order rule)."""
    take2 = m2 > m1
    tie = m2 == m1
    m = jnp.maximum(m1, m2)
    c = jnp.where(take2, c2, jnp.where(tie, jnp.minimum(c1, c2), c1))
    return m, c


def _pair_group_scan(m: jax.Array, c: jax.Array, r8: jax.Array,
                     big: jax.Array):
    """One masked Hillis-Steele all-reduce carrying (max score, tie-min
    index) pairs over each aligned 8-row group — the two-stage
    max-scan → candidate-mask → min-scan chain collapsed to a single
    scan stage (self-idempotent: max/min on self are no-ops)."""
    neg = jnp.float32(-jnp.inf)
    prem, prec, sufm, sufc = m, c, m, c
    for k in (1, 2, 4):
        rm = jnp.where(r8 >= k, _roll_rows(prem, k), neg)
        rc = jnp.where(r8 >= k, _roll_rows(prec, k), big)
        prem, prec = _pair_combine(prem, prec, rm, rc)
        rm = jnp.where(r8 < _ROWS - k, _roll_rows(sufm, -k), neg)
        rc = jnp.where(r8 < _ROWS - k, _roll_rows(sufc, -k), big)
        sufm, sufc = _pair_combine(sufm, sufc, rm, rc)
    return _pair_combine(prem, prec, sufm, sufc)


def _argmax_combine(a, b, mask, k, neg, big):
    """Combine step for the coords-carrying scan: ``a``/``b`` are
    (m, c, wx, wy, wz) tuples, ``b`` rolled by ``k`` (masked to the unit
    (neg, big, *) outside the group).  Winner selection is the CUDA rule —
    larger score, ties to smaller index — and the coords FOLLOW the index
    choice bit-exactly (self-idempotent: take2 is False on self; the
    coords need no masking because take2 is already False wherever the
    mask zeroed m2/c2)."""
    m1, c1 = a[0], a[1]
    m2 = jnp.where(mask, _roll_rows(b[0], k), neg)
    c2 = jnp.where(mask, _roll_rows(b[1], k), big)
    take2 = (m2 > m1) | ((m2 == m1) & (c2 < c1))
    out = [jnp.maximum(m1, m2), jnp.where(take2, c2, c1)]
    for v1, v2 in zip(a[2:], b[2:]):
        out.append(jnp.where(take2, _roll_rows(v2, k), v1))
    return tuple(out)


def _coord_group_scan(m, c, wx, wy, wz, r8, big):
    """(max score, tie-min index, winner coords) all-reduce over each
    aligned 8-row group in ONE scan stage.  Carrying the coords here is
    what lets the NEXT iteration start its distance pass directly from the
    loop carry instead of re-extracting the winner's coordinates with a
    one-hot + add-scan on its critical path."""
    neg = jnp.float32(-jnp.inf)
    pre = suf = (m, c, wx, wy, wz)
    for k in (1, 2, 4):
        pre = _argmax_combine(pre, pre, r8 >= k, k, neg, big)
        suf = _argmax_combine(suf, suf, r8 < _ROWS - k, -k, neg, big)
    return _argmax_combine(pre, suf, r8 >= 0, 0, neg, big)


def _fps_kernel(xyz_ref, out_ref, temp_ref, *, npoint: int, n_valid: int,
                fold_valid: bool = True, pair_argmax: bool = False,
                carry_coords: bool = False):
    """xyz_ref: (1, 3*R, cols) VMEM — rows [0:R)=x, [R:2R)=y, [2R:3R)=z,
    where R = _ROWS*_SCENES and scene s owns sublane rows [8s, 8s+8);
    out_ref: (1, R, npad) int32 (per-scene value broadcast across its 8
    rows); temp_ref: (R, cols) f32 running min-distance scratch."""
    R = temp_ref.shape[0]
    cols = temp_ref.shape[1]
    x = xyz_ref[0, 0:R, :]
    y = xyz_ref[0, R:2 * R, :]
    z = xyz_ref[0, 2 * R:3 * R, :]
    r = jax.lax.broadcasted_iota(jnp.int32, (R, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (R, cols), 1)
    orig = (r % _ROWS) * cols + c            # per-scene original point index
    valid = ((x * x + y * y + z * z) > 1e-3) & (orig < n_valid)
    r8 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) % _ROWS
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)

    # invalid points (||p||² <= 1e-3 skip + padding) start at -1 instead of
    # 1e10: d2 >= 0 keeps min(-1, d2) = -1 forever, so the running min IS
    # the argmax score directly and the per-iteration (R, cols)
    # where(valid, t, -1) pass disappears (~1 of ~20 full-tile passes).
    # All-invalid groups behave as before: every score -1, cand = orig 0.
    # fold_valid=False keeps the original two-pass variant for the on-device
    # A/B (scripts/micro_fps.py); both are exact and CPU-parity-tested.
    if fold_valid:
        temp_ref[:] = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    else:
        temp_ref[:] = jnp.full((R, cols), 1e10, jnp.float32)
    BIG = jnp.int32(2 ** 30)

    if carry_coords:
        assert pair_argmax, "carry_coords builds on the pair-scan argmax"
        # the loop carry holds the last pick's coords (group-broadcast),
        # so each iteration starts its distance pass straight from vregs;
        # the winner's coords are extracted in the SAME iteration that
        # selects it (row one-hot masked sums against the row candidate)
        # and ride the argmax scan — the per-iteration sel + add-scan
        # stage disappears from the serial chain.
        def body_cc(j, carry):
            lx, ly, lz, stage = carry
            d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
            t = jnp.minimum(temp_ref[:], d2)
            temp_ref[:] = t
            score = t if fold_valid else jnp.where(valid, t, -1.0)
            m_col = jnp.max(score, axis=1, keepdims=True)        # (R, 1)
            cand_row = jnp.min(jnp.where(score == m_col, orig, BIG),
                               axis=1, keepdims=True)            # (R, 1)
            selw = (score == m_col) & (orig == cand_row)  # 1/row one-hot
            wx, wy, wz = (
                jnp.sum(jnp.where(selw, v, 0.0), axis=1, keepdims=True)
                for v in (x, y, z))
            _, nxt_row, cx, cy, cz = _coord_group_scan(
                m_col, cand_row, wx, wy, wz, r8, BIG)
            stage = jnp.where(lane == j % 128, nxt_row, stage)

            @pl.when(j % 128 == 127)
            def _():
                base = pl.multiple_of((j // 128) * 128, 128)
                out_ref[0, :, pl.ds(base, 128)] = stage

            return cx, cy, cz, stage

        # seed coords (index 0 per scene): one-hot sums + group broadcast,
        # once, outside the loop
        sel0 = orig == 0
        seed = []
        for v in (x, y, z):
            u = jnp.sum(jnp.where(sel0, v, 0.0), axis=1, keepdims=True)
            seed.append(_group_scan(u, r8, jnp.add, jnp.float32(0.0)) - u)
        _, _, _, stage = jax.lax.fori_loop(
            1, npoint, body_cc,
            (seed[0], seed[1], seed[2],
             jnp.zeros((R, 128), jnp.int32)))
        out_ref[0, :, ((npoint - 1) // 128) * 128:
                ((npoint - 1) // 128) * 128 + 128] = stage
        return

    def body(j, carry):
        nxt_row, stage = carry
        # coords of each scene's last pick: one-hot row sums, then a group
        # sum-broadcast (exact: exactly one nonzero per group, so the
        # double-counted self row is an exact 2v - v)
        sel = orig == nxt_row
        u = jnp.concatenate(
            [jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)
             for v in (x, y, z)], axis=1)                       # (R, 3)
        l = _group_scan(u, r8, jnp.add, jnp.float32(0.0)) - u
        lx, ly, lz = l[:, 0:1], l[:, 1:2], l[:, 2:3]
        # diff-form f32 distances — bit-identical to the CUDA arithmetic
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        t = jnp.minimum(temp_ref[:], d2)       # -1 at invalid when folded
        temp_ref[:] = t
        score = t if fold_valid else jnp.where(valid, t, -1.0)
        m_col = jnp.max(score, axis=1, keepdims=True)            # (R, 1)
        if pair_argmax:
            # candidate masking against the ROW max (not the group max):
            # the full-tile where(score==m)+min pass no longer waits on a
            # cross-row scan, and the max-scan + min-scan pair collapses
            # into ONE (score, index) scan — two fewer dependent stages in
            # the per-iteration latency chain.  Rows whose max loses the
            # group combine carry a candidate that _pair_combine discards.
            cand_row = jnp.min(jnp.where(score == m_col, orig, BIG),
                               axis=1, keepdims=True)            # (R, 1)
            _, nxt_row = _pair_group_scan(m_col, cand_row, r8, BIG)
        else:
            m = _group_scan(m_col, r8, jnp.maximum, jnp.float32(-jnp.inf))
            cand = jnp.min(jnp.where(score == m, orig, BIG),
                           axis=1, keepdims=True)                # (R, 1)
            nxt_row = _group_scan(cand, r8, jnp.minimum, BIG)    # (R, 1)
        # Mosaic has no dynamic single-lane stores: collect 128 slots in a
        # small staging tile, flush at lane-aligned window boundaries
        stage = jnp.where(lane == j % 128, nxt_row, stage)

        @pl.when(j % 128 == 127)
        def _():
            base = pl.multiple_of((j // 128) * 128, 128)
            out_ref[0, :, pl.ds(base, 128)] = stage

        return nxt_row, stage

    # stage zeros cover the seed (slot 0 = index 0)
    _, stage = jax.lax.fori_loop(
        1, npoint, body,
        (jnp.zeros((R, 1), jnp.int32), jnp.zeros((R, 128), jnp.int32)))
    # tail window (also rewrites the last full window when npoint % 128 == 0;
    # lanes past npoint hold stale values and are sliced off by the caller)
    out_ref[0, :, ((npoint - 1) // 128) * 128:
            ((npoint - 1) // 128) * 128 + 128] = stage


@functools.partial(jax.jit,
                   static_argnames=("npoint", "interpret", "fold_valid",
                                    "pair_argmax", "carry_coords"))
def furthest_point_sample_pallas(xyz: jax.Array, npoint: int,
                                 interpret: bool = False,
                                 fold_valid: bool = True,
                                 pair_argmax: bool = True,
                                 carry_coords: bool = False) -> jax.Array:
    """(B, N, 3) -> (B, npoint) int32; up to 8 scenes per program.
    ``fold_valid=False`` selects the pre-tuning two-pass kernel variant
    (identical results) so scripts/micro_fps.py can A/B both in-process;
    ``pair_argmax=False`` selects the two-scan argmax chain it replaced
    (identical results; kept for the on-device A/B — the pair scan
    measured +3.7% on the fold variant, 12.60->12.15 ms at B=16);
    ``carry_coords=True`` additionally carries the winner's coordinates
    through the argmax scan so the next iteration skips the one-hot +
    add-scan coordinate extraction (identical results; measured NEGATIVE
    on device, 12.46 vs 11.76 ms — the extraction moves into the serial
    chain ahead of the scan instead of overlapping its tail; kept as the
    documented negative, TPU_DESIGN §10d)."""
    B, N, _ = xyz.shape
    cb = min(B, _SCENES)
    R = _ROWS * cb
    G = -(-B // cb)                                   # programs
    Bp = G * cb
    Np = -(-N // (128 * _ROWS)) * (128 * _ROWS)
    cols = Np // _ROWS
    npad = -(-npoint // 128) * 128
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)          # (B, 3, N)
    if Np != N or Bp != B:
        xyz_t = jnp.pad(xyz_t, ((0, Bp - B), (0, 0), (0, Np - N)))
    # (Bp,3,Np) -> (G, cb, 3, 8, cols) -> (G, 3, cb, 8, cols) -> (G, 3R, cols)
    xyz_t = xyz_t.reshape(G, cb, 3, _ROWS, cols).transpose(0, 2, 1, 3, 4)
    xyz_t = xyz_t.reshape(G, 3 * R, cols)

    kernel = functools.partial(_fps_kernel, npoint=npoint, n_valid=N,
                               fold_valid=fold_valid,
                               pair_argmax=pair_argmax,
                               carry_coords=carry_coords)
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, 3 * R, cols), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, npad), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, R, npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, cols), jnp.float32)],
        interpret=interpret,
    )(xyz_t)
    # scene s of program g broadcasts its value over rows [8s, 8s+8)
    out = out[:, ::_ROWS, :npoint]                    # (G, cb, npoint)
    out = out.reshape(Bp, npoint)[:B]
    return jax.lax.stop_gradient(out)

"""Ball query + grouping.

TPU-native replacements for ``ball_query_gpu.cu`` / ``group_points_gpu.cu``.

``ball_query`` reproduces the CUDA semantics exactly
(ball_query_gpu.cu:9-54): for every query center, the N source points are
scanned in index order and the first ``nsample`` with squared distance
strictly below radius² are kept; *all* slots are pre-filled with the first
hit's index, so when fewer than ``nsample`` points fall in the ball, padding
repeats the first neighbor; a center with no hits returns all-zeros (the
torch wrapper allocates the output with zeros).

Vectorized construction (sort-free): hits are packed into uint32 bitmask
words; a popcount prefix sum over the words locates, for every output slot
``s``, the word containing the (s+1)-th hit via a fused one-hot reduction
(each slot lies in exactly one word, so Σ value·I[contains] is exact), and a
5-step binary search over the selected word's bits yields the final index.
This replaces a hierarchical top-k chain and benches ~3.6x faster at sa1
shapes (B8: 161ms -> 45ms, vs a 35ms floor for the distance pass alone).
The (M, N) distance/hit matrix is never materialized — XLA fuses it into
the packing reduction.  An MXU variant of the slot decode (one-hot
selection as a batched dot, SCAN2CAP_BQ_DECODE=mxu) is kept as a measured
NEGATIVE result: 18.4 vs 12.6 ms at B16 in-jit — materializing the f32
one-hot operand costs more than the fused VPU masked-sums it replaces
(docs/TPU_DESIGN.md §9).

``group_points`` is a plain XLA gather; its scatter-add gradient
(group_points_gpu.cu:34-75) falls out of autodiff.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# "exact": CUDA-parity first-k in scan order (bitmask+popcount decode).
# "approx": lax.approx_min_k with 0.99 recall — kept for completeness, but
# NOTE: it was 1.7x faster than the EARLY hierarchical-top-k implementation
# and is now SLOWER than the optimized exact path; there is no reason to use
# it except for A/B experiments.
DEFAULT_BALL_QUERY_MODE = "exact"


def set_ball_query_mode(mode: str) -> None:
    global DEFAULT_BALL_QUERY_MODE
    assert mode in ("exact", "approx"), mode
    DEFAULT_BALL_QUERY_MODE = mode


def _pack_impl() -> str:
    """Hit-bitmask pack backend on TPU: "pallas" (fused dist+pack kernel,
    ops/pallas/ballquery.py) or "xla".  TRACE-TIME semantics like
    SCAN2CAP_BQ_DECODE below."""
    import os
    return os.environ.get("SCAN2CAP_BQ_PACK", "xla")


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _decode_impl() -> str:
    """Supergroup slot-decode backend: "vpu" (masked-sum passes, the
    measured winner) or "mxu" (batched one-hot dot, kept as the §9
    negative result).  Both are exact.

    TRACE-TIME semantics: the env var is read while tracing and is NOT
    part of the jit cache key — set SCAN2CAP_BQ_DECODE before the process
    first compiles a ball query; flipping it afterwards silently has no
    effect on already-compiled programs (A/B runs must use separate
    processes, as scripts/micro_bq_phases.py invocations do)."""
    import os
    return os.environ.get("SCAN2CAP_BQ_DECODE", "vpu")


def _decode_nth_set_bit(word: jax.Array, r: jax.Array) -> jax.Array:
    """Position of the (r+1)-th set bit of each uint32 ``word`` (vectorized
    5-step binary search on popcounts of the low half)."""
    base = jnp.zeros_like(r)
    cur = word
    for width in (16, 8, 4, 2, 1):
        low = cur & jnp.uint32((1 << width) - 1)
        c = jax.lax.population_count(low).astype(jnp.int32)
        go_high = c <= r
        r = jnp.where(go_high, r - c, r)
        base = jnp.where(go_high, base + width, base)
        cur = jnp.where(go_high, cur >> width, cur)
    return base


def _ball_query_chunk(new_xyz: jax.Array, xyz: jax.Array, radius2: float,
                      nsample: int, mode: str = "exact") -> jax.Array:
    """new_xyz: (M, 3), xyz: (N, 3) -> (M, nsample) int32."""
    M = new_xyz.shape[0]
    N = xyz.shape[0]
    # coordinate-wise diff form: same f32 arithmetic/order as the CUDA kernel
    # (a |c|²-2cx+|x|² matmul form loses boundary-precision parity), but as
    # three (M, N) elementwise passes — a jnp.sum over a stacked (M, N, 3)
    # reduces over a 3-wide minor axis, wasting 125 of 128 lanes (2x slower)
    dx = new_xyz[:, None, 0] - xyz[None, :, 0]
    dy = new_xyz[:, None, 1] - xyz[None, :, 1]
    dz = new_xyz[:, None, 2] - xyz[None, :, 2]
    d2 = dx * dx + dy * dy + dz * dz                                 # (M,N)
    hit = d2 < radius2

    if mode == "approx" and nsample <= N and N >= 4096:
        order = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        keyf = jnp.where(hit, order.astype(jnp.float32), jnp.float32(2 * N))
        vals, _ = jax.lax.approx_min_k(keyf, nsample, recall_target=0.99)
        cand = jnp.sort(vals.astype(jnp.int32), axis=1)  # restore scan order
        valid = cand < N
        idx = jnp.where(valid, cand, 0)
        first = jnp.where(valid[:, :1], idx[:, :1], 0)
        return jnp.where(valid, idx, first).astype(jnp.int32)

    # Exact first-k in scan order via bitmask + popcount-prefix decode.
    W = -(-N // 32)
    pad_n = W * 32 - N
    if pad_n:
        hit = jnp.pad(hit, ((0, 0), (0, pad_n)))
    bitpos = jax.lax.broadcasted_iota(jnp.uint32, (M, W, 32), 2)
    bits = jnp.where(hit.reshape(M, W, 32),
                     jnp.uint32(1) << bitpos, jnp.uint32(0))
    words = jnp.sum(bits, axis=-1, dtype=jnp.uint32)           # (M, W)
    pc = jax.lax.population_count(words).astype(jnp.int32)
    return _decode_first_k(words, pc, nsample)


def _decode_first_k(words: jax.Array, pc: jax.Array,
                    nsample: int) -> jax.Array:
    """Popcount-prefix slot decode: words (M, W) uint32 hit bitmasks in scan
    order + pc (M, W) per-word popcounts -> (M, nsample) int32 first-k hit
    indices with the CUDA padding semantics.  Shared by the XLA pack above
    and the Pallas fused dist+pack (ops/pallas/ballquery.py)."""
    M, W = words.shape
    cum = jnp.cumsum(pc, axis=-1)                              # inclusive
    total = cum[:, -1:]                                        # (M, 1)
    s_ids = jnp.arange(nsample, dtype=jnp.int32)               # (S,)

    if W > 128:
        # Supergroup decode: the one-level (M, S, W) one-hot pass dominates
        # the whole ball query at sa1 shapes (W=1250: ~12 of 21 ms at B16).
        # Group Q words into a superword; run the expensive comparisons over
        # the (M, S, W/Q) supergroup prefix sums, and select the containing
        # supergroup's Q candidate words with Q masked sums (TPU gathers cost
        # ~13 ns per slice, so one-hot selection beats take_along_axis here;
        # a 3-operand lax.sort compaction benches 3x worse).  ~3x fewer ops
        # than one-level; exact same output.
        Q = 16
        WG = -(-W // Q)
        pad_w = WG * Q - W
        if pad_w:
            words = jnp.pad(words, ((0, 0), (0, pad_w)))
            cum = jnp.pad(cum, ((0, 0), (0, pad_w)), mode="edge")
        wordsg = words.reshape(M, WG, Q)
        g_cum = cum[:, Q - 1::Q]                               # (M, WG) incl.
        g_excl = jnp.concatenate(
            [jnp.zeros((M, 1), jnp.int32), g_cum[:, :-1]], axis=1)

        le_g = g_cum[:, None, :] <= s_ids[None, :, None]       # (M, S, WG)
        contains_g = jnp.logical_and(
            g_excl[:, None, :] <= s_ids[None, :, None],
            jnp.logical_not(le_g))
        g_idx = jnp.minimum(jnp.sum(le_g.astype(jnp.int32), axis=-1), WG - 1)
        if _decode_impl() == "mxu":
            # MXU decode: one-hot selection IS a matmul — one batched
            # (S, WG) @ (WG, 1+2Q) dot extracts, per (m, s), the containing
            # supergroup's exclusive prefix and all Q candidate words,
            # replacing Q+1 VPU masked-sum passes over (M, S, WG).  The u32
            # words ride the f32 MXU as u16 lo/hi halves (<= 65535 is exact
            # in f32; the prefix counts are <= N < 2^24, also exact);
            # precision=HIGHEST pins a true-f32 dot (the FLOPs are trivial).
            # contains_g has at most one true per (m, s) — exactly zero for
            # padded slots, which reproduces the where-sum's 0 and keeps the
            # padding semantics.
            lo = (wordsg & jnp.uint32(0xFFFF)).astype(jnp.float32)
            hi = (wordsg >> 16).astype(jnp.float32)
            table = jnp.concatenate(
                [g_excl[..., None].astype(jnp.float32), lo, hi], axis=-1)
            sel = jnp.einsum("msg,mgk->msk", contains_g.astype(jnp.float32),
                             table, precision=jax.lax.Precision.HIGHEST)
            gexcl_s = sel[..., 0].astype(jnp.int32)
            cand = (sel[..., 1:1 + Q].astype(jnp.uint32)
                    | (sel[..., 1 + Q:].astype(jnp.uint32) << 16))
        else:
            gexcl_s = jnp.sum(jnp.where(contains_g, g_excl[:, None, :], 0),
                              axis=-1)
            cand = jnp.stack(
                [jnp.sum(jnp.where(contains_g, wordsg[:, None, :, q],
                                   jnp.uint32(0)), axis=-1, dtype=jnp.uint32)
                 for q in range(Q)], axis=-1)                  # (M, S, Q)
        r_s = s_ids[None, :] - gexcl_s                     # rank in supergroup

        pcq = jax.lax.population_count(cand).astype(jnp.int32)
        cumq = jnp.cumsum(pcq, axis=-1)                        # in-group incl.
        le2 = cumq <= r_s[:, :, None]                          # (M, S, Q)
        contains2 = jnp.logical_and(cumq - pcq <= r_s[:, :, None],
                                    jnp.logical_not(le2))
        w_in = jnp.minimum(jnp.sum(le2.astype(jnp.int32), axis=-1), Q - 1)
        excl2_s = jnp.sum(jnp.where(contains2, cumq - pcq, 0), axis=-1)
        word_s = jnp.sum(jnp.where(contains2, cand, jnp.uint32(0)),
                         axis=-1, dtype=jnp.uint32)
        bit = _decode_nth_set_bit(word_s, r_s - excl2_s)
        idx = (g_idx * Q + w_in) * 32 + bit
    else:
        excl = cum - pc                                        # hits before w
        # slot s lives in word w iff excl(w) <= s < cum(w); exactly one word
        # matches (when s < total hits), so Σ value·I[contains] selects
        # without a gather, and Σ I[cum<=s] counts the fully-consumed words =
        # word index.
        le = cum[:, None, :] <= s_ids[None, :, None]           # (M, S, W)
        contains = jnp.logical_and(excl[:, None, :] <= s_ids[None, :, None],
                                   jnp.logical_not(le))
        w_idx = jnp.sum(le.astype(jnp.int32), axis=-1)         # (M, S)
        excl_s = jnp.sum(jnp.where(contains, excl[:, None, :], 0), axis=-1)
        word_s = jnp.sum(jnp.where(contains, words[:, None, :],
                                   jnp.uint32(0)),
                         axis=-1, dtype=jnp.uint32)
        bit = _decode_nth_set_bit(word_s, s_ids[None, :] - excl_s)
        idx = jnp.minimum(w_idx, W - 1) * 32 + bit

    # slots past the hit count are padded with the first hit (slot 0); a row
    # with no hit at all keeps the CUDA wrapper's zero-filled output.
    valid = s_ids[None, :] < jnp.minimum(total, nsample)
    idx = jnp.where(valid, idx, 0)
    first = jnp.where(valid[:, :1], idx[:, :1], 0)
    return jnp.where(valid, idx, first).astype(jnp.int32)


def ball_query(xyz: jax.Array, new_xyz: jax.Array, radius: float,
               nsample: int, chunk: int = 512,
               mode: Optional[str] = None,
               pack: Optional[str] = None) -> jax.Array:
    """Dispatch wrapper so the module-level mode toggle and the pack-backend
    env knob are honored at trace time (set_ball_query_mode,
    SCAN2CAP_BQ_PACK)."""
    return _ball_query(xyz, new_xyz, radius, nsample, chunk,
                       mode or DEFAULT_BALL_QUERY_MODE,
                       pack or _pack_impl())


@functools.partial(jax.jit,
                   static_argnames=("radius", "nsample", "chunk", "mode",
                                    "pack"))
def _ball_query(xyz: jax.Array, new_xyz: jax.Array, radius: float,
                nsample: int, chunk: int = 512,
                mode: str = "exact", pack: str = "xla") -> jax.Array:
    """Radius neighbor search with CUDA-parity padding semantics.

    Args:
      xyz: (B, N, 3) source points.
      new_xyz: (B, M, 3) query centers.
      radius: ball radius.
      nsample: neighbors per center (static).
      chunk: query-axis chunk size bounding the (chunk, N) distance tile.

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    B, M, _ = new_xyz.shape
    N = xyz.shape[1]
    radius2 = float(radius) ** 2
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)

    if mode == "exact" and pack == "pallas" and _on_tpu() and N >= 4096:
        # fused Pallas dist+pack (words + popcounts), shared XLA decode
        from scan2cap_tpu.ops.pallas.ballquery import ball_query_pack_pallas
        words, counts = ball_query_pack_pallas(xyz, new_xyz, radius2)
        W = -(-N // 32)
        words, counts = words[..., :W], counts[..., :W]

        def decode_chunked(words_b, counts_b):
            if M <= chunk:
                return _decode_first_k(words_b, counts_b, nsample)
            pad = (-M) % chunk
            w = jnp.pad(words_b, ((0, pad), (0, 0)))
            c = jnp.pad(counts_b, ((0, pad), (0, 0)))
            nch = (M + pad) // chunk
            w = w.reshape(nch, chunk, W)
            c = c.reshape(nch, chunk, W)
            out = jax.lax.map(
                lambda wc: _decode_first_k(wc[0], wc[1], nsample), (w, c))
            return out.reshape(M + pad, nsample)[:M]

        return jax.lax.stop_gradient(jax.vmap(decode_chunked)(words, counts))

    if M <= chunk:
        fn = functools.partial(_ball_query_chunk, radius2=radius2,
                               nsample=nsample, mode=mode)
        return jax.lax.stop_gradient(jax.vmap(fn)(new_xyz, xyz))

    pad = (-M) % chunk
    nq = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    nq = nq.reshape(B, (M + pad) // chunk, chunk, 3)

    def per_batch(nq_b, xyz_b):
        def per_chunk(q):
            return _ball_query_chunk(q, xyz_b, radius2, nsample, mode)
        return jax.lax.map(per_chunk, nq_b)

    out = jax.vmap(per_batch)(nq, xyz)                 # (B, nchunk, chunk, S)
    out = out.reshape(B, M + pad, nsample)[:, :M]
    return jax.lax.stop_gradient(out)


def group_points(features: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather neighborhood features.

    Args:
      features: (B, N, C).
      idx: (B, M, S) int32 indices into N.

    Returns:
      (B, M, S, C).
    """
    B, N, C = features.shape
    _, M, S = idx.shape
    flat = idx.reshape(B, M * S)
    out = jnp.take_along_axis(features, flat[..., None], axis=1)
    return out.reshape(B, M, S, C)


def query_and_group(
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: Optional[jax.Array],
    radius: float,
    nsample: int,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    ret_grouped_xyz: bool = False,
):
    """Ball query + relative-coordinate grouping (pointnet2_utils.py:294-377).

    Matches ``QueryAndGroup``: grouped xyz is recentred on the query point and
    optionally divided by the radius; point features are concatenated after
    the 3 xyz channels (channels-last here).

    Returns (B, M, S, 3+C) [or (B, M, S, C)], plus grouped_xyz if requested.
    """
    idx = ball_query(xyz, new_xyz, radius, nsample)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_features = group_points(features, idx)
        new_features = (
            jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
            if use_xyz else grouped_features
        )
    else:
        if not use_xyz:
            raise ValueError("cannot have no features and use_xyz=False")
        new_features = grouped_xyz
    if ret_grouped_xyz:
        return new_features, grouped_xyz
    return new_features


def group_all(
    xyz: jax.Array,
    features: Optional[jax.Array],
    use_xyz: bool = True,
):
    """Single-group "grouping" over the whole cloud (pointnet2_utils.py:379-424
    ``GroupAll`` — the npoint=None branch of the SA modules; absolute
    coordinates, no recentring).

    Returns (B, 1, N, 3+C) channels-last [or (B, 1, N, C) if use_xyz=False].
    """
    grouped_xyz = xyz[:, None, :, :]                     # (B, 1, N, 3)
    if features is not None:
        grouped_features = features[:, None, :, :]       # (B, 1, N, C)
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
        return grouped_features
    if not use_xyz:
        raise ValueError("cannot have no features and use_xyz=False")
    return grouped_xyz

"""Root-cause the Mosaic-only pallas-pack ball-query parity mismatch.

The round-3 hardware parity gate (scripts/tpu_parity_check.py) flagged
`pallas-pack ball_query mismatch at (2, 40000, 512, 64)` while CPU
interpret mode is green and the XLA pack is exact.  Both paths evaluate
the same f32 expression `dx*dx + dy*dy + dz*dz < r2`
(ops/grouping.py:109-110 vs ops/pallas/ballquery.py:78-80), so the only
candidate is instruction-level rounding — Mosaic contracting the
multiply-add chain into FMAs (keeping product bits XLA's separate
mul+add rounds away) flips `hit` for points whose d2 sits within an ULP
of r2.

This script reproduces the parity input, diffs the two packs bit by bit,
and for every disagreeing (b, m, point) prints the f64 distance-to-
boundary in units of f32 ULP at r2.  Verdict criteria:

- all mismatched points within a few ULP of d2 == r2  -> confirmed
  boundary FMA rounding (benign for training, but breaks the bit-exact
  CUDA-parity guarantee the exact mode promises -> kernel stays opt-in);
- any mismatch far from the boundary -> real pack bug, dig further.

Run on the real TPU (PYTHONPATH must include /root/.axon_site).
"""

import numpy as np
import jax
import jax.numpy as jnp


def main():
    print("devices:", jax.devices())
    from scan2cap_tpu.ops.grouping import _ball_query_chunk  # noqa: F401
    from scan2cap_tpu.ops.pallas.ballquery import ball_query_pack_pallas

    B, N, M, ns, r = 2, 40000, 512, 64, 0.2  # the failing parity config
    rng = np.random.RandomState(1)           # same seed as tpu_parity_check
    xyz = (rng.rand(B, N, 3).astype(np.float32) * 2 - 1)
    new_xyz = xyz[:, :M] + rng.randn(B, M, 3).astype(np.float32) * 0.01
    r2 = r * r

    jx = jnp.asarray(xyz)
    jq = jnp.asarray(new_xyz)

    # XLA pack words, rebuilt standalone with the identical expression.
    @jax.jit
    def xla_words(q, p):
        d = q[:, :, None, :] - p[:, None, :, :]
        d2 = (d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1]
              + d[..., 2] * d[..., 2])
        hit = d2 < r2                                     # (B, M, N)
        Wp = -(-N // 32)
        pad = Wp * 32 - N
        h = jnp.pad(hit, ((0, 0), (0, 0), (0, pad)))
        h = h.reshape(B, M, Wp, 32).astype(jnp.uint32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        return (h << shifts).sum(-1, dtype=jnp.uint32)    # (B, M, Wp)

    wx = np.asarray(xla_words(jq, jx))
    wp_words, _ = ball_query_pack_pallas(jx, jq, r2)
    wp = np.asarray(wp_words)[:, :, : wx.shape[2]]

    diff = wx ^ wp
    bm = np.nonzero(diff.any(axis=2))
    total_bits = int(np.unpackbits(
        diff.view(np.uint8), bitorder="little").sum())
    print(f"mismatched (b,m) rows: {len(bm[0])} / {B * M}; "
          f"total differing bits: {total_bits}")

    # f64 ground truth distance for every differing bit
    ulps = []
    for b, m in zip(*bm):
        rows = np.nonzero(diff[b, m])[0]
        for w in rows:
            for bit in range(32):
                if (diff[b, m, w] >> bit) & 1:
                    n = int(w) * 32 + bit
                    d64 = float(((xyz[b, n].astype(np.float64)
                                  - new_xyz[b, m].astype(np.float64)) ** 2
                                 ).sum())
                    ulp = np.spacing(np.float32(r2))
                    k = (d64 - r2) / ulp
                    ulps.append(k)
                    xla_hit = bool((wx[b, m, w] >> bit) & 1)
                    print(f"  b={b} m={m} n={n}: d2-r2 = {k:+.3f} ulp(f32)"
                          f"  xla_hit={xla_hit} pallas_hit={not xla_hit}")
    if ulps:
        a = np.abs(np.array(ulps))
        print(f"|d2-r2| in f32 ulps: max {a.max():.3f}, "
              f"median {np.median(a):.3f}")
        print("VERDICT:", "boundary rounding (all within ~4 ulp)"
              if a.max() < 4 else "NOT boundary-local -> real bug")
    else:
        print("no mismatch reproduced (pack words identical)")


if __name__ == "__main__":
    main()

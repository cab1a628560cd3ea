"""Does the gather-lean projection need precision=HIGHEST on TPU?

XLA's DEFAULT f32 dot on TPU is a single bf16 pass (measured via the
three_nn bug, TPU_DESIGN §5).  The gather-lean SA path projects ABSOLUTE
room-scale coordinates and subtracts the center projection afterwards —
cancellation amplifies the bf16 rounding relative to the reference's
relative-coordinates-first form.  This micro measures, on device:
  * lean[DEFAULT] and lean[HIGHEST] vs the naive relative-first form at
    HIGHEST (the reference's arithmetic), at sa1 shapes;
  * the cost of HIGHEST on the projection matmul at B16.

Run: python scripts/micro_projection_precision.py

RESULT (bf16-dot emulation on CPU, confirmed design call): lean[DEFAULT]
mean rel error 0.22% vs naive-relative-first[DEFAULT] 0.21% — the
decomposition does NOT amplify default-precision rounding (both are set
by feature-scale dot terms), so the projection stays at DEFAULT precision.
See docs/TPU_DESIGN.md §5 for the refined rule.
"""
import sys, time, functools, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import numpy as np, jax, jax.numpy as jnp
from jax.lax import Precision

B, N, M, S, Cin, W0 = 2, 40000, 512, 64, 135, 64

@functools.partial(jax.jit, static_argnames=("prec",))
def probe(key, prec):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    xyz = jax.random.uniform(k1, (B, N, 3), minval=-4.0, maxval=4.0)
    feats = jax.random.normal(k2, (B, N, Cin - 3)) * 0.1
    w0 = jax.random.normal(k3, (Cin, W0)) / np.sqrt(Cin)
    idx = jax.random.randint(k4, (B, M, S), 0, N)
    ctr = jax.random.randint(k5, (B, M), 0, N)
    cat = jnp.concatenate([xyz / 0.2, feats], -1)
    ct_xyz = jnp.take_along_axis(xyz, ctr[..., None], axis=1) / 0.2
    ct_in = jnp.concatenate([ct_xyz, jnp.zeros((B, M, Cin - 3))], -1)

    proj = jnp.matmul(cat, w0, precision=prec)
    ct = jnp.matmul(ct_in, w0, precision=prec)
    g = jnp.take_along_axis(proj, idx.reshape(B, M * S)[..., None], axis=1)
    lean = g.reshape(B, M, S, W0) - ct[:, :, None, :]

    gat = jnp.take_along_axis(cat, idx.reshape(B, M * S)[..., None], axis=1)
    rel = gat.reshape(B, M, S, Cin) - ct_in[:, :, None, :]
    ref = jnp.matmul(rel, w0, precision=Precision.HIGHEST)

    d = jnp.abs(lean - ref)
    return jnp.max(d), jnp.mean(d), jnp.mean(jnp.abs(ref))

key = jax.random.PRNGKey(0)
for name, prec in (("DEFAULT", Precision.DEFAULT), ("HIGHEST", Precision.HIGHEST)):
    mx, mn, sc = (float(x) for x in probe(key, prec))
    print(f"lean[{name}]: max {mx:.5f} mean {mn:.6f} signal {sc:.4f} rel {mn/sc:.4f}", flush=True)

# cost of HIGHEST on the projection matmul at sa1 scale (B16)
@functools.partial(jax.jit, static_argnames=("prec",))
def many(key, prec):
    cat = jax.random.normal(key, (16, N, Cin))
    w0 = jax.random.normal(jax.random.fold_in(key, 1), (Cin, W0)) * 0.1
    def body(acc, i):
        p = jnp.matmul(cat + acc * 1e-9, w0, precision=prec)
        return jnp.sum(p) * 1e-20, None
    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(8))
    return acc
for name, prec in (("DEFAULT", Precision.DEFAULT), ("HIGHEST", Precision.HIGHEST)):
    float(many(key, prec))
    ts = []
    for s_i in range(3):
        # fresh key per timed call: identical dispatches can be served from
        # a cache on this host (CLAUDE.md measurement notes)
        k = jax.random.fold_in(key, s_i + 1)
        t0 = time.perf_counter()
        float(many(k, prec))
        ts.append(time.perf_counter() - t0)
    print(f"B16 projection matmul x8 [{name}]: "
          f"{min(ts)*1e3:.1f} ms", flush=True)

"""Probe Mosaic int32 shift/combine formulations after f32->int32 cvt.

micro_mxu_pack_probe.py proved the MXU dot output is exactly right and
the `lo | (hi << 16)` post-chain is what corrupts the packed word on
hardware: hi<<16 flushes to 0 when the shifted value < 2^23 and wraps
garbage when hi > 32768 (it is only correct when the shifted value has
f32 exponent in [23, 31] — the signature of the cvt+shift being folded
into a float-scaled conversion).  This probe A/Bs candidate combines on
the same cvt-derived operands to find one Mosaic lowers correctly:

  v0: lo | (hi << 16)            (production — known broken)
  v1: lo | (hi * 65536)          (int multiply instead of shift)
  v2: lo + (hi << 16)            (add instead of or)
  v3: lo | ((hi << 8) << 8)      (split shift)
  v4: shift of an int32 INPUT (no cvt) — isolates cvt-fusion vs shift
  v5: lo | (hi << jnp.full-vector 16)  (vector shift operand)

Run on the real TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scan2cap_tpu.ops.pallas.ballquery import _pack_matrix, _MQ, _NC


def _kernel(hit_ref, ints_ref, v0, v1, v2, v3, v4, v5):
    P = _pack_matrix()
    packed = jnp.dot(hit_ref[0], P, preferred_element_type=jnp.float32)
    lo = packed[:, 0:16].astype(jnp.int32)
    hi = packed[:, 16:32].astype(jnp.int32)
    z = jnp.zeros((_MQ, 112), jnp.int32)

    def put(ref, w16):
        ref[0, :, 0:16] = w16
        ref[0, :, 16:128] = z

    put(v0, lo | (hi << 16))
    put(v1, lo | (hi * 65536))
    put(v2, lo + (hi << 16))
    put(v3, lo | ((hi << 8) << 8))
    put(v4, ints_ref[0, :, 0:16] << 16)
    put(v5, lo | (hi << jnp.full(hi.shape, 16, jnp.int32)))


@jax.jit
def probe(hit, ints):
    return pl.pallas_call(
        _kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, _MQ, _NC), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _MQ, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, _MQ, 128), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)] * 6,
        out_shape=[jax.ShapeDtypeStruct((1, _MQ, 128), jnp.int32)] * 6,
    )(hit, ints)


def main():
    print("devices:", jax.devices())
    vals = [1, 2, 4, 64, 127, 128, 129, 255, 256, 257, 520, 4096,
            32768, 32769, 65535]
    hit = np.zeros((1, _MQ, _NC), np.float32)
    ints = np.zeros((1, _MQ, 128), np.int32)
    for r, v in enumerate(vals):
        for b in range(16):
            if (v >> b) & 1:
                hit[0, r, b] = 1.0
                hit[0, r, 16 + b] = 1.0
        ints[0, r, 0:16] = v
    outs = [np.asarray(x) for x in probe(jnp.asarray(hit),
                                         jnp.asarray(ints))]
    names = ["v0 or-shift", "v1 or-mul", "v2 add-shift", "v3 split-shift",
             "v4 input-shift", "v5 vec-shift"]
    print(f"{'target':>7} " + " ".join(f"{n:>14}" for n in names))
    good = [True] * 6
    for r, v in enumerate(vals):
        expect = (v | (v << 16)) & 0xFFFFFFFF
        expect4 = (v << 16) & 0xFFFFFFFF
        row = []
        for i, o in enumerate(outs):
            w = int(o[0, r, 0]) & 0xFFFFFFFF
            want = expect4 if i == 4 else expect
            ok = w == want
            good[i] &= ok
            row.append("ok" if ok else f"x{w:08x}")
        print(f"{v:>7} " + " ".join(f"{c:>14}" for c in row))
    print("ALL-CORRECT variants:",
          [n for n, g in zip(names, good) if g] or "NONE")


if __name__ == "__main__":
    main()

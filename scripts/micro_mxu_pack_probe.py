"""Minimal on-device probe for the Mosaic MXU pack-exactness failure.

The round-3 hardware parity debug (scripts/micro_bq_parity_debug.py, log in
docs/measurements/r3_tpu_queue/) showed the Pallas fused pack losing ~87%
of hit bits at word-bit positions 16..22 — i.e. HI half-word values < 128
come back 0, while LO half-word columns are always exact.  Since a
half-word with a single hit is a pure power of two (exactly representable
in bf16), this cannot be operand truncation; something about the hi
columns (16:32 of the 48-wide MXU output) loses small values.

This probe bypasses the distance pass entirely: it feeds crafted 0/1 hit
matrices through the SAME (256,512)@(512,48) dot inside a Pallas kernel
and reads BOTH the raw f32 `packed` output and the in-kernel
cast/shift/OR word, separating:

  (a) the dot itself wrong (raw f32 already missing the value), vs
  (b) the int cast / shift / OR postprocessing wrong.

Run on the real TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scan2cap_tpu.ops.pallas.ballquery import _pack_matrix, _MQ, _NC


def _probe_kernel(hit_ref, raw_ref, word_ref):
    P = _pack_matrix()
    hit = hit_ref[0]
    packed = jnp.dot(hit, P, preferred_element_type=jnp.float32)
    raw_ref[0, :, 0:48] = packed
    raw_ref[0, :, 48:128] = jnp.zeros((_MQ, 80), jnp.float32)
    lo = packed[:, 0:16].astype(jnp.int32)
    hi = packed[:, 16:32].astype(jnp.int32)
    word = lo | (hi << 16)                       # production post-chain
    word_ref[0, :, 0:16] = word
    word_ref[0, :, 16:128] = jnp.zeros((_MQ, 112), jnp.int32)


@jax.jit
def probe(hit):
    return pl.pallas_call(
        _probe_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, _MQ, _NC), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, _MQ, 128), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((1, _MQ, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, _MQ, 128), jnp.int32),
        ],
    )(hit)


def main():
    print("devices:", jax.devices())
    # Row r of the hit matrix: bit pattern `vals[r]` replicated into BOTH
    # the lo half (points 0..15 of word 0) and the hi half (points 16..31).
    vals = [1, 2, 4, 64, 127, 128, 129, 255, 256, 257, 520, 4096,
            32768, 32769, 65535]
    hit = np.zeros((1, _MQ, _NC), np.float32)
    for r, v in enumerate(vals):
        for b in range(16):
            if (v >> b) & 1:
                hit[0, r, b] = 1.0          # lo half of word 0
                hit[0, r, 16 + b] = 1.0     # hi half of word 0
    raw, word = (np.asarray(x) for x in probe(jnp.asarray(hit)))
    print(f"{'target':>7} {'raw_lo':>9} {'raw_hi':>9} {'raw_cnt':>8} "
          f"{'word':>12} {'expect_word':>12}")
    nbad = 0
    for r, v in enumerate(vals):
        expect_word = (v | (v << 16)) & 0xFFFFFFFF
        w = int(word[0, r, 0]) & 0xFFFFFFFF
        ok = (w == expect_word)
        nbad += 0 if ok else 1
        print(f"{v:>7} {raw[0, r, 0]:>9.1f} {raw[0, r, 16]:>9.1f} "
              f"{raw[0, r, 32]:>8.1f} {w:>12} {expect_word:>12}  "
              f"{'ok' if ok else '<-- WRONG'}")
    print(f"wrong rows: {nbad}/{len(vals)}")
    stray = max(np.abs(raw[0, : len(vals), 1:16]).max(),
                np.abs(raw[0, : len(vals), 17:32]).max())
    print("stray mass in other word columns:", float(stray))


if __name__ == "__main__":
    main()

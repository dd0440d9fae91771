#!/usr/bin/env python3
"""Calibrate the Mosaic inner-loop cost for a dense per-8x8-block MC
kernel shape that satisfies TPU dynamic-index constraints:

  - dynamic sublane starts must be multiples of 8 -> align down, roll
  - dynamic lane starts must be multiples of 128  -> align down, roll
  - dynamic rotate is 32-bit only                 -> cast u8->i32 first
  - stores: loop over 128-lane groups (fori, multiple-of proof via hint),
    16 blocks per group placed at static lane offsets, one store/group

Per block: one aligned (16,256) u8 load from the band, cast, two dynamic
rolls (sub-8 row + sub-128 lane remainders), slice 8x8, place, accumulate.

Usage: python tools/profile_mosaic_dyn.py [rows]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    GROUPS, PERG = 15, 16            # 1920 px = 15 x (16 blocks of 8)
    BANDH, BANDW = 704, 2048
    NB = ROWS * GROUPS * PERG

    rng = np.random.RandomState(0)
    band = rng.randint(0, 255, (4, BANDH, BANDW), np.int32).astype(np.uint8)
    py = rng.randint(0, BANDH - 24, NB).astype(np.int32)
    px = rng.randint(0, BANDW - 264, NB).astype(np.int32)
    pln = rng.randint(0, 4, NB).astype(np.int32)

    def kernel(pyr, pxr, plr, band_ref, out_ref):
        r = pl.program_id(0)

        def group(g, _):
            acc = jnp.zeros((8, 128), jnp.int32)
            base = (r * GROUPS + g) * PERG
            for j in range(PERG):
                i = base + j
                p, y, x = plr[i], pyr[i], pxr[i]
                ya = pl.multiple_of((y >> 3) << 3, 8)
                xa = pl.multiple_of((x >> 7) << 7, 128)
                w = band_ref[p, pl.ds(ya, 16), pl.ds(xa, 256)]
                w = w.astype(jnp.int32)
                w = pltpu.roll(w, -(y & 7), 0)
                w = pltpu.roll(w, -(x & 127), 1)
                blk = w[:8, :128]      # cols 0..7 are the payload
                # place at static lane j*8: mask the rolled payload in
                blk = pltpu.roll(blk, j * 8, 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                sel = (lane >= j * 8) & (lane < j * 8 + 8)
                acc = jnp.where(sel, blk, acc)
            out_ref[pl.ds(r * 8, 8), pl.ds(g * 128, 128)] = \
                acc.astype(jnp.uint8)
            return 0

        jax.lax.fori_loop(0, GROUPS, group, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS * 8, 1920), jnp.uint8),
        grid_spec=grid_spec,
    ))

    args = (jnp.asarray(py), jnp.asarray(px), jnp.asarray(pln),
            jnp.asarray(band))
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(out.ravel()[0])
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    REP = 20
    t0 = time.perf_counter()
    for _ in range(REP):
        out = f(*args)
    np.asarray(out.ravel()[0])
    dt = (time.perf_counter() - t0) / REP
    print(f"NB={NB}: {dt*1e3:.2f} ms/call = {dt/NB*1e9:.0f} ns/block",
          flush=True)

    # correctness spot check
    o = np.asarray(out)
    for t in range(50):
        i = rng.randint(0, NB)
        r, rem = divmod(i, GROUPS * PERG)
        g, j = divmod(rem, PERG)
        exp = band[pln[i], py[i]:py[i]+8, px[i]:px[i]+8]
        got = o[r*8:r*8+8, g*128+j*8:g*128+j*8+8]
        assert np.array_equal(exp, got), (i, exp, got)
    print("spot check ok", flush=True)


if __name__ == "__main__":
    main()

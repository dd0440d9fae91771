#!/usr/bin/env python3
"""Mosaic capability probes for the Pallas MC kernel design.

Questions (each independent; failures print and continue):
  A. SMEM scalar-prefetch capacity: can we prefetch ~1.5 MB of per-cell
     params (130k cells x 3 int32) for a dense 4x4-cell 1080p kernel?
  B. Dynamic scalar reads from a VMEM int32 ref (param table in VMEM
     instead of SMEM) - compiles? cost?
  C. Two-load+average per cell (half-pel plane pair) at 4x4 granularity,
     the real MC shape: cost per cell.
  D. A ~70 MB uint8 band as a whole-array VMEM block (S=8 slots x 4
     half-pel planes at 1080p): compiles under the scoped-VMEM limit?

Usage: python tools/probe_mosaic_caps.py [A|B|C|D ...]  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    np.asarray(x.ravel()[0])


def probe_A():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for n in (130_560, 261_120):
        params = [jnp.arange(n, dtype=jnp.int32) for _ in range(3)]

        def kernel(p0, p1, p2, out_ref):
            i = pl.program_id(0)
            out_ref[0, 0] = p0[i] + p1[n - 1 - i] + p2[i // 2]

        try:
            f = jax.jit(pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3, grid=(4,),
                    in_specs=[],
                    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM)),
            ))
            out = f(*params)
            _sync(out)
            print(f"A: prefetch 3x{n} int32 ({3*n*4/1e6:.1f} MB) OK",
                  flush=True)
        except Exception as e:
            print(f"A: prefetch 3x{n} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            break


def probe_B():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 130_560
    tab = jnp.arange(N, dtype=jnp.int32).reshape(-1, 128)

    def kernel(tab_ref, out_ref):
        def body(i, acc):
            # dynamic scalar read from a VMEM ref
            return acc + tab_ref[i % (N // 128), i % 128]
        out_ref[0, 0] = jax.lax.fori_loop(0, 1024, body, 0)

    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ))
        out = f(tab)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(tab)
        _sync(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"B: VMEM dynamic scalar read OK, {dt/1024*1e9:.0f} ns/read",
              flush=True)
    except Exception as e:
        print(f"B: VMEM scalar read FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


def probe_C():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # dense 4x4 cells at 1080p: 480x272 cells; out (8,128) group = 2 cell
    # rows x 32 cells = 64 cells; band = 32 planes (8 slots x 4 halfpel)
    # at a reduced size so the probe compiles fast; per cell TWO dynamic
    # loads + avg.  Params arrive as per-grid-row SMEM blocks (pipelined),
    # packed one i32 per load: p(5b)<<22 | y(11b)<<11 | x(11b).
    CROWS, CCOLS = 68, 480          # quarter of 1080p cell rows
    BANDH, BANDW = 704, 2048
    NPL = 32
    NB = CROWS * CCOLS
    GROUPS = CCOLS // 32

    rng = np.random.RandomState(0)
    band = rng.randint(0, 255, (NPL, BANDH, BANDW), np.int32)
    band = band.astype(np.uint8)
    p1 = rng.randint(0, NPL, NB).astype(np.int32)
    y1 = rng.randint(0, BANDH - 24, NB).astype(np.int32)
    x1 = rng.randint(0, BANDW - 264, NB).astype(np.int32)
    p2 = rng.randint(0, NPL, NB).astype(np.int32)
    y2 = rng.randint(0, BANDH - 24, NB).astype(np.int32)
    x2 = rng.randint(0, BANDW - 264, NB).astype(np.int32)
    pk1 = ((p1 << 22) | (y1 << 11) | x1).reshape(CROWS // 2, 1, 2 * CCOLS)
    pk2 = ((p2 << 22) | (y2 << 11) | x2).reshape(CROWS // 2, 1, 2 * CCOLS)

    def load44(band_ref, pk):
        p, y, x = pk >> 22, (pk >> 11) & 0x7FF, pk & 0x7FF
        ya = pl.multiple_of((y >> 3) << 3, 8)
        xa = pl.multiple_of((x >> 7) << 7, 128)
        w = band_ref[p, pl.ds(ya, 16), pl.ds(xa, 256)].astype(jnp.int32)
        w = pltpu.roll(w, -(y & 7), 0)
        return pltpu.roll(w, -(x & 127), 1)

    def kernel(pk1r, pk2r, band_ref, out_ref):
        def group(g, _):
            acc = jnp.zeros((8, 128), jnp.int32)
            base = g * 32
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            for half in range(2):           # 2 cell rows per 8-sublane out
                for j in range(32):
                    i = base + half * CCOLS + j
                    a = load44(band_ref, pk1r[0, 0, i])
                    b = load44(band_ref, pk2r[0, 0, i])
                    v = (a + b + 1) >> 1
                    blk = pltpu.roll(v[:8, :128], j * 4, 1)
                    if half:
                        blk = pltpu.roll(blk, 4, 0)
                    sel = ((lane >= j * 4) & (lane < j * 4 + 4)
                           & (sub >= half * 4) & (sub < half * 4 + 4))
                    acc = jnp.where(sel, blk, acc)
            out_ref[:, pl.ds(g * 128, 128)] = acc.astype(jnp.uint8)
            return 0

        jax.lax.fori_loop(0, GROUPS, group, 0)

    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((CROWS * 4 // 8 * 8, CCOLS * 4),
                                       jnp.uint8),
        grid=(CROWS // 2,),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * CCOLS), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2 * CCOLS), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((NPL, BANDH, BANDW), lambda r: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, CCOLS * 4), lambda r: (r, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    ))
    args = [jnp.asarray(a) for a in (pk1, pk2, band)]
    t0 = time.perf_counter()
    out = f(*args)
    _sync(out)
    print(f"C: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    REP = 20
    t0 = time.perf_counter()
    for _ in range(REP):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / REP
    print(f"C: NB={NB} 2-load 4x4 cells: {dt*1e3:.2f} ms = "
          f"{dt/NB*1e9:.0f} ns/cell "
          f"(1080p luma est {dt/NB*1e9*480*272/1e6:.1f} ms)", flush=True)
    o = np.asarray(out)
    for t in range(50):
        i = rng.randint(0, NB)
        r2, j = divmod(i, CCOLS)
        a = band[p1[i], y1[i]:y1[i]+4, x1[i]:x1[i]+4].astype(np.int32)
        b = band[p2[i], y2[i]:y2[i]+4, x2[i]:x2[i]+4].astype(np.int32)
        exp = (a + b + 1) >> 1
        got = o[r2*4:r2*4+4, j*4:j*4+4]
        assert np.array_equal(exp, got), (i, exp, got)
    print("C: spot check ok", flush=True)


def probe_D():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NPL, BANDH, BANDW = 32, 1128, 1960       # 70.7 MB
    band = jnp.zeros((NPL, BANDH, BANDW), jnp.uint8)

    def kernel(band_ref, out_ref):
        out_ref[...] = band_ref[7, pl.ds(8, 8), pl.ds(128, 128)]

    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        out = f(band)
        _sync(out)
        print(f"D: {band.nbytes/1e6:.0f} MB VMEM band OK", flush=True)
    except Exception as e:
        print(f"D: 70MB band FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["A", "B", "C", "D"]
    for w in which:
        globals()[f"probe_{w}"]()

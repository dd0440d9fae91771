#!/usr/bin/env python3
"""Per-stage device profiling at 1080p geometry on the real TPU.

Times each device stage (residual+MC dense pass, intra wavefront, deblock
wavefront) for both the XLA sheared-scan path and the Pallas single-kernel
path, and checks Pallas vs XLA bit-exactness on synthetic planes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    from __graft_entry__ import _example_planes
    from edge264_tpu.ops import jaxdec as J
    from edge264_tpu.ops.pallas_deblock import deblock_pallas
    from edge264_tpu.ops.pallas_intra import intra_pallas

    mbW, mbH = (120, 68) if len(sys.argv) < 2 else map(int, sys.argv[1:3])
    print(f"geometry {mbW}x{mbH} on {jax.devices()[0]}", flush=True)
    p = _example_planes(mbW, mbH)
    p = {k: v.astype(jnp.int32) for k, v in p.items()}
    sm4 = jnp.full((6, 16), 16, jnp.int32)
    sm8 = jnp.full((6, 64), 16, jnp.int32)
    norm4 = jnp.asarray(J._o.NORM_ADJUST_4x4.reshape(6, 16))
    norm8 = jnp.asarray(J._o.NORM_ADJUST_8x8.reshape(6, 64))

    @jax.jit
    def residual(p):
        return J.residual_frame(p, sm4, sm8, norm4, norm8, True)

    t0 = time.perf_counter()
    dt, (res_y, res_cb, res_cr) = timeit(residual, p)
    print(f"residual: {dt*1e3:.2f} ms (compile {time.perf_counter()-t0:.1f}s)",
          flush=True)

    y0 = jnp.zeros((16 * mbH, 16 * mbW), jnp.int32)
    c0 = jnp.zeros((8 * mbH, 8 * mbW), jnp.int32)

    @jax.jit
    def intra_xla(y, cb, cr, ry, rcb, rcr, p):
        return J.intra_scan_sheared(y, cb, cr, ry, rcb, rcr, p, mbW, mbH)

    @jax.jit
    def intra_pl(y, cb, cr, ry, rcb, rcr, p):
        return intra_pallas(y, cb, cr, ry, rcb, rcr, p, mbW, mbH)

    t0 = time.perf_counter()
    dt, out_x = timeit(intra_xla, y0, c0, c0, res_y, res_cb, res_cr, p, n=5)
    print(f"intra XLA scan: {dt*1e3:.2f} ms "
          f"(compile {time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    try:
        dt, out_p = timeit(intra_pl, y0, c0, c0, res_y, res_cb, res_cr, p, n=5)
        print(f"intra Pallas:   {dt*1e3:.2f} ms "
              f"(compile {time.perf_counter()-t0:.1f}s)", flush=True)
        for a, b, name in zip(out_x, out_p, "y cb cr".split()):
            same = bool((np.asarray(a) == np.asarray(b)).all())
            print(f"  intra {name} bit-exact: {same}", flush=True)
            if not same:
                d = np.asarray(a) != np.asarray(b)
                print(f"    {d.sum()} diffs, first at {np.argwhere(d)[:3]}")
    except Exception as e:
        print(f"intra Pallas FAILED: {type(e).__name__}: {e}", flush=True)

    yx = out_x[0]

    @jax.jit
    def bs(p):
        return J.deblock_bs(p)

    dt, (bs_v, bs_h) = timeit(bs, p)
    print(f"deblock bS: {dt*1e3:.2f} ms", flush=True)

    @jax.jit
    def deb_xla(y, cb, cr, p, bs_v, bs_h):
        return J.deblock_scan(y, cb, cr, p, bs_v, bs_h, mbW, mbH)

    @jax.jit
    def deb_pl(y, cb, cr, p, bs_v, bs_h):
        return deblock_pallas(y, cb, cr, p, bs_v, bs_h, mbW, mbH)

    t0 = time.perf_counter()
    dt, dx = timeit(deb_xla, yx, out_x[1], out_x[2], p, bs_v, bs_h, n=5)
    print(f"deblock XLA scan: {dt*1e3:.2f} ms "
          f"(compile {time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    try:
        dt, dp = timeit(deb_pl, yx, out_x[1], out_x[2], p, bs_v, bs_h, n=5)
        print(f"deblock Pallas:   {dt*1e3:.2f} ms "
              f"(compile {time.perf_counter()-t0:.1f}s)", flush=True)
        for a, b, name in zip(dx, dp, "y cb cr".split()):
            same = bool((np.asarray(a) == np.asarray(b)).all())
            print(f"  deblock {name} bit-exact: {same}", flush=True)
    except Exception as e:
        print(f"deblock Pallas FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Lockstep-batch amortization on the real TPU: per-frame time of the
batched Pallas wavefront kernels at K = 1/2/4/8, 1080p geometry."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    # per-call blocking: the axon transport reports async completions
    # early, so amortized-block loops under-measure
    best = 1e30
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from __graft_entry__ import _example_planes
    from edge264_tpu.ops.pallas_deblock import deblock_pallas_batch
    from edge264_tpu.ops.pallas_intra import intra_pallas_batch
    import edge264_tpu.ops.jaxdec as J

    mbW, mbH = 120, 68
    p1 = {k: v.astype(jnp.int32)
          for k, v in _example_planes(mbW, mbH).items()}
    rng = np.random.RandomState(0)
    H, W = mbH * 16, mbW * 16
    for K in (1, 2, 4, 8):
        p = {k: jnp.stack([v] * K) for k, v in p1.items()}
        y = jnp.asarray(rng.randint(0, 255, (K, H, W)).astype(np.int32))
        cbcr = jnp.asarray(
            rng.randint(0, 255, (2, K, H // 2, W // 2)).astype(np.int32))
        ry = jnp.zeros((K, H, W), jnp.int32)
        rc = jnp.zeros((K, H // 2, W // 2), jnp.int32)
        bs = jnp.asarray(rng.randint(0, 5, (K, mbH * 4, mbW * 4))
                         .astype(np.int32))

        intra = jax.jit(lambda y, cb, cr, ry, rcb, rcr, p: intra_pallas_batch(
            y, cb, cr, ry, rcb, rcr, p, mbW, mbH))
        deb = jax.jit(lambda y, cb, cr, p, bv, bh: deblock_pallas_batch(
            y, cb, cr, p, bv, bh, mbW, mbH))
        t0 = time.perf_counter()
        dt_i = timeit(intra, y, cbcr[0], cbcr[1], ry, rc, rc, p)
        c_i = time.perf_counter() - t0
        t0 = time.perf_counter()
        dt_d = timeit(deb, y, cbcr[0], cbcr[1], p, bs, bs)
        c_d = time.perf_counter() - t0
        print(f"K={K}: intra {dt_i*1e3:.1f} ms = {dt_i/K*1e3:.2f} ms/frame "
              f"(compile {c_i:.0f}s) | deblock {dt_d*1e3:.1f} ms = "
              f"{dt_d/K*1e3:.2f} ms/frame (compile {c_d:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compile-only check of the K-lane deblock Pallas kernel at 1080p.

Round-3 regression repro: at K=8 lanes the kernel's scoped-VMEM need
(~120 MB, linear in K*mbH) exceeded the 100 MB limit and the bench died
at warmup compile.  This lowers + compiles (never runs) the kernel on
the attached TPU so the VMEM budget can be iterated without risking a
chip fault or a long execution.

Usage: python tools/compile_deblock_1080p.py [K] [mbW] [mbH]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mbW = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    mbH = int(sys.argv[3]) if len(sys.argv) > 3 else 68
    import jax
    import jax.numpy as jnp
    from edge264_tpu.ops.pallas_deblock import deblock_pallas_batch

    H, W = mbH * 16, mbW * 16
    ys = jnp.zeros((K, H, W), jnp.int32)
    cbs = jnp.zeros((K, H // 2, W // 2), jnp.int32)
    crs = jnp.zeros((K, H // 2, W // 2), jnp.int32)
    p = {
        "qp": jnp.full((K, mbH, mbW, 4), 26, jnp.int32),
        "deblock_ab": jnp.zeros((K, mbH, mbW, 2), jnp.int32),
        "deblock": jnp.full((K, mbH, mbW), 7, jnp.int32),
        "mb_flags": jnp.ones((K, mbH, mbW), jnp.int32),
    }
    bs_v = jnp.zeros((K, 4 * mbH, 4 * mbW), jnp.int32)
    bs_h = jnp.zeros((K, 4 * mbH, 4 * mbW), jnp.int32)

    fn = jax.jit(lambda *a: deblock_pallas_batch(*a, mbW=mbW, mbH=mbH))
    t0 = time.time()
    lowered = fn.lower(ys, cbs, crs, p, bs_v, bs_h)
    print(f"lowered in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time()-t0:.1f}s on "
          f"{jax.devices()[0].platform}: OK")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Minimal on-chip repro for the Pallas MC kernel fault (axon compiler
update 2026-08).  Synthetic 1080p inputs, K lanes, S ring slots; runs
mc_frame_batch and fences with a real 1-element D2H.

Usage: python tools/repro_mc_fault.py [--k 1] [--s 2] [--geom 120x68]
       [--luma-only | --chroma-only] [--interpret]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--s", type=int, default=2)
    ap.add_argument("--geom", default="120x68")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--has-b", action="store_true")
    args = ap.parse_args()
    mbW, mbH = (int(x) for x in args.geom.split("x"))
    K, S = args.k, args.s

    import jax
    import jax.numpy as jnp
    import bench
    import edge264_tpu.ops.jaxdec as J
    import edge264_tpu.ops.batched as B
    from edge264_tpu.ops import pallas_mc
    from __graft_entry__ import _example_planes

    bench.device_health_check(time.monotonic() + 600)

    BH, BW = mbH * 4, mbW * 4
    rng = np.random.RandomState(0)
    p1 = {k: v.astype(jnp.int32) for k, v in
          _example_planes(mbW, mbH).items()}
    nl = 2 if args.has_b else 1
    refslot = np.where(rng.rand(BH, BW, 2) < 0.95,
                       rng.randint(0, S, (BH, BW, 2)), -1).astype(np.int32)
    if not args.has_b:
        refslot[..., 1] = -1
    mvs = rng.randint(-256, 257, (BH, BW, 2, 2)).astype(np.int32)
    p1["refslot"] = jnp.asarray(refslot)
    p1["mvs"] = jnp.asarray(mvs)
    p = {k: jnp.stack([v] * K) for k, v in p1.items()}

    refL, refC = B.alloc_ref_rings(K, S, mbW, mbH)
    refL = jax.block_until_ready(refL + 1)
    refC = jax.block_until_ready(refC + 1)
    smap = jnp.zeros((K, 32), jnp.int32)
    print(f"K={K} S={S} band={np.prod(refL.shape[1:])/1e6:.0f} MB "
          f"fits={pallas_mc.fits_pallas(refL)}", flush=True)

    if os.environ.get("E264T_MC_SPLIT") == "3":
        # pack | kernels | combine as three jit programs
        import jax.numpy as jnp
        has_b = args.has_b

        pack3 = jax.jit(lambda p_, sm: pallas_mc.pack_mc_params(
            p_, sm, has_b, mbW, mbH))

        @jax.jit
        def kernels3(flg, pkl, pkc, rl, rc):
            return pallas_mc.run_mc_kernels(flg, pkl, pkc, rl, rc,
                                            has_b, mbW, mbH)

        @jax.jit
        def combine3(p_, sm, flat):
            return pallas_mc.combine_mc(p_, sm, flat, has_b)

        def fn(p_, rl, rc, sm):
            flg, pkl, pkc = pack3(p_, sm)
            flat = kernels3(flg, pkl, pkc, rl, rc)
            return combine3(p_, sm, flat)
    elif os.environ.get("E264T_MC_SPLIT"):
        fn = lambda p_, rl, rc, sm: pallas_mc.mc_frame_batch(  # noqa: E731
            p_, rl, rc, sm, args.has_b, mbW, mbH)
    else:
        fn = jax.jit(lambda p_, rl, rc, sm: pallas_mc.mc_frame_batch(
            p_, rl, rc, sm, args.has_b, mbW, mbH))
    for i in range(args.runs):
        t0 = time.perf_counter()
        out = fn(p, refL, refC, smap)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # fence
        print(f"run {i}: {time.perf_counter()-t0:.3f}s", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()

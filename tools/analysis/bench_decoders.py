#!/usr/bin/env python3
"""Decoder benchmark runner (port of misc-scripts/bench-decoders.py).

Times this decoder against any locally available competitors (ffmpeg,
openh264's h264dec) on the same stream; competitors are skipped when the
binary is absent (this image has none installed)."""

import shutil
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def bench_ours(path, backend):
    from edge264_tpu.api import decode_annexb
    import numpy as np
    data = open(path, "rb").read()
    n = 0
    t0 = time.perf_counter()
    for f in decode_annexb(data, backend=backend):
        np.asarray(f.y)[0, 0]
        n += 1
    return n, time.perf_counter() - t0


def bench_ffmpeg(path):
    t0 = time.perf_counter()
    subprocess.run(["ffmpeg", "-threads", "1", "-i", path, "-f", "null",
                    "-"], capture_output=True)
    return time.perf_counter() - t0


if __name__ == "__main__":
    path = sys.argv[1]
    for backend in ("jax", "numpy"):
        try:
            n, dt = bench_ours(path, backend)
            print(f"edge264_tpu[{backend}]: {n} frames in {dt:.3f}s "
                  f"({n / dt:.1f} fps)")
        except Exception as e:
            print(f"edge264_tpu[{backend}]: failed ({e})")
    if shutil.which("ffmpeg"):
        dt = bench_ffmpeg(path)
        print(f"ffmpeg(1 thread): {dt:.3f}s")
    else:
        print("ffmpeg: not installed, skipped")

#!/usr/bin/env python3
"""Host-side profiling: time the C++ entropy front end alone (null pixel
backend) on a stream, reporting ms/frame and µs/mb."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class NullBackend:
    def reconstruct(self, planes, slot, store):
        h, w = planes.mb_h * 16, planes.mb_w * 16
        z = np.zeros((h, w), np.uint8)
        zc = np.zeros((h // 2, w // 2), np.uint8)
        return z, zc, zc


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/e264t_bench_cabac_ipb_120x68_61f_v1.264"
    data = open(path, "rb").read()
    from edge264_tpu.api import decode_annexb

    for run in range(2):
        t0 = time.perf_counter()
        n = 0
        mbs = 0
        for f in decode_annexb(data, backend=NullBackend()):
            n += 1
            mbs += (f.y.shape[0] // 16) * (f.y.shape[1] // 16)
        dt = time.perf_counter() - t0
        print(f"run {run}: {n} frames in {dt:.2f}s = {dt/n*1e3:.1f} ms/frame, "
              f"{dt/mbs*1e6:.2f} us/mb, {len(data)/dt/1e6:.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()

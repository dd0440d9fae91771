#!/usr/bin/env python3
"""Compare lockstep fusion granularities on the real chip in ONE process
(each process pays minutes of tunnel init, and a faulting program wedges
the chip for the NEXT process too — so safest mode first, riskiest
last, results flushed as they come).

Modes: split  (one program per stage, r3-proven)
       recon  (front | MC kernels | recon | db+emit+refs)
       fused  (front | MC kernels | main) — trips the axon miscompile
              at 1080p as of 2026-08.

Usage: python tools/profile_fuse.py [n_gops] [lanes] [modes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:]]
    n_gops = int(args[0]) if len(args) > 0 else 8
    lanes = int(args[1]) if len(args) > 1 else 8
    modes = args[2:] or ["split", "recon", "fused"]

    import numpy as np
    import bench
    from edge264_tpu.parallel.gop import split_gops
    from edge264_tpu.parallel.batch import decode_gops_batched
    from edge264_tpu.ops.batched import host_frame_digest

    data = bench.build_stream()
    gops = split_gops(data)[:n_gops]
    data = b"".join(gops)
    want = None
    try:
        from tools.ref_oracle import RefOracle
        o = RefOracle.build()
        metas, yuv, _ = o.decode_yuv(data)
        want, off = [], 0
        for _fid, wy, hy, wc, hc in metas:
            y = np.frombuffer(yuv, np.uint8, wy * hy, off).reshape(hy, wy)
            off += wy * hy
            cb = np.frombuffer(yuv, np.uint8, wc * hc, off).reshape(hc, wc)
            off += wc * hc
            cr = np.frombuffer(yuv, np.uint8, wc * hc, off).reshape(hc, wc)
            off += wc * hc
            want.append(host_frame_digest(y, cb, cr))
    except Exception as e:
        print(f"no golden digests ({e}); running unchecked", flush=True)

    bench.device_health_check(time.monotonic() + 1800)

    def set_mode(mode):
        os.environ.pop("E264T_SPLIT_STAGES", None)
        os.environ.pop("E264T_FUSE", None)
        if mode == "split":
            os.environ["E264T_SPLIT_STAGES"] = "1"
        elif mode == "recon":
            os.environ["E264T_FUSE"] = "recon"

    for mode in modes:
        set_mode(mode)
        for tag in ("cold", "warm"):
            t0 = time.perf_counter()
            digs = [f.digest for f in
                    decode_gops_batched(data, lanes=lanes, sink="digest")]
            dt = time.perf_counter() - t0
            ok = "?" if want is None else (digs == want)
            print(f"[{mode:5s}] {tag}: {len(digs)} frames in {dt:6.1f}s "
                  f"= {len(digs)/dt:6.2f} fps  digest-exact: {ok}",
                  flush=True)
        # second warm pass with the lane profiler for the stage split
        os.environ["E264T_LANE_PROF"] = "1"
        t0 = time.perf_counter()
        n = sum(1 for _ in decode_gops_batched(data, lanes=lanes,
                                               sink="digest"))
        dt = time.perf_counter() - t0
        os.environ.pop("E264T_LANE_PROF", None)
        print(f"[{mode:5s}] prof: {n} frames in {dt:6.1f}s "
              f"= {n/dt:6.2f} fps", flush=True)


if __name__ == "__main__":
    main()

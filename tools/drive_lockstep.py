#!/usr/bin/env python3
"""Drive the K-lane lockstep path on the real chip with per-step sync,
to localize device faults (async dispatch otherwise defers them to the
first output D2H) and to measure per-step device time.

Usage: python tools/drive_lockstep.py [--lanes N] [--gops N] [--no-check]
Env:   E264T_NO_PALLAS=1        pure-XLA step program
       E264T_NO_PALLAS_MC=1     XLA MC, Mosaic deblock
       E264T_NO_PALLAS_DEBLOCK=1  Mosaic MC, XLA deblock
"""
import argparse
import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1)
    ap.add_argument("--gops", type=int, default=None,
                    help="decode only the first N GOPs")
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--stream", default=None)
    args = ap.parse_args()
    os.environ.setdefault("E264T_SYNC_STEPS", "1")

    sys.path.insert(0, REPO)
    import bench
    data = bench.build_stream() if args.stream is None else \
        open(args.stream, "rb").read()
    digest = None
    if not args.no_check:
        digest, n_ref = bench.golden_digest(data)

    from edge264_tpu.parallel.batch import decode_gops_batched
    from edge264_tpu.parallel.gop import split_gops
    import numpy as np

    # a fault from a previous process wedges the chip for a while;
    # wait until it answers a tiny jit before measuring anything
    bench.device_health_check(time.monotonic() + 600)

    if args.gops:
        gops = split_gops(data)[:args.gops]
        data = b"".join(gops)
        digest = None
    t0 = time.perf_counter()
    h = hashlib.sha256()
    n = 0
    for f in decode_gops_batched(data, lanes=args.lanes):
        h.update(np.asarray(f.y).tobytes())
        h.update(np.asarray(f.cb).tobytes())
        h.update(np.asarray(f.cr).tobytes())
        n += 1
    dt = time.perf_counter() - t0
    print(f"{n} frames in {dt:.1f}s = {n/dt:.2f} fps", flush=True)
    if digest is not None:
        print("bit-exact:", h.hexdigest() == digest, flush=True)


if __name__ == "__main__":
    main()

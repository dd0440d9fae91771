"""Command-line test app -- the reference's edge264_test.c rebuilt for the
TPU decoder (decode_file edge264_test.c:276-423, check_frame :207-272,
benchmark mode :427-546).

Usage:
  python -m edge264_tpu.cli FILE.264 [-y FILE.yuv] [-b] [--backend jax]
  python -m edge264_tpu.cli DIR            # every .264 with matching .yuv

Compares each decoded frame mb-by-mb against golden YUV when provided
(MVC second views check FILE.1.yuv), prints a colored per-mb diff map for
the first mismatch, and with -b reports wall/CPU time and peak RSS.
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np

from .api import decode_annexb


def _read_yuv(path, w, h, n):
    fs = w * h * 3 // 2
    data = np.fromfile(path, np.uint8)
    return data[:n * fs].reshape(n, fs)


def check_frame(i, frame, golden, w, h):
    """mb-by-mb comparison with a colored diff map (edge264_test.c:207)."""
    got = np.concatenate([np.asarray(frame.y).ravel(),
                          np.asarray(frame.cb).ravel(),
                          np.asarray(frame.cr).ravel()])
    if np.array_equal(got, golden):
        return True
    y = np.asarray(frame.y)
    gy = golden[:w * h].reshape(h, w)
    mbW, mbH = (w + 15) // 16, (h + 15) // 16
    print(f"frame {i}: MISMATCH (luma diff map, . = ok, X = differs)")
    for my in range(mbH):
        row = ""
        for mx in range(mbW):
            a = y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            b = gy[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            bad = not np.array_equal(a[:b.shape[0], :b.shape[1]], b)
            row += "\x1b[31mX\x1b[0m" if bad else "."
        print("  " + row)
    return False


def decode_file(path, yuv=None, backend="jax", bench=False, quiet=False,
                n_tasks=0, out_y4m=None):
    data = open(path, "rb").read()
    t0 = time.perf_counter()
    c0 = time.process_time()
    frames = []
    for f in decode_annexb(data, backend=backend, n_tasks=n_tasks):
        np.asarray(f.y)[0, 0]          # force materialization
        frames.append(f)
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    n_ok = n_total = None
    if yuv and os.path.exists(yuv) and frames:
        h, w = np.asarray(frames[0].y).shape
        golden = _read_yuv(yuv, w, h, len(frames))
        golden2 = None
        y1 = os.path.splitext(yuv)[0] + ".1.yuv"
        if os.path.exists(y1):
            golden2 = _read_yuv(y1, w, h, len(frames))
        n_ok = n_total = 0
        for i, f in enumerate(frames):
            n_total += 1
            if check_frame(i, f, golden[i], w, h):
                n_ok += 1
            if golden2 is not None and f.y_mvc is not None:
                n_total += 1

                class _V:      # second-view shim for check_frame
                    y, cb, cr = f.y_mvc, f.cb_mvc, f.cr_mvc
                if check_frame(i, _V, golden2[i], w, h):
                    n_ok += 1
        status = "PASS" if n_ok == n_total else "FAIL"
    else:
        status = "DECODED"
    if not quiet:
        msg = f"{path}: {status} ({len(frames)} frames"
        if n_ok is not None:
            msg += f", {n_ok}/{n_total} bit-exact"
        msg += ")"
        print(msg)
    if out_y4m and frames:
        h, w = np.asarray(frames[0].y).shape
        # frame rate from VUI timing when present: time_scale ticks/sec,
        # 2 ticks per progressive frame (E-1); fall back to 30:1
        nuit, tsc = getattr(frames[0], "timing", (0, 0))
        fn, fd = (tsc, 2 * nuit) if nuit and tsc else (30, 1)
        with open(out_y4m, "wb") as fh:
            fh.write(f"YUV4MPEG2 W{w} H{h} F{fn}:{fd} Ip A1:1 C420\n"
                     .encode())
            for f in frames:
                fh.write(b"FRAME\n")
                fh.write(np.asarray(f.y).tobytes())
                fh.write(np.asarray(f.cb).tobytes())
                fh.write(np.asarray(f.cr).tobytes())
        if not quiet:
            print(f"  wrote {out_y4m} ({len(frames)} frames)")
    if bench:
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(f"  wall: {wall * 1000:.1f} ms  cpu: {cpu * 1000:.1f} ms  "
              f"fps: {len(frames) / wall:.2f}  peak RSS: {rss} MB")
    return status in ("PASS", "DECODED")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Decode/validate/benchmark H.264 streams "
                    "(edge264_test analog)")
    ap.add_argument("input", help=".264 file or directory of test streams")
    ap.add_argument("-y", "--yuv", help="golden YUV file to compare")
    ap.add_argument("-b", "--bench", action="store_true",
                    help="print timing + memory stats")
    ap.add_argument("--backend", default="jax",
                    choices=("jax", "numpy"), help="pixel backend")
    ap.add_argument("-m", "--multithread", action="store_true",
                    help="frame-task workers, one per hardware thread "
                         "(the reference's -m)")
    ap.add_argument("-o", "--output", metavar="FILE.y4m",
                    help="write decoded video as YUV4MPEG2 (playable with "
                         "ffplay/mpv; the display-substitute for the "
                         "reference's SDL window)")
    args = ap.parse_args(argv)
    n_tasks = -1 if args.multithread else 0

    if os.path.isdir(args.input):
        ok = True
        for name in sorted(os.listdir(args.input)):
            if not name.endswith(".264"):
                continue
            p = os.path.join(args.input, name)
            yuv = os.path.splitext(p)[0] + ".yuv"
            ok &= decode_file(p, yuv if os.path.exists(yuv) else None,
                              args.backend, args.bench, n_tasks=n_tasks)
        return 0 if ok else 1
    yuv = args.yuv or os.path.splitext(args.input)[0] + ".yuv"
    ok = decode_file(args.input, yuv if os.path.exists(yuv) else None,
                     args.backend, args.bench, n_tasks=n_tasks,
                     out_y4m=args.output)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

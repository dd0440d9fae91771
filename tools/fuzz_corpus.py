#!/usr/bin/env python3
"""Build a fuzz corpus and run it through the ASan+UBSan build of the
native front end (edge264_check.c:112-165 analog: the sanitizers replace
the reference's mprotect guard pages).

Corpus: valid generated streams of every class (CAVLC/CABAC x I/P/B x
High x MVC), plus per-stream mutations — truncation at every byte of a
slice header, random byte flips, random multi-KB garbage NALs.

Usage: python tools/fuzz_corpus.py [--quick] [--seed N]
Exit 0 = sanitizer-clean on the whole corpus.
"""

import argparse
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAN_BIN = "/tmp/fuzz_native_asan"


def build():
    import glob
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    srcs = sorted(glob.glob(os.path.join(repo, "edge264_tpu/native/src/*.cpp")))
    cmd = ["g++", "-std=c++17", "-O1", "-g", "-pthread",
           "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
           os.path.join(repo, "tools/fuzz_native.cpp"), *srcs,
           "-o", SAN_BIN]
    newest = max(os.path.getmtime(s) for s in
                 srcs + [os.path.join(repo, "tools/fuzz_native.cpp"),
                         os.path.join(repo, "edge264_tpu/native/src/e264t.h")])
    if os.path.exists(SAN_BIN) and os.path.getmtime(SAN_BIN) > newest:
        return SAN_BIN
    subprocess.run(cmd, check=True)
    return SAN_BIN


def base_streams(quick=False):
    from tools.avcgen import (gen_random_intra_stream, gen_random_ipp_stream,
                              gen_random_ipb_stream, gen_random_cabac_stream,
                              gen_random_cabac_ipb_stream,
                              gen_random_high_stream,
                              gen_random_high_cabac_stream,
                              gen_random_mvc_stream)
    out = {
        "intra": gen_random_intra_stream(5, 4, n_frames=2, seed=1,
                                         slices_per_frame=2),
        "ipp": gen_random_ipp_stream(5, 4, n_frames=3, seed=2, density=0.3,
                                     skip_prob=0.2, intra_prob=0.1,
                                     mv_range=16, nrefs=2),
        "cabac_ipb": gen_random_cabac_ipb_stream(5, 4, n_gops=2, seed=3),
    }
    if not quick:
        out.update({
            "ipb": gen_random_ipb_stream(5, 4, n_gops=2, seed=4),
            "cabac": gen_random_cabac_stream(5, 4, n_frames=2, seed=5),
            "high": gen_random_high_stream(5, 4, n_frames=2, seed=6),
            "high_cabac": gen_random_high_cabac_stream(5, 4, n_frames=2,
                                                       seed=7),
            "mvc": gen_random_mvc_stream(5, 4, n_aus=2, seed=8),
        })
    return out


def mutations(name, data, rng, quick=False):
    from edge264_tpu.api import find_start_code
    yield f"{name}", data
    starts = []
    pos = find_start_code(data, 0)
    while pos < len(data):
        starts.append(pos)
        pos = find_start_code(data, pos + 3)
    starts.append(len(data))
    slices = [i for i in range(len(starts) - 1)
              if data[starts[i] + 3] & 31 in (1, 5, 20)]
    # truncations at every byte of one slice's header region (first 24
    # bytes), plus coarse cuts through its payload
    if slices:
        s = slices[min(1, len(slices) - 1)]
        limit = min(24, starts[s + 1] - starts[s] - 4)
        step = 4 if quick else 1
        for off in range(1, limit, step):
            cut = starts[s] + 4 + off
            yield f"{name}-trunc{off}", data[:cut] + data[starts[s + 1]:]
        for frac in (0.3, 0.6, 0.9):
            cut = starts[s] + int((starts[s + 1] - starts[s]) * frac)
            yield f"{name}-cut{frac}", data[:cut] + data[starts[s + 1]:]
    # random byte flips anywhere
    n_flips = 8 if quick else 40
    for k in range(n_flips):
        b = bytearray(data)
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        yield f"{name}-flip{k}", bytes(b)
    # garbage NALs, incl. multi-KB ones
    for k in range(2 if quick else 6):
        size = rng.choice([16, 300, 4096, 65536])
        garbage = b"\x00\x00\x01" + bytes(
            rng.randrange(256) for _ in range(size))
        yield f"{name}-garbage{k}", data + garbage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    binp = build()
    rng = random.Random(args.seed)
    total = 0
    batch, names = [], []

    def flush():
        nonlocal batch, names
        if not batch:
            return
        r = subprocess.run([binp, "-m", *batch], capture_output=True,
                           text=True)
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
            sys.exit(f"sanitizer failure in batch {names[:3]}...")
        batch, names = [], []

    for name, data in base_streams(args.quick).items():
        for mname, mdata in mutations(name, data, rng, args.quick):
            path = f"/tmp/fuzz_{mname}.264"
            with open(path, "wb") as f:
                f.write(mdata)
            batch.append(path)
            names.append(mname)
            total += 1
            if len(batch) >= 25:
                flush()
    flush()
    print(f"corpus clean: {total} streams, 0 sanitizer reports")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Measured syntax statistics of the benchmark stream — the evidence
behind BENCH_WORKLOAD.md's claim that the generated 1080p stream is a
defensible stand-in for the reference's Big Buck Bunny clip
(/root/reference/.github/workflows/benchmarks.yml:31-37).

Prints bits/frame, frame-type mix, mb-type/partition histogram, skip
rate, mv magnitude histogram, residual density and coded-block stats,
as decoded by the native front end (not as generated — so the numbers
measure what the DECODER actually sees).

Usage: python tools/analysis/workload_stats.py [stream.264]
       (defaults to the bench stream, building it if needed)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import numpy as np


def main():
    import bench
    from edge264_tpu.api import find_start_code
    from edge264_tpu.native import NativeDecoder, EV_FRAME_DONE

    data = (open(sys.argv[1], "rb").read() if len(sys.argv) > 1
            else bench.build_stream())
    nd = NativeDecoder()
    pos = find_start_code(data, 0) + 3
    sizes = []          # per-frame NAL bytes
    stats = dict(frames=0, i_mb=0, skip_mb=0, inter_mb=0, pcm=0,
                 uni16=0, part16x8=0, part8=0, coded4=0, blocks4=0,
                 t8=0)
    mv_hist = np.zeros(8, np.int64)     # |mv| quarter-pel log2 buckets
    cur = 0
    while pos < len(data):
        end = find_start_code(data, pos)
        cur += end - pos
        _, events = nd.decode_nal(data[pos:end])
        for e in events:
            if e[0] != EV_FRAME_DONE:
                continue
            sizes.append(cur)
            cur = 0
            pl = nd.planes(e[1])
            fl = np.asarray(pl.mb_flags)
            parsed = fl != 0
            stats["frames"] += 1
            stats["i_mb"] += int(((fl & 1) > 0).sum())
            stats["skip_mb"] += int(((fl & 16) > 0).sum())
            stats["inter_mb"] += int(((fl & 64) > 0).sum())
            stats["pcm"] += int(((fl & 4) > 0).sum())
            stats["t8"] += int(((fl & 8) > 0).sum())
            mv = np.asarray(pl.mvs)
            H, W = pl.mb_h, pl.mb_w
            mvq = mv.reshape(H, 4, W, 4, 2, 2)
            inter = ((fl & 64) > 0)
            uni = (mvq == mvq[:, :1, :, :1]).all(axis=(1, 3))
            uni_mb = uni.all(axis=-1).all(axis=-1) & inter
            rows2 = (mvq[:, :2] == mvq[:, :1, :, :1]).all(axis=(1, 3, 4, 5))
            stats["uni16"] += int(uni_mb.sum())
            stats["part16x8"] += int((inter & ~uni_mb & rows2).sum())
            stats["part8"] += int((inter & ~uni_mb & ~rows2).sum())
            mag = np.abs(mv[..., 0]).astype(np.int64).ravel()
            mag = mag[mag > 0]
            if mag.size:
                mv_hist += np.bincount(
                    np.minimum(np.log2(mag).astype(int), 7),
                    minlength=8)
            nz = np.asarray(pl.nz_y)
            stats["coded4"] += int((nz > 0).sum())
            stats["blocks4"] += nz.size
            while nd.get_frame(borrow=False) is not None:
                pass
        pos = end + 3
    nd.close()
    n = stats["frames"]
    mbs = n * (pl.mb_w * pl.mb_h)
    print(f"frames: {n}  geometry {pl.mb_w}x{pl.mb_h} mbs")
    print(f"bytes/frame: mean {np.mean(sizes)/1e3:.1f} KB  "
          f"median {np.median(sizes)/1e3:.1f} KB  "
          f"(total {sum(sizes)/1e6:.1f} MB)")
    print(f"mb mix: intra {stats['i_mb']/mbs:.1%}  "
          f"skip {stats['skip_mb']/mbs:.1%}  "
          f"inter-coded {(stats['inter_mb']-stats['skip_mb'])/mbs:.1%}  "
          f"pcm {stats['pcm']/mbs:.2%}  t8x8 {stats['t8']/mbs:.2%}")
    it = max(stats["inter_mb"], 1)
    print(f"inter partitions: 16x16-uniform {stats['uni16']/it:.1%}  "
          f"16x8/8x16-ish {stats['part16x8']/it:.1%}  "
          f"8x8-or-finer {stats['part8']/it:.1%}")
    print(f"coded 4x4 luma blocks: {stats['coded4']/stats['blocks4']:.1%}")
    tot = max(mv_hist.sum(), 1)
    print("|mv_x| histogram (quarter-pel, log2 buckets 1,2,4,...,>=128):")
    print("  " + "  ".join(f"{v/tot:.1%}" for v in mv_hist))


if __name__ == "__main__":
    main()

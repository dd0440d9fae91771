"""Multi-host GOP distribution (BASELINE.md scaling row: N>=2 hosts,
>=80% efficiency).

The decoder's cross-host axis is the closed GOP: reference chains never
cross an IDR, so hosts need NO communication during decode — the exact
property the reference exploits with frame-task dependencies inside one
process (edge264_headers.c:1275-1277), lifted to the DCN level.  Each
process takes a deterministic, contiguous share of the stream's GOPs
(contiguous, not round-robin, so every process parses one bitstream run),
decodes them with the K-lane lockstep driver over its LOCAL devices
(parallel/batch.py), and the caller concatenates per-process outputs in
rank order — an embarrassingly-parallel scatter/gather whose only
synchronization is jax.distributed initialization.

Scaling efficiency is bounded by GOP-count imbalance: ceil/floor shares
differ by at most one GOP, so with G GOPs over N hosts the efficiency
floor is (G//N)/(G/N) -> >=80% whenever G >= 4N (a 10-s clip at a 1-s GOP
cadence feeds 2 hosts at ~91%).
"""

from __future__ import annotations

import jax

from .batch import decode_gops_batched
from .gop import split_gops
from .mesh import make_decode_mesh


def my_gop_range(n_gops: int, rank: int, world: int) -> tuple[int, int]:
    """Contiguous [start, end) share of `n_gops` for `rank` of `world`
    (first `n_gops % world` ranks take one extra)."""
    base, extra = divmod(n_gops, world)
    start = rank * base + min(rank, extra)
    return start, start + base + (1 if rank < extra else 0)


def decode_stream_multihost(stream: bytes, *, lanes: int = 4,
                            use_mesh: bool = True):
    """Decode this process's GOP share; yields Frames in the share's
    stream order.  Call under an initialized jax.distributed runtime
    (jax.distributed.initialize() from the launcher); falls back to
    single-process when uninitialized."""
    try:
        rank = jax.process_index()
        world = jax.process_count()
    except Exception:
        rank, world = 0, 1
    gops = split_gops(stream)
    lo, hi = my_gop_range(len(gops), rank, world)
    share = b"".join(gops[lo:hi])
    if not share:
        return
    mesh = None
    if use_mesh:
        local = jax.local_devices()
        n = max(1, len(local))
        if lanes % n == 0:
            mesh = make_decode_mesh(local)
    yield from decode_gops_batched(share, lanes=lanes, mesh=mesh)

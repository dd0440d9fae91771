#!/usr/bin/env python3
"""Measure the axon tunnel's transfer characteristics: H2D and D2H
latency (small arrays) and bandwidth (large arrays), plus dispatch
round-trip.  These numbers decide where the lockstep bench's budget goes
(the packed arena is ~9 MB/frame at 1080p; output frames ~3 MB).

Usage: python tools/profile_tunnel.py [sizes_mb ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # dispatch + tiny D2H round trip (latency floor)
    x = jnp.arange(16.0)
    f = jax.jit(lambda a: a * 2)
    np.asarray(f(x))                      # warm
    best = 1e9
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(f(x))
        best = min(best, time.perf_counter() - t0)
    print(f"tiny jit+D2H round trip: {best*1e3:.1f} ms")

    sizes = [float(a) for a in sys.argv[1:]] or [1, 4, 9, 32, 128]
    for mb in sizes:
        n = int(mb * 1e6)
        host = np.random.randint(0, 255, n, dtype=np.uint8)
        # H2D
        d = jax.device_put(host)          # warm path/pages
        jax.block_until_ready(d)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            d = jax.device_put(host)
            jax.block_until_ready(d)
            best = min(best, time.perf_counter() - t0)
        h2d = n / best / 1e6
        # D2H
        np.asarray(d)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(d)
            best = min(best, time.perf_counter() - t0)
        d2h = n / best / 1e6
        print(f"{mb:6.1f} MB: H2D {h2d:7.1f} MB/s   D2H {d2h:7.1f} MB/s",
              flush=True)


if __name__ == "__main__":
    main()

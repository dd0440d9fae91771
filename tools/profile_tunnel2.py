#!/usr/bin/env python3
"""Clean axon-tunnel transfer measurement (profile_tunnel.py's D2H numbers
were bogus: it timed np.asarray on an array whose host copy still existed).

H2D: device_put of fresh host data, fenced by a 1-element D2H of a
computation depending on the transferred buffer.
D2H: device_get of a DEVICE-PRODUCED array (no host twin), after a fence.
Duplex: H2D and D2H in flight together (does the tunnel overlap?).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def fence(x):
        np.asarray(jax.jit(lambda a: a.ravel()[:1] * 1)(x))

    key = jax.random.PRNGKey(0)
    for mb in (1, 4, 16, 45, 128):
        n = int(mb * 1e6)
        host = np.random.randint(0, 255, n, dtype=np.uint8)
        d = jax.device_put(host)
        fence(d)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(host)
            fence(d)
            best = min(best, time.perf_counter() - t0)
        h2d = mb / best

        # device-produced array: no host twin to alias
        dev = jax.jit(lambda k: jax.random.randint(
            k, (n,), 0, 255, jnp.int32).astype(jnp.uint8))(key)
        fence(dev)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.device_get(dev)
            best = min(best, time.perf_counter() - t0)
            del out
        d2h = mb / best

        # duplex: start async D2H, then H2D, wait both
        try:
            t0 = time.perf_counter()
            dev.copy_to_host_async()
            d2 = jax.device_put(host)
            fence(d2)
            _ = np.asarray(dev)
            dup = 2 * mb / (time.perf_counter() - t0)
        except Exception:
            dup = float("nan")
        print(f"{mb:5.0f} MB: H2D {h2d:7.1f} MB/s   D2H {d2h:7.1f} MB/s   "
              f"duplex {dup:7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Pin down the axon tunnel's H2D cost structure: fixed per-call cost vs
bandwidth, pipelining of consecutive puts, and whether executing a jitted
fn with host-numpy args pays the same cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    one = jax.jit(lambda a: a.ravel()[:1].astype(jnp.int32).sum())

    def fence(x):
        int(np.asarray(one(x)))

    # warm the fence for each shape used below
    sizes = [1024, 65536, 1 << 20, 4 << 20, 16 << 20, 45 << 20]
    bufs = {n: np.random.randint(0, 255, n, dtype=np.uint8) for n in sizes}
    for n in sizes:
        fence(jax.device_put(bufs[n], dev))

    print("single device_put (min of 5):")
    for n in sizes:
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            d = jax.device_put(bufs[n], dev)
            fence(d)
            best = min(best, time.perf_counter() - t0)
        print(f"  {n/1e6:7.3f} MB: {best*1e3:8.1f} ms "
              f"({n/1e6/best:7.1f} MB/s)", flush=True)

    print("10 back-to-back 1MB puts then one fence (pipelining test):")
    b = bufs[1 << 20]
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        ds = [jax.device_put(b, dev) for _ in range(10)]
        for d in ds:
            fence(d)
        best = min(best, time.perf_counter() - t0)
    print(f"  10x1MB: {best*1e3:8.1f} ms ({10/best:7.1f} MB/s)", flush=True)

    print("jit call with host-numpy arg (implicit transfer), 4MB:")
    f = jax.jit(lambda a: a.astype(jnp.int32).sum())
    h = bufs[4 << 20]
    int(np.asarray(f(h)))
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        int(np.asarray(f(h)))
        best = min(best, time.perf_counter() - t0)
    print(f"  4MB arg: {best*1e3:8.1f} ms ({4/best:7.1f} MB/s)", flush=True)

    print("overlap test: device_put 16MB while a ~200ms jit runs:")
    m = jnp.zeros((3072, 3072), jnp.float32)
    mm = jax.jit(lambda a: jnp.sin(a @ a) @ a + a @ jnp.cos(a @ a))
    fence(mm(m))
    t0 = time.perf_counter()
    o = mm(m)
    tj = time.perf_counter() - t0
    fence(o)
    tjf = time.perf_counter() - t0
    t0 = time.perf_counter()
    o = mm(m)
    d = jax.device_put(bufs[16 << 20], dev)
    fence(d)
    fence(o)
    both = time.perf_counter() - t0
    print(f"  jit enqueue {tj*1e3:.1f} ms, jit total {tjf*1e3:.1f} ms, "
          f"jit+16MB put {both*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

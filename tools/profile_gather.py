#!/usr/bin/env python3
"""Microbench the compact-arena device decode: bitmap -> exclusive
cumsum -> row gather (jnp.take) at 1080p coef_y scale, K=8.  Decides
whether sparse coefficient shipping is viable on the TPU (the
level-compressed intra scan died on exactly this kind of dynamic
indexing).

Usage: python tools/profile_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bench

    bench.device_health_check(time.monotonic() + 1200)

    K, U, R, E = 8, 272 * 480, 2048, 16     # lanes, blocks, rows, elems
    BM = (U + 7) // 8

    @jax.jit
    def decode(bm, tab):
        def one(bm, tab):
            bits = ((bm[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
            coded = bits.reshape(-1)[:U].astype(jnp.int32)
            tab1 = jnp.concatenate(
                [tab, jnp.zeros((1, E), tab.dtype)], axis=0)
            idx = jnp.cumsum(coded) - coded
            idx = jnp.where(coded.astype(bool), idx, R)
            return jnp.take(tab1, idx, axis=0)
        return jax.vmap(one)(bm, tab)

    tiny = jax.jit(lambda a: a.ravel()[:1].astype(jnp.int32) * 1)

    def fence(x):
        return np.asarray(tiny(x))

    rng = np.random.RandomState(0)
    bm = rng.randint(0, 256, (K, BM), dtype=np.uint8)
    tab = rng.randint(-100, 100, (K, R, E)).astype(np.int8)
    bmd, tabd = jax.device_put(bm), jax.device_put(tab)
    fence(bmd)

    t0 = time.perf_counter()
    out = decode(bmd, tabd)
    fence(out)
    print(f"compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e30
    for _ in range(5):
        t0 = time.perf_counter()
        out = decode(bmd, tabd)
        fence(out)
        best = min(best, time.perf_counter() - t0)
    print(f"bitmap+cumsum+take [K=8, {U} units, {R}x{E} i8 rows]: "
          f"{best*1e3:.1f} ms ({best/K*1e3:.2f} ms/frame)", flush=True)

    # the H2D put cost this replaces: dense vs sparse
    dense = rng.randint(-100, 100, (K, U, E)).astype(np.int8)
    dense[np.abs(dense) < 95] = 0        # ~90% zeros, compressible
    for payload, label in ((dense, "dense 16.7MB/lane-ish"),
                           ((bm, tab), "sparse bm+tab")):
        arrs = payload if isinstance(payload, tuple) else (payload,)
        ds = [jax.device_put(a) for a in arrs]
        for d in ds:
            fence(d)
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            ds = [jax.device_put(a) for a in arrs]
            for d in ds:
                fence(d)
            best = min(best, time.perf_counter() - t0)
        nb = sum(a.nbytes for a in arrs)
        print(f"H2D {label}: {best*1e3:.1f} ms for {nb/1e6:.1f} MB",
              flush=True)


if __name__ == "__main__":
    main()

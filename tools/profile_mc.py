#!/usr/bin/env python3
"""Time the P/B-step device stages in isolation at 1080p on the real
chip: mc_frame (two-list qpel gather), intra_scan (level-compressed),
make_ref_planes, update_refs.  The round-3 bench showed P/B steps at
~1.15 s/frame vs ~30 ms/frame for IDR steps; this pins down which stage
owns the difference.

Usage: python tools/profile_mc.py [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    """Real device sync: block_until_ready on the axon transport reports
    async completions early; a 1-element D2H is the only true fence."""
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[0])


def timeit(label, fn, *args, K=1, n=5, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    best = (time.perf_counter() - t0) / n
    print(f"{label}: {best*1e3:8.1f} ms ({best/K*1e3:7.2f} ms/frame)",
          flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import edge264_tpu.ops.jaxdec as J
    import edge264_tpu.ops.batched as B
    from __graft_entry__ import _example_planes

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mbW, mbH = 120, 68
    S = 8
    H, W = mbH * 16, mbW * 16
    BH, BW = mbH * 4, mbW * 4
    rng = np.random.RandomState(0)

    p1 = {k: v.astype(jnp.int32) for k, v in
          _example_planes(mbW, mbH).items()}
    # realistic inter planes: ~95% inter cells, mvs within +-64 qpel,
    # refslot pointing at 2 slots
    refslot = np.where(rng.rand(BH, BW, 2) < 0.95,
                       rng.randint(0, 2, (BH, BW, 2)), -1).astype(np.int32)
    mvs = rng.randint(-256, 257, (BH, BW, 2, 2)).astype(np.int32)
    p1["refslot"] = jnp.asarray(refslot)
    p1["mvs"] = jnp.asarray(mvs)
    p = {k: jnp.stack([v] * K) for k, v in p1.items()}

    refL, refC = B.alloc_ref_rings(K, S, mbW, mbH)
    refL = jax.block_until_ready(refL + 1)
    refC = jax.block_until_ready(refC + 1)
    smap = jnp.zeros((K, 32), jnp.int32)

    mc = jax.jit(jax.vmap(
        lambda pp, rl, rc, sm: J.mc_frame(pp, rl, rc, sm, True)))
    t0 = time.perf_counter()
    out = mc(p, refL, refC, smap)
    jax.block_until_ready(out)
    print(f"mc_frame compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    timeit("mc_frame 2-list", mc, p, refL, refC, smap, K=K)

    mcp = jax.jit(jax.vmap(
        lambda pp, rl, rc, sm: J.mc_frame(pp, rl, rc, sm, False)))
    out = None
    timeit("mc_frame 1-list", mcp, p, refL, refC, smap, K=K)

    # level-compressed intra over a realistic sparse intra population
    flags = np.where(rng.rand(mbH, mbW) < 0.05, 1 | 32, 0).astype(np.int32)
    tabs = J.intra_level_tables(flags, mbW, mbH)
    if tabs is not None:
        itabs = tuple(jnp.stack([jnp.asarray(t)] * K) for t in tabs)
        p_lv = dict(p)
        p_lv["mb_flags"] = jnp.stack([jnp.asarray(flags)] * K)
        y0 = jnp.zeros((K, H, W), jnp.int32)
        c0 = jnp.zeros((K, H // 2, W // 2), jnp.int32)
        ry = jnp.zeros((K, H, W), jnp.int32)
        rc = jnp.zeros((K, H // 2, W // 2), jnp.int32)
        sc = jax.jit(jax.vmap(
            lambda yy, cc, rr, a, b_, c_, pp, t0_, t1, t2:
            J.intra_scan(yy, cc, rr, a, b_, c_, pp, (t0_, t1, t2))))
        t0 = time.perf_counter()
        out = sc(y0, c0, c0, ry, rc, rc, p_lv, *itabs)
        jax.block_until_ready(out)
        print(f"intra levels compile+run: {time.perf_counter()-t0:.1f} s "
              f"(levels={tabs[0].shape[0]}, perlevel={tabs[0].shape[1]})",
              flush=True)
        timeit("intra levels", sc, y0, c0, c0, ry, rc, rc, p_lv, *itabs,
               K=K)
        out = None

    y8 = jnp.zeros((K, H, W), jnp.uint8)
    c8 = jnp.zeros((K, H // 2, W // 2), jnp.uint8)
    mrp = jax.jit(jax.vmap(J.make_ref_planes))
    timeit("make_ref_planes", mrp, y8, c8, c8, K=K)

    rs = jnp.zeros((K,), jnp.int32)
    nl, nc = jax.block_until_ready(mrp(y8, c8, c8))
    t0 = time.perf_counter()
    refL, refC = B.update_refs(refL, refC, nl, nc, rs)
    jax.block_until_ready((refL, refC))
    print(f"update_refs (donated, incl compile): "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

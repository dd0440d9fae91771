#!/usr/bin/env python3
"""Split one real 1080p K-lane lockstep step into H2D / device-compute /
D2H on the real chip.  The bench's lane-prof lumps phases into blocking
buckets; this tool answers which one owns the per-step wall time.

Uses the bench stream (tools cache beside bench.py's CACHE path), parses
the first two frames of each of the first K GOPs through the native front
end, forms the exact step inputs _decode_group would, then times each
phase with per-call blocking.

Usage: python tools/profile_step.py [K]
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
    from edge264_tpu.parallel.batch import _Lane, _stack_level_tables
    from edge264_tpu.parallel.gop import split_gops
    from edge264_tpu.ops import jaxdec as J
    from edge264_tpu.ops import batched as B

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    data = bench.build_stream()
    gops = split_gops(data)[:K]
    assert len(gops) == K, f"stream has only {len(gops)} GOPs"
    S = 8
    lanes = [_Lane(g) for g in gops]
    for ln in lanes:
        ln.S = S
        ln.ring_free = list(range(S))

    def step_inputs(step, keep, coef8):
        planes_list, sm4s, sm8s, ring_slots, slot_maps, tabs = \
            [], [], [], [], [], []
        for ln in lanes:
            slot, _fid, is_ref = ln.done_slots[step]
            pl = ln.nd.planes(slot)
            planes_list.append(pl)
            tabs.append(J.intra_level_tables(
                np.asarray(pl.mb_flags), pl.mb_w, pl.mb_h))
            sm4s.append(np.asarray(pl.sm4).astype(np.int32))
            ws8 = np.full((6, 64), 16, np.int32)
            ws8[0] = pl.sm8[0]
            ws8[1] = pl.sm8[1]
            sm8s.append(ws8)
            if is_ref and ln.ring_free:
                ri = ln.ring_free.pop()
                ln.ring_map[slot] = ri
            else:
                ri = S
            ln.slot_ring[slot] = ri
            ring_slots.append(ri)
            smap = np.zeros(32, np.int32)
            for s_, r_ in ln.ring_map.items():
                smap[s_] = min(r_, S - 1)
            slot_maps.append(smap)
        t0 = time.perf_counter()
        meta = B.pack_meta(sm4s, sm8s, slot_maps, ring_slots)
        bufnp, layout, meta_off = J.pack_planes_batch(
            planes_list, planes_list[0], keep=keep, coef8=coef8,
            extra=meta)
        pack_s = time.perf_counter() - t0
        return bufnp, tabs, planes_list, layout, meta_off, pack_s

    for ln in lanes:
        ln.parse_next_frame()
    keep = set()
    for ln in lanes:
        fl = np.asarray(ln.nd.planes(ln.done_slots[0][0]).mb_flags)
        if (fl & 8).any():
            keep |= {"coef_y8", "i8_modes"}
        if (fl & 4).any():
            keep |= {"pcm_y", "pcm_c"}
        if (fl & 256).any():
            keep |= {"mb_errors", "slice_id"}
    coef8 = all(J.coef_fits_int8(ln.nd.planes(ln.done_slots[0][0]))
                for ln in lanes)
    mbW = lanes[0].fmt["mb_w"]
    mbH = lanes[0].fmt["mb_h"]
    print(f"K={K} geom {mbW}x{mbH} coef8={coef8} keep={sorted(keep)}",
          flush=True)

    arenas_h, tabs, planes_list, layout, meta_off, pack_s = \
        step_inputs(0, keep, coef8)
    print(f"arena: {arenas_h.nbytes/1e6:.1f} MB for K={K} "
          f"({arenas_h.nbytes/K/1e6:.2f} MB/frame); pack {pack_s:.2f}s",
          flush=True)

    # a fault from a previous process wedges the chip for a while; wait
    # until it answers a tiny jit before measuring anything
    bench.device_health_check(time.monotonic() + 1200)

    def h2d(x):
        return jax.block_until_ready(jnp.asarray(x))

    def timed(label, fn, *a, n=3, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)
        best = 1e30
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:8.1f} ms  ({best/K*1e3:6.1f} ms/frame)",
              flush=True)
        return out

    # H2D phase
    t0 = time.perf_counter()
    arenas = h2d(arenas_h)
    print(f"H2D arena (cold): {(time.perf_counter()-t0)*1e3:8.1f} ms "
          f"({arenas_h.nbytes/1e6/(time.perf_counter()-t0):.1f} MB/s)",
          flush=True)
    arenas = timed("H2D arena", h2d, arenas_h)

    refL, refC = B.alloc_ref_rings(K, S, mbW, mbH)
    jax.block_until_ready((refL, refC))

    itabs = _stack_level_tables(tabs, planes_list)
    mode0 = "sheared" if itabs is None else "levels"
    print(f"step-0 intra_mode={mode0}", flush=True)
    emit = os.environ.get("E264T_PROF_EMIT", "flat")

    def step(a, refs, it, mode, mc):
        return B.decode_batch_step(a, refs, it, layout=layout,
                                   meta_off=meta_off, mbW=mbW, mbH=mbH,
                                   has_b=True, intra_mode=mode, mc=mc,
                                   emit=emit, update=True)

    def timed_step(label, a, it, mode, mc, refs, n=3):
        # rings are DONATED: chain each call's returned rings into the
        # next call instead of reusing a consumed buffer
        out = step(a, refs, it, mode, mc)
        jax.block_until_ready(out)
        best = 1e30
        for _ in range(n):
            refs = out[4:6]
            t0 = time.perf_counter()
            out = step(a, refs, it, mode, mc)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best*1e3:8.1f} ms  "
              f"({best/K*1e3:6.1f} ms/frame)", flush=True)
        return out

    it0 = None if itabs is None else h2d(itabs)
    t0 = time.perf_counter()
    out = step(arenas, (refL, refC), it0, mode0, False)
    jax.block_until_ready(out)
    print(f"step-0 compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    y, cb, cr, aux, refL, refC = timed_step(
        "device step-0 (IDR)", arenas, it0, mode0, False, out[4:6])

    # D2H phase
    def d2h(x):
        return np.asarray(jax.device_get(x))

    t0 = time.perf_counter()
    _ = d2h(aux)
    dt = time.perf_counter() - t0
    print(f"D2H aux ({emit}): {dt*1e3:8.1f} ms ({aux.nbytes/1e6:.1f} MB, "
          f"{aux.nbytes/1e6/dt:.1f} MB/s)", flush=True)
    del y, cb, cr, out, aux   # HBM headroom for step-1

    # step 1 (P/B): parse one more frame per lane
    for ln in lanes:
        ln.parse_next_frame()
    arenas_h1, tabs1, planes1, layout1, meta_off1, pack_s1 = \
        step_inputs(1, keep, coef8)
    print(f"step-1 pack {pack_s1:.2f}s "
          f"({arenas_h1.nbytes/1e6:.1f} MB)", flush=True)
    arenas1 = timed("H2D arena step-1", h2d, arenas_h1)
    itabs1 = _stack_level_tables(tabs1, planes1)
    mode1 = "sheared" if itabs1 is None else "levels"
    it1 = None if itabs1 is None else h2d(itabs1)
    print(f"step-1 intra_mode={mode1}", flush=True)
    t0 = time.perf_counter()
    out1 = step(arenas1, (refL, refC), it1, mode1, True)
    jax.block_until_ready(out1)
    print(f"step-1 compile+run: {time.perf_counter()-t0:.1f} s",
          flush=True)
    timed_step("device step-1 (P/B)", arenas1, it1, mode1, True,
               out1[4:6])
    for ln in lanes:
        ln.nd.close()


if __name__ == "__main__":
    main()

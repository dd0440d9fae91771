#!/usr/bin/env python3
"""Split one real 1080p K-lane lockstep step into H2D / device-compute /
D2H on the real chip.  The bench's lane-prof lumps all three into one
blocking bucket (batch.py step_np); this tool answers which one owns the
~1 s/frame measured in round 3.

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
        mbW = lanes[0].fmt["mb_w"] if lanes[0].fmt else None
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
        packed = []
        layout = None
        for pl in planes_list:
            a, layout = J.pack_planes(pl, keep=keep, coef8=coef8)
            packed.append(a)
        arenas_h = np.stack([np.asarray(a) for a in packed])
        pack_s = time.perf_counter() - t0
        return (arenas_h, np.stack(sm4s), np.stack(sm8s),
                np.array(ring_slots), np.stack(slot_maps), tabs,
                planes_list, layout, pack_s)

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

    (arenas_h, sm4_h, sm8_h, ring_h, smap_h, tabs, planes_list, layout,
     pack_s) = step_inputs(0, keep, coef8)
    print(f"arena: {arenas_h.nbytes/1e6:.1f} MB for K={K} "
          f"({arenas_h.nbytes/K/1e6:.2f} MB/frame); pack {pack_s:.2f}s",
          flush=True)

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
    sm4b, sm8b = h2d(sm4_h), h2d(sm8_h)
    ring_d, smap_d = h2d(ring_h), h2d(smap_h)

    refL, refC = B.alloc_ref_rings(K, S, mbW, mbH)
    jax.block_until_ready((refL, refC))

    itabs = _stack_level_tables(tabs, planes_list)
    mode0 = "sheared" if itabs is None else "levels"
    print(f"step-0 intra_mode={mode0}", flush=True)

    def step(a, s4, s8, mc, it, mode):
        return B.decode_batch_step(a, s4, s8, mc, it, layout=layout,
                                   mbW=mbW, mbH=mbH, has_b=True,
                                   make_refs=True, intra_mode=mode)

    t0 = time.perf_counter()
    out = step(arenas, sm4b, sm8b, None, None if itabs is None else
               tuple(map(h2d, (np.asarray(t) for t in itabs))), mode0)
    jax.block_until_ready(out)
    print(f"step-0 compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    y, cb, cr, newL, newC = timed("device step-0 (IDR)", step, arenas,
                                  sm4b, sm8b, None, None if itabs is None
                                  else tuple(map(h2d, (np.asarray(t) for t
                                                       in itabs))), mode0)
    refL, refC = B.update_refs(refL, refC, newL, newC, ring_d)
    jax.block_until_ready((refL, refC))

    # D2H phase
    from edge264_tpu.parallel.batch import _flatten_out
    flat = jax.block_until_ready(_flatten_out(y, cb, cr))

    def d2h(x):
        return np.asarray(jax.device_get(x))

    t0 = time.perf_counter()
    _ = d2h(flat)
    dt = time.perf_counter() - t0
    print(f"D2H flat out: {dt*1e3:8.1f} ms ({flat.nbytes/1e6:.1f} MB, "
          f"{flat.nbytes/1e6/dt:.1f} MB/s)", flush=True)
    del y, cb, cr, newL, newC, out, flat   # HBM headroom for step-1

    # step 1 (P/B): parse one more frame per lane
    for ln in lanes:
        ln.parse_next_frame()
    (arenas_h1, sm4_h1, sm8_h1, ring_h1, smap_h1, tabs1, planes1, layout1,
     pack_s1) = step_inputs(1, keep, coef8)
    print(f"step-1 pack {pack_s1:.2f}s "
          f"({arenas_h1.nbytes/1e6:.1f} MB)", flush=True)
    arenas1 = timed("H2D arena step-1", h2d, arenas_h1)
    itabs1 = _stack_level_tables(tabs1, planes1)
    mode1 = "sheared" if itabs1 is None else "levels"
    it1 = None if itabs1 is None else tuple(
        map(h2d, (np.asarray(t) for t in itabs1)))
    mc = (refL, refC, h2d(smap_h1))
    print(f"step-1 intra_mode={mode1}", flush=True)
    t0 = time.perf_counter()
    out1 = step(arenas1, h2d(sm4_h1), h2d(sm8_h1), mc, it1, mode1)
    jax.block_until_ready(out1)
    print(f"step-1 compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    timed("device step-1 (P/B)", step, arenas1, h2d(sm4_h1), h2d(sm8_h1),
          mc, it1, mode1)
    for ln in lanes:
        ln.nd.close()


if __name__ == "__main__":
    main()

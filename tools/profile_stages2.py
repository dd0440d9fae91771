#!/usr/bin/env python3
"""Per-STAGE device timing of a real 1080p P/B lockstep step with real
D2H fences.  `jax.block_until_ready` is NOT a fence on the axon backend
(a full step "completes" in 0.2 ms); the only reliable fence is a D2H of
computed data — so each stage is timed as enqueue + 1-element D2H of its
output, minus the measured fence floor.

Usage: python tools/profile_stages2.py [K] [reps]
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    data = bench.build_stream()
    gops = split_gops(data)[:K]
    S = 8
    lanes = [_Lane(g) for g in gops]
    for ln in lanes:
        ln.S = S
        ln.ring_free = list(range(S))

    def step_inputs(step):
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
        meta = B.pack_meta(sm4s, sm8s, slot_maps, ring_slots)
        bufnp, layout, meta_off = J.pack_planes_batch(
            planes_list, planes_list[0], keep=set(), coef8=True,
            extra=meta)
        itabs = _stack_level_tables(tabs, planes_list)
        return bufnp, layout, meta_off, itabs

    for ln in lanes:
        ln.parse_next_frame()
    mbW, mbH = lanes[0].fmt["mb_w"], lanes[0].fmt["mb_h"]
    print(f"K={K} geom {mbW}x{mbH}", flush=True)

    bench.device_health_check(time.monotonic() + 1500)

    tiny = jax.jit(lambda a: a.ravel()[:1].astype(jnp.int32) * 1)

    def fence(x):
        return np.asarray(tiny(x))

    def timed(label, fn, *a, chain=None, **kw):
        """fn enqueues; fence(out leaf) waits for real completion."""
        outs = []
        best = 1e30
        for _ in range(reps + 1):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            leaf = out[0] if isinstance(out, tuple) else out
            fence(leaf)
            dt = time.perf_counter() - t0
            best = min(best, dt)
            outs.append(out)
            if chain is not None:
                a = chain(a, out)
        print(f"{label:28s}: {best*1e3:8.1f} ms ({best/K*1e3:6.1f} "
              f"ms/frame)", flush=True)
        return outs[-1]

    # fence floor
    z = jax.device_put(np.zeros(8, np.int32))
    fence(z)
    t0 = time.perf_counter()
    for _ in range(5):
        fence(z)
    print(f"fence floor: {(time.perf_counter()-t0)/5*1e3:.1f} ms",
          flush=True)

    # ---- step 0 (IDR) through the step API to fill the rings
    buf0, layout0, moff0, itabs0 = step_inputs(0)
    arenas0 = jnp.asarray(buf0)
    refs = B.alloc_ref_rings(K, S, mbW, mbH)
    t0 = time.perf_counter()
    os.environ["E264T_FUSE"] = "split"
    y, cb, cr, aux, refL, refC = B.decode_batch_step(
        arenas0, refs, None, layout=layout0, meta_off=moff0, mbW=mbW,
        mbH=mbH, has_b=True, intra_mode="sheared", mc=False,
        emit="digest", update=True)
    fence(aux)
    print(f"step-0 (IDR, sheared) cold: {time.perf_counter()-t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    y, cb, cr, aux, refL, refC = B.decode_batch_step(
        arenas0, (refL, refC), None, layout=layout0, meta_off=moff0,
        mbW=mbW, mbH=mbH, has_b=True, intra_mode="sheared", mc=False,
        emit="digest", update=True)
    fence(aux)
    print(f"step-0 (IDR, sheared) warm: {(time.perf_counter()-t0)*1e3:.0f}"
          f" ms ({(time.perf_counter()-t0)/K*1e3:.0f} ms/frame)",
          flush=True)

    # ---- step 1 (P/B): per-stage
    for ln in lanes:
        ln.parse_next_frame()
    buf1, layout, meta_off, itabs = step_inputs(1)
    arenas = jnp.asarray(buf1)
    fence(arenas)
    for _ in range(2):
        t0 = time.perf_counter()
        a2 = jnp.asarray(np.ascontiguousarray(buf1))
        fence(a2)
        print(f"arena H2D ({buf1.nbytes/1e6:.1f} MB): "
              f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)
    itabs_d = jnp.asarray(itabs) if itabs is not None else None
    print(f"step-1 intra: {'levels ' + str(itabs.shape) if itabs is not None else 'sheared'}",
          flush=True)
    has_t8, has_pcm, mcmode, pallas_db = B._mode_flags(layout, refL, True)
    print(f"mcmode={mcmode} pallas_db={pallas_db}", flush=True)

    sm4, sm8, slot_maps, ring_slots = B._stage_meta(arenas,
                                                    meta_off=meta_off)
    fence(slot_maps)

    res = timed("residual", B._stage_residual, arenas, sm4, sm8,
                layout=layout, has_t8=has_t8)
    res_y, res_cb, res_cr = res

    if mcmode == "pallas":
        pk = timed("mc param pack", B._stage_mc_pack, arenas, slot_maps,
                   layout=layout, has_b=True, mbW=mbW, mbH=mbH)
        flat = timed("mc kernels (Mosaic)", B._stage_mc_kernels, *pk,
                     refL, refC, has_b=True, mbW=mbW, mbH=mbH)
        pred = timed("mc combine", B._stage_mc_combine, arenas,
                     slot_maps, flat, res_y, res_cb, res_cr,
                     layout=layout, has_b=True)
    else:
        pred = timed("mc (XLA)", B._stage_mc, arenas, res_y, res_cb,
                     res_cr, refL, refC, slot_maps, layout=layout,
                     has_b=True, mbW=mbW, mbH=mbH)

    # masked level-rounds (the driver's default): bucket from the max
    # depth across lanes; fall back to sheared when any lane is dense
    tabs_r = [J.intra_round_plane(np.asarray(ln.nd.planes(
        ln.done_slots[1][0]).mb_flags), mbW, mbH) for ln in lanes]
    if all(t is not None for t in tabs_r):
        mode = f"rounds{max(t[1] for t in tabs_r)}"
    else:
        mode = "sheared"
    ycc = timed(f"intra ({mode})", B._stage_intra, pred, res_y, res_cb,
                res_cr, arenas, None, layout=layout, mbW=mbW, mbH=mbH,
                intra_mode=mode, has_t8=has_t8, has_pcm=has_pcm)
    y, cb, cr = ycc
    y8c = timed("deblock", B._stage_deblock, y, cb, cr, arenas,
                layout=layout, mbW=mbW, mbH=mbH, pallas=pallas_db)
    y8, cb8, cr8 = y8c
    fmt = lanes[0].fmt
    crop = (fmt["crop_top"], fmt["crop_right"], fmt["crop_bottom"],
            fmt["crop_left"])
    timed("emit digest", B._stage_emit, y8, cb8, cr8, emit="digest",
          crop=crop)
    timed("refs update (donated)", B.refs_update, refL, refC, y8, cb8,
          cr8, ring_slots,
          chain=lambda a, out: (out[0], out[1]) + a[2:])
    for ln in lanes:
        ln.nd.close()


if __name__ == "__main__":
    main()

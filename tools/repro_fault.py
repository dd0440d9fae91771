#!/usr/bin/env python3
"""Standalone repro for the 1080p second-execution device fault.

Parses one IDR frame of the bench-geometry stream on host, packs its
arena, then executes a configurable subset of the step program N times
with a hard sync between runs.  --stages picks the suspect stage set so
the faulting stage can be bisected without the lane driver.

Usage: python tools/repro_fault.py --stages residual,intra,deblock,refs
       [--runs 3] [--geom 120x68]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def get_planes(mbW, mbH):
    from tools.avcgen import gen_random_cabac_ipb_stream
    from edge264_tpu.native import NativeDecoder, EV_FRAME_DONE
    from edge264_tpu.api import find_start_code
    cache = f"/tmp/e264t_repro_{mbW}x{mbH}.264"
    if os.path.exists(cache):
        data = open(cache, "rb").read()
    else:
        data = gen_random_cabac_ipb_stream(mbW, mbH, n_gops=1, seed=42,
                                           closed=True, gop_pb=0,
                                           density=0.05, max_level=4,
                                           intra_prob=0.05)
        open(cache, "wb").write(data)
    nd = NativeDecoder()
    pos = find_start_code(data, 0) + 3
    done = []
    while pos < len(data) and not done:
        end = find_start_code(data, pos)
        _, events = nd.decode_nal(data[pos:end])
        done += [e[1] for e in events if e[0] == EV_FRAME_DONE]
        while nd.get_frame(borrow=True):
            pass
        pos = end + 3
    return nd, nd.planes(done[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="residual,intra,deblock,refs")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--geom", default="120x68")
    ap.add_argument("--split", action="store_true",
                    help="run each stage as its own jit program")
    args = ap.parse_args()
    stages = set(args.stages.split(",")) if args.stages else set()
    mbW, mbH = (int(x) for x in args.geom.split("x"))

    import jax
    import jax.numpy as jnp
    import functools
    from edge264_tpu.ops import jaxdec as J
    from edge264_tpu.ops import oracle as _o

    # wait for a healthy device first: a fault from a PREVIOUS process
    # wedges the chip for a while and would contaminate this experiment
    import bench
    bench.device_health_check(time.monotonic() + 600)

    nd, pl = get_planes(mbW, mbH)
    sm4 = np.asarray(pl.sm4).astype(np.int32)
    ws8 = np.full((6, 64), 16, np.int32)
    ws8[0] = pl.sm8[0]
    ws8[1] = pl.sm8[1]
    arena_np, layout = J.pack_planes(pl, coef8=True)
    arena_np = np.asarray(arena_np)
    print(f"arena {arena_np.nbytes/1e6:.1f} MB, stages={sorted(stages)}",
          flush=True)

    norm4 = jnp.asarray(_o.NORM_ADJUST_4x4.reshape(6, 16))
    norm8 = jnp.asarray(_o.NORM_ADJUST_8x8.reshape(6, 64))

    present = {k for k, _, _, off, _m in layout if off != -1}
    has_t8 = "coef_y8" in present
    has_pcm = "pcm_y" in present

    @jax.jit
    def unpack(arena):
        return jax.vmap(lambda a: J._unpack_planes(a, layout))(arena)

    @jax.jit
    def residual(p, sm4, sm8):
        return jax.vmap(lambda pp, s4, s8: J.residual_frame(
            pp, s4, s8, norm4, norm8, has_t8))(p, sm4, sm8)

    @jax.jit
    def intra(y, cb, cr, res_y, res_cb, res_cr, p):
        return jax.vmap(
            lambda yy, cc, rr, ry, rcb, rcr, pp:
            J.intra_scan_sheared(yy, cc, rr, ry, rcb, rcr, pp, mbW,
                                 mbH, has_t8, has_pcm)
        )(y, cb, cr, res_y, res_cb, res_cr, p)

    @jax.jit
    def deblock(y, cb, cr, p):
        bs_v, bs_h = jax.vmap(J.deblock_bs)(p)
        return jax.vmap(
            lambda yy, cc, rr, pp, bv, bh:
            J.deblock_scan(yy, cc, rr, pp, bv, bh, mbW, mbH)
        )(y, cb, cr, p, bs_v, bs_h)

    @jax.jit
    def refs(y8, cb8, cr8):
        return jax.vmap(J.make_ref_planes)(y8, cb8, cr8)

    def step_split(arena, sm4, sm8):
        p = unpack(arena)
        K = arena.shape[0]
        y = jnp.zeros((K, 16 * mbH, 16 * mbW), jnp.int32)
        cb = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        cr = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        res_y, res_cb, res_cr = (jnp.zeros_like(y), jnp.zeros_like(cb),
                                 jnp.zeros_like(cr))
        if "residual" in stages:
            res_y, res_cb, res_cr = residual(p, sm4, sm8)
        if "intra" in stages:
            y, cb, cr = intra(y, cb, cr, res_y, res_cb, res_cr, p)
        if "deblock" in stages:
            y, cb, cr = deblock(y, cb, cr, p)
        out = [y.astype(jnp.uint8), cb.astype(jnp.uint8),
               cr.astype(jnp.uint8)]
        if "refs" in stages:
            out += list(refs(*out))
        return tuple(out)

    @functools.partial(jax.jit, static_argnames=())
    def step(arena, sm4, sm8):
        p = jax.vmap(lambda a: J._unpack_planes(a, layout))(arena)
        K = arena.shape[0]
        y = jnp.zeros((K, 16 * mbH, 16 * mbW), jnp.int32)
        cb = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        cr = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        res_y = jnp.zeros_like(y)
        res_cb = jnp.zeros_like(cb)
        res_cr = jnp.zeros_like(cr)
        if "residual" in stages:
            res_y, res_cb, res_cr = jax.vmap(
                lambda pp, s4, s8: J.residual_frame(
                    pp, s4, s8, norm4, norm8, has_t8))(p, sm4, sm8)
        if "intra" in stages:
            y, cb, cr = jax.vmap(
                lambda yy, cc, rr, ry, rcb, rcr, pp:
                J.intra_scan_sheared(yy, cc, rr, ry, rcb, rcr, pp, mbW,
                                     mbH, has_t8, has_pcm)
            )(y, cb, cr, res_y, res_cb, res_cr, p)
        if "deblock" in stages:
            bs_v, bs_h = jax.vmap(J.deblock_bs)(p)
            y, cb, cr = jax.vmap(
                lambda yy, cc, rr, pp, bv, bh:
                J.deblock_scan(yy, cc, rr, pp, bv, bh, mbW, mbH)
            )(y, cb, cr, p, bs_v, bs_h)
        y8, cb8, cr8 = (y.astype(jnp.uint8), cb.astype(jnp.uint8),
                        cr.astype(jnp.uint8))
        out = [y8, cb8, cr8]
        if "refs" in stages:
            newL, newC = jax.vmap(J.make_ref_planes)(y8, cb8, cr8)
            out += [newL, newC]
        return tuple(out)

    run = step_split if args.split else step
    for i in range(args.runs):
        t0 = time.perf_counter()
        out = run(jnp.asarray(arena_np[None]), jnp.asarray(sm4[None]),
                  jnp.asarray(ws8[None]))
        jax.block_until_ready(out)
        print(f"run {i}: {time.perf_counter()-t0:.3f}s", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()

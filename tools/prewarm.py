#!/usr/bin/env python3
"""Pre-compile the device pixel programs for a list of frame geometries
into the persistent JAX compilation cache (/tmp/e264t_jax_cache), so a
production decoder's first frame hits the cache instead of paying
minutes of XLA compilation (VERDICT r1: cold first frame must not take
15 minutes).

Usage: python tools/prewarm.py [WxH ...]     (mb units; default 120x68)

Compiles, per geometry: the intra-frame recon program, the inter recon
program (MC rings at the default ring size), and the deblock program —
the complete per-stream program set thanks to sticky layouts and the
pinned ring size (see ops/jaxdec.JaxBackend).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("E264T_PLATFORM"):
    # the axon plugin registers its backend programmatically, outranking
    # JAX_PLATFORMS -- override the same way (e.g. E264T_PLATFORM=cpu)
    import jax
    jax.config.update("jax_platforms", os.environ["E264T_PLATFORM"])


def prewarm(mbW, mbH):
    import jax.numpy as jnp
    import edge264_tpu.ops.jaxdec as J
    from __graft_entry__ import _example_planes

    class _P:
        pass

    planes = _P()
    ex = _example_planes(mbW, mbH)
    for k, v in ex.items():
        setattr(planes, k, np.asarray(v))
    # pack_planes consumes the full PLANE_KEYS list
    planes.mb_errors = np.zeros((mbH, mbW), np.uint8)
    planes.slice_id = np.ones((mbH, mbW), np.uint16)
    planes.mb_w, planes.mb_h = mbW, mbH
    # keep ALL optional planes so the prewarmed layout matches the sticky
    # steady state of long streams
    keep = {"coef_y8", "i8_modes", "pcm_y", "pcm_c"}
    arena, layout = J.pack_planes(planes, keep=keep)
    sm4 = jnp.full((6, 16), 16, jnp.int32)
    sm8 = jnp.full((6, 64), 16, jnp.int32)

    t0 = time.perf_counter()
    y, cb, cr = J.decode_frame_arena(arena, sm4, sm8, None, layout=layout,
                                     mbW=mbW, mbH=mbH)
    np.asarray(y[0, 0])
    print(f"  intra-frame programs: {time.perf_counter()-t0:.1f}s",
          flush=True)

    S = J.JaxBackend.RING_START
    ph, pw = 16 * mbH + 2 * J.PADL, 16 * mbW + 2 * J.PADL
    phc, pwc = 8 * mbH + 2 * J.PADC, 8 * mbW + 2 * J.PADC
    ringL = jnp.zeros((S, 16, ph, pw), jnp.uint8)
    ringC = jnp.zeros((S, 2, phc, pwc), jnp.uint8)
    smap = jnp.zeros(32, jnp.int32)
    t0 = time.perf_counter()
    y, cb, cr = J.decode_frame_inter_arena(
        arena, sm4, sm8, ringL, ringC, smap, None, layout=layout,
        mbW=mbW, mbH=mbH, has_b=True)
    np.asarray(y[0, 0])
    print(f"  inter-frame programs: {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    l4, ch = J.make_ref_planes(y, cb, cr)
    ringL, ringC = J._ring_set(ringL, ringC, jnp.int32(0), l4, ch)
    np.asarray(ringL[0, 0, 0, 0])
    print(f"  ref-ring programs: {time.perf_counter()-t0:.1f}s", flush=True)


def main():
    geoms = [(120, 68)]
    if len(sys.argv) > 1:
        geoms = [tuple(map(int, a.split("x"))) for a in sys.argv[1:]]
    for mbW, mbH in geoms:
        print(f"prewarming {mbW}x{mbH} mbs ({16*mbW}x{16*mbH})...",
              flush=True)
        prewarm(mbW, mbH)
    print("done; cache at", os.environ.get("E264T_JAX_CACHE",
                                           "/tmp/e264t_jax_cache"))


if __name__ == "__main__":
    main()

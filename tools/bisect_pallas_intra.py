#!/usr/bin/env python3
"""Bisect the Mosaic intra-wavefront fault on the real TPU.

The kernel is bit-exact in interpret mode on real decoded planes (so its
semantics are right), and synthetic-plane runs on the chip succeed — the
fault appears only with real-content plane VALUES.  This harness runs the
kernel on real planes with selected plane groups replaced by synthetic
values, halving toward the triggering plane/value combination.

Run on hardware:  python tools/bisect_pallas_intra.py [stage]
Each stage prints PASS/FAULT; after a fault the tunnel needs 15-40 min,
so run ONE stage per invocation, noting results between runs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def real_planes(mbW=120, mbH=68):
    import jax.numpy as jnp
    import edge264_tpu.ops.jaxdec as J
    from edge264_tpu.native import NativeDecoder
    from edge264_tpu.api import find_start_code
    from tools.avcgen import gen_random_intra_stream

    data = gen_random_intra_stream(mbW, mbH, n_frames=1, seed=3,
                                   kinds=("i4", "i16"))
    nd = NativeDecoder()
    pos = find_start_code(data, 0)
    slot = None
    while pos < len(data):
        end = find_start_code(data, pos + 3)
        _, events = nd.decode_nal(data[pos + 3:end])
        for e in events:
            if e[0] == 4:
                slot = e[1]
        while nd.get_frame() is not None:
            pass
        pos = end
    pl = nd.planes(slot)
    keep = {"coef_y8", "i8_modes", "pcm_y", "pcm_c", "mb_errors",
            "slice_id"}
    arena, layout = J.pack_planes(pl, keep=keep)
    return J._unpack_planes(arena, layout), nd


def synthetic_planes(mbW=120, mbH=68):
    import jax.numpy as jnp
    from __graft_entry__ import _example_planes
    return {k: v.astype(jnp.int32) for k, v in _example_planes(
        mbW, mbH).items()}


# plane groups to swap real->synthetic, coarse to fine
GROUPS = [
    ("modes", ["i4_modes", "i16_modes", "ch_modes", "i8_modes"]),
    ("flags", ["mb_flags"]),
    ("coefs", ["coef_y", "coef_y_dc", "coef_c_dc", "coef_cb", "coef_cr",
               "coef_y8", "nz_y"]),
    ("pcm", ["pcm_y", "pcm_c"]),
    ("i4_only", ["i4_modes"]),
    ("i16_only", ["i16_modes"]),
    ("ch_only", ["ch_modes"]),
]


def main():
    import jax.numpy as jnp
    import edge264_tpu.ops.jaxdec as J
    from edge264_tpu.ops.pallas_intra import intra_pallas
    from edge264_tpu.ops import oracle as O

    stage = sys.argv[1] if len(sys.argv) > 1 else "real"
    mbW, mbH = 120, 68
    p, nd = real_planes(mbW, mbH)
    if stage != "real":
        syn = synthetic_planes(mbW, mbH)
        names = dict(GROUPS)[stage]
        p = dict(p)
        for k in names:
            if k in p and k in syn:
                p[k] = syn[k]
        print(f"swapped {names} to synthetic")

    norm4 = jnp.asarray(O.NORM_ADJUST_4x4.reshape(6, 16))
    norm8 = jnp.asarray(O.NORM_ADJUST_8x8.reshape(6, 64))
    sm4 = jnp.full((6, 16), 16, jnp.int32)
    sm8 = jnp.full((6, 64), 16, jnp.int32)
    ry, rcb, rcr = J.residual_frame(p, sm4, sm8, norm4, norm8, True)
    H, W = mbH * 16, mbW * 16
    y = jnp.zeros((H, W), jnp.int32)
    cb = jnp.zeros((H // 2, W // 2), jnp.int32)
    cr = jnp.zeros((H // 2, W // 2), jnp.int32)
    print(f"running stage={stage} on chip...", flush=True)
    got = intra_pallas(y, cb, cr, ry, rcb, rcr, p, mbW, mbH)
    print("result sums:", [int(np.asarray(g).sum()) for g in got])
    ref = J.intra_scan_sheared(y, cb, cr, ry, rcb, rcr, p, mbW, mbH,
                               True, True)
    ok = all(np.array_equal(np.asarray(a), np.asarray(b))
             for a, b in zip(ref, got))
    print("PASS bit-exact" if ok else "MISMATCH (no fault, wrong values)")


if __name__ == "__main__":
    main()

"""Pallas intra-wavefront kernel vs the XLA sheared scan (interpret mode
on CPU; bit-exactness on the real TPU is asserted by tools/profile_stages
and the bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

import edge264_tpu.ops.jaxdec as J
from edge264_tpu.ops.pallas_intra import intra_pallas


def _planes(seed, mbW, mbH):
    from __graft_entry__ import _example_planes
    p = _example_planes(mbW, mbH)
    return {k: v.astype(jnp.int32) for k, v in p.items()}


@pytest.mark.parametrize("seed,mbW,mbH", [(0, 6, 4), (1, 5, 3)])
def test_pallas_intra_matches_sheared(seed, mbW, mbH):
    rng = np.random.RandomState(seed)
    p = _planes(seed, mbW, mbH)
    H, W = mbH * 16, mbW * 16
    y = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.int32))
    cb = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32))
    cr = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32))
    ry = jnp.asarray(rng.randint(-40, 40, (H, W)).astype(np.int32))
    rcb = jnp.asarray(rng.randint(-40, 40, (H // 2, W // 2)).astype(np.int32))
    rcr = jnp.asarray(rng.randint(-40, 40, (H // 2, W // 2)).astype(np.int32))
    ref = J.intra_scan_sheared(y, cb, cr, ry, rcb, rcr, p, mbW, mbH)
    got = intra_pallas(y, cb, cr, ry, rcb, rcr, p, mbW, mbH, interpret=True)
    for name, a, b in zip("y cb cr".split(), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_pallas_intra_real_planes():
    """Interpret-mode bit-exactness on REAL decoded planes (mode enums
    with true availability bits, PCM content, multi-slice boundaries) —
    synthetic planes never produce unavailable edges mid-frame."""
    import edge264_tpu.ops.oracle as O
    from edge264_tpu.native import NativeDecoder
    from edge264_tpu.api import find_start_code
    from tools.avcgen import gen_random_intra_stream

    data = gen_random_intra_stream(6, 5, n_frames=1, seed=9,
                                   slices_per_frame=3)
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
    mbW, mbH = pl.mb_w, pl.mb_h
    keep = {"coef_y8", "i8_modes", "pcm_y", "pcm_c", "mb_errors",
            "slice_id"}
    arena, layout = J.pack_planes(pl, keep=keep)
    p = J._unpack_planes(arena, layout)
    norm4 = jnp.asarray(O.NORM_ADJUST_4x4.reshape(6, 16))
    norm8 = jnp.asarray(O.NORM_ADJUST_8x8.reshape(6, 64))
    sm4 = jnp.full((6, 16), 16, jnp.int32)
    sm8 = jnp.full((6, 64), 16, jnp.int32)
    ry, rcb, rcr = J.residual_frame(p, sm4, sm8, norm4, norm8, True)
    H, W = mbH * 16, mbW * 16
    y = jnp.zeros((H, W), jnp.int32)
    cb = jnp.zeros((H // 2, W // 2), jnp.int32)
    cr = jnp.zeros((H // 2, W // 2), jnp.int32)
    ref = J.intra_scan_sheared(y, cb, cr, ry, rcb, rcr, p, mbW, mbH,
                               True, True)
    got = intra_pallas(y, cb, cr, ry, rcb, rcr, p, mbW, mbH,
                       interpret=True)
    for name, a, b in zip("y cb cr".split(), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    nd.close()

"""Masked level-rounds intra reconstruction (jaxdec.intra_rounds) vs the
sheared wavefront scan — the TPU-native sparse-intra path used by the
lockstep driver on P/B steps (reference mode kernels:
edge264_intra.c:291-765; decode order edge264_slice.c:1651-1849)."""

import numpy as np
import jax.numpy as jnp
import pytest

import edge264_tpu.ops.jaxdec as J


def _lvl(flags):
    t = J.intra_round_plane(np.asarray(flags), flags.shape[1],
                            flags.shape[0], caps=(2, 4, 8, 16, 32))
    assert t is not None or (np.asarray(flags) & 1).mean() > 0.4
    return t


def _unbounded_lvl(flags):
    M = (np.asarray(flags) & 1) > 0
    lvl = M.astype(np.int32)
    for _ in range(1000):
        left = np.pad(lvl, ((0, 0), (1, 0)))[:, :-1]
        top = np.pad(lvl, ((1, 0), (0, 0)))[:-1, :]
        tl = np.pad(lvl, ((1, 0), (1, 0)))[:-1, :-1]
        tr = np.pad(lvl, ((1, 0), (0, 1)))[:-1, 1:]
        new = np.where(M, 1 + np.maximum.reduce([left, top, tl, tr]), 0)
        if np.array_equal(new, lvl):
            return lvl
        lvl = new
    raise AssertionError


@pytest.mark.parametrize("seed,mbW,mbH,sparse", [
    (0, 6, 4, False), (1, 5, 3, False), (2, 8, 6, True), (3, 7, 5, True),
])
def test_rounds_matches_sheared(seed, mbW, mbH, sparse):
    from __graft_entry__ import _example_planes
    rng = np.random.RandomState(seed)
    p = {k: v.astype(jnp.int32)
         for k, v in _example_planes(mbW, mbH).items()}
    if sparse:
        fl = np.asarray(p["mb_flags"]).copy()
        keepm = rng.rand(mbH, mbW) < 0.15
        fl = np.where(keepm, fl, 64 | 32)        # inter elsewhere
        p["mb_flags"] = jnp.asarray(fl)
    H, W = mbH * 16, mbW * 16
    y = jnp.asarray(rng.randint(0, 255, (H, W)).astype(np.int32))
    cb = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32))
    cr = jnp.asarray(rng.randint(0, 255, (H // 2, W // 2)).astype(np.int32))
    ry = jnp.asarray(rng.randint(-40, 40, (H, W)).astype(np.int32))
    rcb = jnp.asarray(
        rng.randint(-40, 40, (H // 2, W // 2)).astype(np.int32))
    rcr = jnp.asarray(
        rng.randint(-40, 40, (H // 2, W // 2)).astype(np.int32))
    ref = J.intra_scan_sheared(y, cb, cr, ry, rcb, rcr, p, mbW, mbH)
    lv = _unbounded_lvl(p["mb_flags"])
    R = max(int(lv.max()), 1)
    # explicit depth plane AND on-device recomputation (lvl=None) agree
    got = J.intra_rounds(y, cb, cr, ry, rcb, rcr, p, jnp.asarray(lv),
                         mbW, mbH, R)
    got2 = J.intra_rounds(y, cb, cr, ry, rcb, rcr, p, None, mbW, mbH, R)
    for name, a, b, c in zip("y cb cr".split(), ref, got, got2):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
        assert np.array_equal(np.asarray(a), np.asarray(c)), name + "-dev"


def test_rounds_real_planes():
    """Real decoded planes: true availability bits at slice boundaries,
    PCM content, T8x8 macroblocks."""
    import edge264_tpu.ops.oracle as O
    from edge264_tpu.native import NativeDecoder
    from edge264_tpu.api import find_start_code
    from tools.avcgen import gen_random_high_stream

    data = gen_random_high_stream(6, 5, n_frames=1, seed=11)
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
    sm4 = jnp.asarray(np.asarray(pl.sm4).astype(np.int32))
    ws8 = np.full((6, 64), 16, np.int32)
    ws8[0] = pl.sm8[0]
    ws8[1] = pl.sm8[1]
    sm8 = jnp.asarray(ws8)
    ry, rcb, rcr = J.residual_frame(p, sm4, sm8, norm4, norm8, True)
    H, W = mbH * 16, mbW * 16
    y = jnp.zeros((H, W), jnp.int32)
    cb = jnp.zeros((H // 2, W // 2), jnp.int32)
    cr = jnp.zeros((H // 2, W // 2), jnp.int32)
    ref = J.intra_scan_sheared(y, cb, cr, ry, rcb, rcr, p, mbW, mbH,
                               True, True)
    lv = _unbounded_lvl(p["mb_flags"])
    got = J.intra_rounds(y, cb, cr, ry, rcb, rcr, p, None, mbW, mbH,
                         max(int(lv.max()), 1))
    for name, a, b in zip("y cb cr".split(), ref, got):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name
    nd.close()


def test_round_plane_buckets():
    flags = np.zeros((4, 8), np.int32)
    t = J.intra_round_plane(flags, 8, 4)
    assert t is not None and t[1] == 2 and t[0].max() == 0
    flags[1, 2] = 1
    flags[1, 3] = 1          # chain of 2
    lvl, R = J.intra_round_plane(flags, 8, 4)
    assert R == 2 and lvl[1, 3] == 2
    dense = np.ones((16, 16), np.int32)
    assert J.intra_round_plane(dense, 16, 16) is None

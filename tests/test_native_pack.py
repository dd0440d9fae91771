"""Native (C++) arena pack vs the numpy reference pack — byte-for-byte
over real decoded frames, all layout configurations (dense/sparse,
int8/int16 coefficients, conditional planes)."""

import os

import numpy as np
import pytest

import edge264_tpu.ops.jaxdec as J
from edge264_tpu.api import find_start_code
from edge264_tpu.native import NativeDecoder, EV_FRAME_DONE


def _decode_slots(data, n=4):
    nd = NativeDecoder()
    pos = find_start_code(data, 0) + 3
    done = []
    while pos < len(data):
        end = find_start_code(data, pos)
        _, events = nd.decode_nal(data[pos:end])
        done += [e[1] for e in events if e[0] == EV_FRAME_DONE]
        while nd.get_frame(borrow=True):
            pass
        pos = end + 3
    return nd, done[:n]


@pytest.mark.parametrize("gen,kw", [
    ("gen_random_cabac_ipb_stream", dict(n_gops=1)),
    ("gen_random_high_cabac_stream", dict(n_frames=2)),
])
def test_native_pack_matches_numpy(gen, kw):
    import tools.avcgen as A
    data = getattr(A, gen)(10, 7, seed=5, **kw)
    nd, slots = _decode_slots(data)
    try:
        for slot in slots:
            pl = nd.planes(slot)
            for coef8 in (False, True):
                for keep in (frozenset(),
                             frozenset({"coef_y8", "i8_modes", "pcm_y",
                                        "pcm_c", "wp", "wp8"})):
                    b1, l1, o1 = J.pack_planes_batch(
                        [pl, None, pl], pl, keep=keep, coef8=coef8,
                        gat_state={})
                    os.environ["E264T_NO_NATIVE_PACK"] = "1"
                    try:
                        b2, l2, o2 = J.pack_planes_batch(
                            [pl, None, pl], pl, keep=keep, coef8=coef8,
                            gat_state={})
                    finally:
                        del os.environ["E264T_NO_NATIVE_PACK"]
                    assert l1 == l2 and o1 == o2
                    assert np.array_equal(np.asarray(b1), np.asarray(b2))
    finally:
        nd.close()


def test_native_pack_dense_no_gat_state():
    """gat_state=None (dense layout) also routes through the native
    packer and matches."""
    from tools.avcgen import gen_random_intra_stream
    data = gen_random_intra_stream(6, 4, n_frames=1, seed=2)
    nd, slots = _decode_slots(data, n=1)
    try:
        pl = nd.planes(slots[0])
        b1, l1, _ = J.pack_planes_batch([pl], pl)
        os.environ["E264T_NO_NATIVE_PACK"] = "1"
        try:
            b2, l2, _ = J.pack_planes_batch([pl], pl)
        finally:
            del os.environ["E264T_NO_NATIVE_PACK"]
        assert l1 == l2
        assert np.array_equal(np.asarray(b1), np.asarray(b2))
    finally:
        nd.close()

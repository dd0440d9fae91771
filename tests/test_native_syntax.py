"""Syntax front-end tests: DPB output order, trace parity with the
reference decoder, robustness (mirrors the reference's test strategy,
SURVEY.md §4: scenario streams + trace oracle)."""

import glob
import os
import random

import pytest

from tests.util import native_decode_all, assert_traces_match

REF_TESTS = "/root/reference/tests"

# streams whose output order must match the reference today; the rest need
# P/B/CABAC support and join this list with those milestones
ORDER_PASS = ["finish-frame", "max-logs", "missing-ps", "nal-ref-idc-0",
              "non-ref-dec-poc", "page-boundaries", "pos-frame-num-idr",
              "unsupp-nals", "zero-cropping"]


@pytest.mark.parametrize("name", ORDER_PASS)
def test_output_order_matches_reference(name, ref_oracle):
    data = open(os.path.join(REF_TESTS, name + ".264"), "rb").read()
    mine, rets, _ = native_decode_all(data)
    ref_frames, _, _ = ref_oracle.decode_yuv(data)
    assert mine == [f[0] for f in ref_frames]


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("shape,slices", [((4, 4), 1), ((6, 3), 2),
                                          ((2, 2), 1), ((8, 5), 3)])
def test_intra_trace_matches_reference(seed, shape, slices, ref_oracle):
    from tools.avcgen import gen_random_intra_stream

    data = gen_random_intra_stream(shape[0], shape[1], n_frames=2, seed=seed,
                                   slices_per_frame=slices)
    ref_trace = ref_oracle.trace(data)
    _, rets, my_trace = native_decode_all(data, log=True)
    assert all(r in (0, 105, 61) for r in rets), rets  # 105 = drain handshake
    assert_traces_match(ref_trace, my_trace,
                        f"seed={seed} shape={shape} slices={slices}")


def test_all_reference_streams_no_crash():
    for f in glob.glob(os.path.join(REF_TESTS, "*.264")):
        native_decode_all(open(f, "rb").read())


def test_fuzz_no_crash():
    from edge264_tpu.native import NativeDecoder

    rng = random.Random(1)
    for _ in range(100):
        d = NativeDecoder()
        for _ in range(5):
            d.decode_nal(bytes([rng.randrange(256)]) +
                         rng.randbytes(rng.randrange(80)))
        d.close()


def test_syntax_planes_shapes():
    from tools.avcgen import gen_random_intra_stream
    from edge264_tpu.native import NativeDecoder, EV_FRAME_DONE

    data = gen_random_intra_stream(4, 2, n_frames=1, seed=7)
    d = NativeDecoder()
    done = []
    from tests.util import iter_nals
    for nal in iter_nals(data):
        _, evs = d.decode_nal(bytes(nal))
        done += [e for e in evs if e[0] == EV_FRAME_DONE]
    assert len(done) == 1
    pl = d.planes(done[0][1])
    assert pl.coef_y.shape == (8, 16, 16)
    assert pl.i4_modes.shape == (8, 16)
    assert pl.qp.shape == (2, 4, 4)
    # every mb was parsed
    assert (pl.mb_flags != 0).all()
    d.close()

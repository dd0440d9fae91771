"""YAML trace <-> bitstream round-trip (tools/yaml2avc.py): the decoder's
log schema doubles as a test-vector input format, like the reference's
gen_avc.py (tests/gen_avc.py:484-509).  stream -> trace -> stream' must
reproduce the trace and the pixels."""

import numpy as np
import pytest

from edge264_tpu.api import decode_annexb, find_start_code
from edge264_tpu.native import NativeDecoder
from tests.util import assert_traces_match
from tools.avcgen import gen_random_intra_stream
from tools.yaml2avc import stream_from_trace


def _trace(data):
    nd = NativeDecoder(log=True, log_mbs=True)
    pos = find_start_code(data, 0)
    logs = []
    while pos < len(data):
        end = find_start_code(data, pos + 3)
        nd.decode_nal(data[pos + 3:end])
        logs.append(nd.get_log())
        while nd.get_frame() is not None:
            pass
        pos = end
    nd.close()
    return "".join(logs)


def _pixels(data):
    return [(np.asarray(f.y).copy(), np.asarray(f.cb).copy(),
             np.asarray(f.cr).copy())
            for f in decode_annexb(data, backend="numpy")]


@pytest.mark.parametrize("seed,shape,frames,slices", [
    (1, (4, 3), 2, 1),
    (2, (6, 5), 3, 1),
    (3, (5, 4), 2, 3),     # multi-slice frames
])
def test_intra_roundtrip(seed, shape, frames, slices):
    data = gen_random_intra_stream(*shape, n_frames=frames, seed=seed,
                                   kinds=("i4", "i16"),
                                   slices_per_frame=slices)
    trace = _trace(data)
    data2 = stream_from_trace(trace)
    assert_traces_match(trace, _trace(data2), "yaml-roundtrip trace")
    p1, p2 = _pixels(data), _pixels(data2)
    assert len(p1) == len(p2)
    for (y1, cb1, cr1), (y2, cb2, cr2) in zip(p1, p2):
        assert np.array_equal(y1, y2)
        assert np.array_equal(cb1, cb2)
        assert np.array_equal(cr1, cr2)


def test_roundtrip_stream_identical_when_canonical():
    """A stream produced by yaml2avc is a FIXED POINT: compiling its own
    trace reproduces it byte-for-byte."""
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=4,
                                   kinds=("i4", "i16"))
    data2 = stream_from_trace(_trace(data))
    data3 = stream_from_trace(_trace(data2))
    assert data2 == data3


def test_pcm_roundtrip():
    """I_PCM raw samples travel through the trace (pcm_samples:, the
    reference's schema edge264_slice.c:908-932) and back."""
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=5,
                                   kinds=("i4", "pcm"))
    trace = _trace(data)
    data2 = stream_from_trace(trace)
    assert_traces_match(trace, _trace(data2), "pcm-roundtrip trace")
    p1, p2 = _pixels(data), _pixels(data2)
    assert len(p1) == len(p2)
    for (y1, cb1, cr1), (y2, cb2, cr2) in zip(p1, p2):
        assert np.array_equal(y1, y2)
        assert np.array_equal(cb1, cb2)
        assert np.array_equal(cr1, cr2)


def test_cropping_roundtrip():
    """frame_crop_offsets (logged in luma pixels) survive the trace ->
    stream -> trace cycle."""
    data = gen_random_intra_stream(3, 2, n_frames=1, seed=6,
                                   kinds=("i4", "i16"))
    from tools.avcgen import make_sps
    sps = make_sps(3, 2, crop=(1, 2, 1, 2))     # chroma units
    p1 = find_start_code(data, find_start_code(data, 0) + 3)
    data = sps + data[p1:]
    trace = _trace(data)
    assert "frame_crop_offsets: {left: 2, right: 4, top: 2, bottom: 4}" \
        in trace
    data2 = stream_from_trace(trace)
    assert_traces_match(trace, _trace(data2), "crop-roundtrip")
    p1, p2 = _pixels(data), _pixels(data2)
    assert p1[0][0].shape == p2[0][0].shape == (32 - 6, 48 - 6)
    assert np.array_equal(p1[0][0], p2[0][0])


@pytest.mark.parametrize("gen,kw", [
    ("gen_random_cabac_ipb_stream", dict(n_gops=2, seed=3)),
    ("gen_random_ipp_stream", dict(n_frames=3, seed=4)),
    ("gen_random_ipb_stream", dict(n_gops=2, seed=5)),
])
def test_inter_roundtrip(gen, kw):
    """P/B + CABAC traces compile back (VERDICT r4 #9): the CABAC mb
    logs carry residual levels (mb_cabac.cpp log_block_cabac), inter
    macroblocks rebuild from mb_type/sub_mb_types/ref_idx/mvds."""
    import tools.avcgen as A
    data = getattr(A, gen)(6, 5, **kw)
    trace = _trace(data)
    data2 = stream_from_trace(trace)
    assert_traces_match(trace, _trace(data2), gen)
    p1, p2 = _pixels(data), _pixels(data2)
    assert len(p1) == len(p2)
    for f1, f2 in zip(p1, p2):
        for a, b in zip(f1, f2):
            assert np.array_equal(a, b)

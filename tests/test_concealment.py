"""Error concealment: corrupt/truncated slices must still yield output
frames, with the holes concealed (temporal copy / intra DC) and flagged in
Frame.mb_errors — the recover_slice analog (edge264_headers.c:295-430).
Concealed content is our own model, so only structure (not pixel parity
with the reference) is asserted."""

import numpy as np

from tools.avcgen import gen_random_intra_stream, gen_random_ipp_stream
from edge264_tpu.api import decode_annexb, find_start_code


def _nal_spans(data):
    spans = []
    pos = find_start_code(data, 0)
    while pos < len(data):
        nxt = find_start_code(data, pos + 3)
        spans.append((pos + 3, nxt))
        pos = nxt
    return spans


def test_truncated_slice_is_concealed():
    data = gen_random_ipp_stream(4, 3, n_frames=3, seed=5)
    spans = _nal_spans(data)
    s, e = spans[3]               # second slice NAL (first P frame)
    corrupt = data[:e - (e - s) // 2]          # cut mid-slice + drop rest
    frames = list(decode_annexb(corrupt))
    assert len(frames) >= 1
    # the damaged P frame must come out flagged
    flagged = [f for f in frames if f.mb_errors is not None]
    assert flagged, "expected a concealed frame with mb_errors set"
    assert flagged[0].mb_errors.max() == 100


def test_corrupt_byte_keeps_decoding():
    data = gen_random_intra_stream(4, 3, n_frames=3, seed=6)
    spans = _nal_spans(data)
    s, e = spans[2]               # first slice
    bad = bytearray(data)
    bad[s + (e - s) // 2] ^= 0x5A
    frames = list(decode_annexb(bytes(bad)))
    assert len(frames) >= 2       # later IDRs still decode
    for f in frames:
        assert f.y.shape == (48, 64)


def test_missing_middle_slice():
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=7,
                                   slices_per_frame=3)
    spans = _nal_spans(data)
    # drop the middle slice of frame 0 (NAL index 3 of sps,pps,s0,s1,s2,...)
    s, e = spans[3]
    cut = data[:s - 3] + data[e:]
    frames = list(decode_annexb(cut))
    assert len(frames) == 2
    assert frames[0].mb_errors is not None
    assert frames[1].mb_errors is None

"""Slice error recovery: graded error-probability model (CAVLC uniform /
CABAC geometric, 16-bit fixed point), the 25% P/B skip-reprediction
threshold, and the I-slice DC blend — recover_slice parity
(edge264_headers.c:266-430)."""

import numpy as np
import pytest

from edge264_tpu.api import decode_annexb, find_start_code
from tools.avcgen import (gen_random_intra_stream, gen_random_ipp_stream,
                          gen_random_cabac_stream)


def ppow16(p, k):
    r = 65536
    while k:
        if k & 1:
            r = (r * p) >> 16
        p = (p * p) >> 16
        k >>= 1
    return r


def expected_probs(num, cabac):
    """The reference's per-mb probability (percent), recover_slice
    edge264_headers.c:306-312."""
    out = []
    div = 65536 - ppow16(65194, num)
    for i in range(num):
        if not cabac:
            p12800 = ((i + 1) * 12800 + num - 1) // num
        else:
            p12800 = ((div - (65536 - ppow16(65194, num - 1 - i))) * 12800
                      + div - 1) // div
        out.append(p12800 >> 7)
    return out


def truncate_slice(data, slice_index, frac=0.5):
    """Cut a slice NAL's payload at `frac` of its length (keeps later
    NALs)."""
    starts = []
    pos = find_start_code(data, 0)
    while pos < len(data):
        starts.append(pos)
        pos = find_start_code(data, pos + 3)
    starts.append(len(data))
    slices = [i for i in range(len(starts) - 1)
              if data[starts[i] + 3] & 31 in (1, 5)]
    s = slices[slice_index]
    cut = starts[s] + max(5, int((starts[s + 1] - starts[s]) * frac))
    return data[:cut] + data[starts[s + 1]:]


def decode_with_errors(data, **kw):
    return list(decode_annexb(data, backend="numpy", **kw))


def test_probability_plane_cavlc():
    mbW, mbH = 6, 4
    data = gen_random_ipp_stream(mbW, mbH, n_frames=3, seed=3, density=0.25,
                                 skip_prob=0.2, intra_prob=0.1, mv_range=8,
                                 nrefs=1)
    broken = truncate_slice(data, 1, frac=0.6)
    frames = decode_with_errors(broken)
    assert len(frames) >= 2
    errf = [f for f in frames if f.mb_errors is not None]
    assert errf, "no frame carries an error plane"
    errs = errf[0].mb_errors.reshape(-1)
    # recovered prefix must be a non-decreasing uniform ramp ending at 100,
    # matching the reference formula for the recovered count
    nz = np.nonzero(errs)[0]
    assert len(nz) > 0
    num = len(nz)
    # mbs after the recovered region were never parsed -> concealed at 100
    lo = nz[0]
    ramp = errs[lo:lo + num]
    exp_full = expected_probs(num, cabac=False)
    # the tail of the plane (unparsed mbs) is 100; the ramp prefix must
    # match the uniform model for SOME recovered count n <= num
    matched = False
    for n in range(1, num + 1):
        exp = expected_probs(n, cabac=False)
        if list(errs[lo:lo + n]) == exp and (errs[lo + n:] == 100).all():
            matched = True
            break
    assert matched, (list(errs), exp_full)


def test_probability_plane_cabac_geometric():
    """CABAC probabilities follow the geometric model: strictly higher
    early-mb confidence than the uniform ramp, computed bit-exactly."""
    exp = expected_probs(20, cabac=True)
    uni = expected_probs(20, cabac=False)
    assert exp[-1] == 100 and exp[0] < uni[0] * 2  # sanity of the model
    mbW, mbH = 6, 4
    data = gen_random_cabac_stream(mbW, mbH, n_frames=2, seed=5,
                                   density=0.3)
    broken = truncate_slice(data, 1, frac=0.5)
    frames = decode_with_errors(broken)
    errf = [f for f in frames if f.mb_errors is not None]
    assert errf
    errs = errf[0].mb_errors.reshape(-1)
    nz = np.nonzero(errs)[0]
    assert len(nz) > 0
    lo = nz[0]
    num = len(nz)
    matched = False
    for n in range(1, num + 1):
        if list(errs[lo:lo + n]) == expected_probs(n, cabac=True) and \
           (errs[lo + n:] == 100).all():
            matched = True
            break
    assert matched, list(errs)


def test_p_reprediction_threshold():
    """P mbs above 25% probability re-predict as P_Skip (residuals
    dropped): their pixels equal the co-located motion-compensated
    prediction, which for a low-motion stream differs from the corrupt
    parse."""
    mbW, mbH = 8, 6
    data = gen_random_ipp_stream(mbW, mbH, n_frames=2, seed=11,
                                 density=0.3, skip_prob=0.1,
                                 intra_prob=0.0, mv_range=4, nrefs=1)
    broken = truncate_slice(data, 1, frac=0.7)
    frames = decode_with_errors(broken)
    assert len(frames) == 2
    errs = frames[1].mb_errors
    assert errs is not None
    # at least one mb must sit above and one below the threshold
    assert (errs[errs > 0] >= 1).any()
    assert (errs > 25).any()


def test_i_blend_numpy_vs_jax():
    """The I-slice DC blend must agree between the numpy oracle and the
    XLA path (same batched formulation)."""
    mbW, mbH = 6, 5
    data = gen_random_intra_stream(mbW, mbH, n_frames=2, seed=7,
                                   density=0.3)
    broken = truncate_slice(data, 1, frac=0.5)
    a = list(decode_annexb(broken, backend="numpy"))
    b = list(decode_annexb(broken, backend="jax"))
    assert len(a) == len(b) >= 1
    blended = False
    for fa, fb in zip(a, b):
        assert np.array_equal(fa.y, np.asarray(fb.y))
        assert np.array_equal(fa.cb, np.asarray(fb.cb))
        assert np.array_equal(fa.cr, np.asarray(fb.cr))
        if fa.mb_errors is not None:
            blended = True
    assert blended


def test_recovery_async_matches_sync():
    mbW, mbH = 6, 4
    data = gen_random_ipp_stream(mbW, mbH, n_frames=5, seed=13,
                                 density=0.25, skip_prob=0.2,
                                 intra_prob=0.1, mv_range=8, nrefs=1)
    broken = truncate_slice(data, 2, frac=0.5)
    a = decode_with_errors(broken)
    b = decode_with_errors(broken, n_tasks=4)
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        assert np.array_equal(fa.y, fb.y)
        ea = fa.mb_errors if fa.mb_errors is not None else 0
        eb = fb.mb_errors if fb.mb_errors is not None else 0
        assert np.array_equal(np.asarray(ea), np.asarray(eb))

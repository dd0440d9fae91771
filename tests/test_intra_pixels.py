"""End-to-end intra pixel path: decode generated streams with the numpy
oracle backend and compare YUV bit-exactly against the reference decoder
(BASELINE.md config #1: intra-only CAVLC 4:2:0)."""

import numpy as np
import pytest

from tools.avcgen import gen_random_intra_stream
from tools.ref_oracle import RefOracle
from edge264_tpu.api import Decoder, decode_annexb


@pytest.fixture(scope="module")
def oracle():
    return RefOracle.build()


def _decode_ours(data, backend="numpy"):
    return list(decode_annexb(data, backend=backend))


def _ref_frames(oracle, data):
    """Reference YUV as list of (y, cb, cr) uint8 arrays."""
    metas, yuv, _ = oracle.decode_yuv(data)
    out = []
    pos = 0
    for fid, wy, hy, wc, hc in metas:
        y = np.frombuffer(yuv, np.uint8, wy * hy, pos).reshape(hy, wy)
        pos += wy * hy
        cb = np.frombuffer(yuv, np.uint8, wc * hc, pos).reshape(hc, wc)
        pos += wc * hc
        cr = np.frombuffer(yuv, np.uint8, wc * hc, pos).reshape(hc, wc)
        pos += wc * hc
        out.append((fid, y, cb, cr))
    return out


def assert_frames_match(ours, refs, ctx=""):
    assert len(ours) == len(refs), \
        f"{ctx}: frame count {len(ours)} vs ref {len(refs)}"
    for i, (f, (fid, ry, rcb, rcr)) in enumerate(zip(ours, refs)):
        for name, a, b in (("Y", f.y, ry), ("Cb", f.cb, rcb),
                           ("Cr", f.cr, rcr)):
            assert a.shape == b.shape, \
                f"{ctx} frame {i} {name}: shape {a.shape} vs {b.shape}"
            if not np.array_equal(a, b):
                bad = np.argwhere(a != b)
                y0, x0 = bad[0]
                raise AssertionError(
                    f"{ctx} frame {i} {name}: {len(bad)} mismatches, first at "
                    f"({y0},{x0}): got {a[y0, x0]} want {b[y0, x0]}\n"
                    f"got block:\n{a[y0 & ~3:(y0 & ~3) + 4, x0 & ~3:(x0 & ~3) + 4]}\n"
                    f"want block:\n{b[y0 & ~3:(y0 & ~3) + 4, x0 & ~3:(x0 & ~3) + 4]}")


@pytest.mark.parametrize("kinds,seed", [
    (("pcm",), 0),           # pure PCM: isolates plane/copy plumbing
    (("i16",), 1),           # I16x16: 16x16 pred + DC hadamard + AC
    (("i4",), 2),            # I4x4: all 9 modes + 4x4 idct
    (("i4", "i16", "pcm"), 3),
])
def test_intra_kinds_bit_exact(oracle, kinds, seed):
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=seed, deblock=False, kinds=kinds)
    assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                        ctx=f"kinds={kinds}")


def test_intra_larger_frame(oracle):
    data = gen_random_intra_stream(8, 5, n_frames=2, seed=7, deblock=False, density=0.5,
                                   max_level=30)
    assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                        ctx="8x5")


def test_intra_multi_slice(oracle):
    data = gen_random_intra_stream(6, 4, n_frames=2, seed=11, deblock=False,
                                   slices_per_frame=3)
    assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                        ctx="multi-slice")


def test_intra_qp_extremes(oracle):
    for qp in (0, 10, 40, 51):
        data = gen_random_intra_stream(4, 3, n_frames=1, seed=qp, deblock=False, qp=qp,
                                       kinds=("i4", "i16"))
        assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                            ctx=f"qp={qp}")

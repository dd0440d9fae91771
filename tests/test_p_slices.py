"""P slices: inter syntax (skip runs, partitions, sub-mbs, ref_idx, mvd +
median MVP) and the motion-compensation pixel path, bit-exact vs the
reference (BASELINE.md config #2)."""

import pytest

from tools.avcgen import gen_random_ipp_stream
from tests.util import native_decode_all, assert_traces_match
from tests.test_intra_pixels import _decode_ours, _ref_frames, \
    assert_frames_match


# -- syntax level: per-mb trace equality ------------------------------------

@pytest.mark.parametrize("seed,kw", [
    (1, dict(skip_prob=0.9, intra_prob=0.0)),        # mostly skips
    (2, dict(skip_prob=0.0, intra_prob=0.0, mv_range=8)),
    (3, dict(nrefs=2)),
    (4, dict(nrefs=3, mv_range=64)),
    (5, dict(intra_prob=0.5)),
])
def test_p_trace(ref_oracle, seed, kw):
    data = gen_random_ipp_stream(4, 3, n_frames=3, seed=seed, **kw)
    ref_trace = ref_oracle.trace(data)
    _, rets, my_trace = native_decode_all(data, log=True)
    assert_traces_match(ref_trace, my_trace, ctx=f"p-trace seed={seed}")


# -- pixel level: bit-exact YUV ---------------------------------------------

@pytest.mark.parametrize("deblock", [False, True])
def test_p_pixels(ref_oracle, deblock):
    data = gen_random_ipp_stream(4, 3, n_frames=4, seed=7, deblock=deblock,
                                 nrefs=2)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"p-pixels deblock={deblock}")


def test_p_pixels_motion_heavy(ref_oracle):
    """Large mv range: exercises every qpel case + edge extension."""
    data = gen_random_ipp_stream(5, 4, n_frames=4, seed=11, mv_range=96,
                                 skip_prob=0.1, intra_prob=0.1, nrefs=3)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx="p-pixels-motion")


def test_p_pixels_no_residual(ref_oracle):
    """Pure MC (no coefficients): isolates interpolation."""
    data = gen_random_ipp_stream(4, 3, n_frames=3, seed=13, density=0.0,
                                 deblock=False, intra_prob=0.0, mv_range=48)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx="p-pixels-pure-mc")

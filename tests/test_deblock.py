"""Deblocking filter bit-exactness vs the reference (intra streams with the
in-loop filter enabled — the default for real streams)."""

import pytest

from tools.avcgen import gen_random_intra_stream
from tools.ref_oracle import RefOracle
from tests.test_intra_pixels import _decode_ours, _ref_frames, \
    assert_frames_match


@pytest.fixture(scope="module")
def oracle():
    return RefOracle.build()


@pytest.mark.parametrize("kinds,seed", [
    (("i16",), 1),
    (("i4",), 2),
    (("i4", "i16", "pcm"), 3),
])
def test_deblock_intra(oracle, kinds, seed):
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=seed, kinds=kinds)
    assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                        ctx=f"deblock kinds={kinds}")


def test_deblock_qp_sweep(oracle):
    """alpha/beta/tC0 table coverage across the QP range."""
    for qp in (8, 16, 24, 32, 40, 48, 51):
        data = gen_random_intra_stream(4, 3, n_frames=1, seed=qp, qp=qp,
                                       kinds=("i4", "i16"))
        assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                            ctx=f"deblock qp={qp}")


def test_deblock_multi_slice(oracle):
    data = gen_random_intra_stream(6, 4, n_frames=2, seed=5,
                                   slices_per_frame=3)
    assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                        ctx="deblock multi-slice")


def test_deblock_larger(oracle):
    data = gen_random_intra_stream(8, 6, n_frames=2, seed=13, density=0.5,
                                   max_level=40)
    assert_frames_match(_decode_ours(data), _ref_frames(oracle, data),
                        ctx="deblock 8x6")

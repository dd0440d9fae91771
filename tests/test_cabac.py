"""CABAC entropy coding: I/P/B macroblock layers bit-exact vs the
reference (BASELINE.md config #3, CABAC part).  Streams come from our own
CABAC encoder (tools/cabac_enc.py), itself validated by the reference
accepting the streams."""

import pytest

from tools.avcgen import gen_random_cabac_stream, gen_random_cabac_ipb_stream
from tests.test_intra_pixels import _decode_ours, _ref_frames, \
    assert_frames_match


@pytest.mark.parametrize("kinds,seed", [
    (("i16",), 1),
    (("i4",), 2),
    (("i4", "i16", "pcm"), 3),
])
def test_cabac_intra(ref_oracle, kinds, seed):
    data = gen_random_cabac_stream(4, 3, n_frames=2, seed=seed, kinds=kinds)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"cabac-intra {kinds}")


def test_cabac_intra_qp_sweep(ref_oracle):
    for qp in (10, 30, 45):
        data = gen_random_cabac_stream(4, 3, n_frames=1, seed=qp, qp=qp)
        assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                            ctx=f"cabac qp={qp}")


def test_cabac_init_idc(ref_oracle):
    for idc in (0, 1, 2):
        data = gen_random_cabac_ipb_stream(4, 3, n_gops=1, seed=idc,
                                           with_b=False, cabac_init_idc=idc)
        assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                            ctx=f"cabac idc={idc}")


@pytest.mark.parametrize("seed,kw", [
    (1, dict(with_b=False)),
    (2, dict(with_b=False, mv_range=80)),
    (3, dict()),
    (4, dict(direct_spatial=False)),
    (5, dict(wbi=2)),
    (6, dict(mv_range=64, wbi=2, direct_spatial=False)),
])
def test_cabac_inter(ref_oracle, seed, kw):
    data = gen_random_cabac_ipb_stream(4, 3, n_gops=3, seed=seed, **kw)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"cabac-inter seed={seed} {kw}")


def test_cabac_larger(ref_oracle):
    data = gen_random_cabac_ipb_stream(6, 5, n_gops=2, seed=9, density=0.4)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx="cabac 6x5")

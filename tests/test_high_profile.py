"""High profile (FRExt): 8x8 transforms, Intra_8x8, scaling matrices,
separate Cb/Cr QP — bit-exact vs the reference (BASELINE.md config #4).

Generated coefficient levels are capped at high QP: the spec guarantees
conformant streams keep the 8x8 inverse-transform intermediates within 16
bits, and the reference's SIMD saturates beyond that (non-conformant
inputs are undefined territory)."""

import pytest

from tools.avcgen import gen_random_high_stream, gen_random_high_ipp_stream
from tests.test_intra_pixels import _decode_ours, _ref_frames, \
    assert_frames_match


@pytest.mark.parametrize("kinds,seed,kw", [
    (("i8",), 1, dict(deblock=False)),
    (("i8",), 2, dict()),
    (("i4", "i8", "i16"), 3, dict()),
    (("i4", "i8", "i16"), 4, dict(scaling=True, max_level=4)),
    (("i8", "i16"), 5, dict(second_chroma_qp_off=-4)),
    (("i4", "i8", "i16"), 6, dict(scaling=True, second_chroma_qp_off=5,
                                  max_level=4)),
])
def test_high_intra(ref_oracle, kinds, seed, kw):
    data = gen_random_high_stream(4, 3, n_frames=2, seed=seed, kinds=kinds,
                                  **kw)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"high-intra {kinds} {kw}")


def test_high_qp_sweep(ref_oracle):
    for qp, lvl in ((8, 8), (22, 8), (34, 4), (40, 2), (48, 1)):
        data = gen_random_high_stream(4, 3, n_frames=1, seed=qp, qp=qp,
                                      max_level=lvl)
        assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                            ctx=f"high qp={qp}")


@pytest.mark.parametrize("seed,kw", [
    (1, dict(deblock=False)),
    (2, dict()),
    (3, dict(nrefs=2, mv_range=64)),
])
def test_high_inter_t8(ref_oracle, seed, kw):
    data = gen_random_high_ipp_stream(4, 3, n_frames=4, seed=seed, **kw)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"high-ipp seed={seed} {kw}")


@pytest.mark.parametrize("seed,kinds", [
    (1, ("i8",)),
    (2, ("i4", "i8", "i16")),
    (3, ("i4", "i8", "i16", "pcm")),
])
def test_high_cabac_intra(ref_oracle, seed, kinds):
    from tools.avcgen import gen_random_high_cabac_stream
    data = gen_random_high_cabac_stream(4, 3, n_frames=2, seed=seed,
                                        kinds=kinds)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"high-cabac {kinds}")


def test_high_jax_backend(ref_oracle):
    data = gen_random_high_stream(4, 3, n_frames=2, seed=31,
                                  kinds=("i4", "i8", "i16"), scaling=True,
                                  max_level=4)
    assert_frames_match(_decode_ours(data, backend="jax"),
                        _ref_frames(ref_oracle, data), ctx="high-jax")


def test_high_jax_inter(ref_oracle):
    data = gen_random_high_ipp_stream(4, 3, n_frames=3, seed=32)
    assert_frames_match(_decode_ours(data, backend="jax"),
                        _ref_frames(ref_oracle, data), ctx="high-jax-ipp")

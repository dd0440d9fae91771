"""B slices: bi-prediction, spatial/temporal direct, implicit weights,
reordered output — bit-exact vs the reference (BASELINE.md config #3
CAVLC part)."""

import pytest

from tools.avcgen import gen_random_ipb_stream
from tests.util import native_decode_all, assert_traces_match
from tests.test_intra_pixels import _decode_ours, _ref_frames, \
    assert_frames_match


@pytest.mark.parametrize("seed,kw", [
    (1, dict()),                                  # mixed, spatial direct
    (2, dict(direct_spatial=False)),              # temporal direct
    (3, dict(wbi=2)),                             # implicit weighting
    (4, dict(mv_range=64, direct_spatial=False, wbi=2)),
])
def test_b_trace(ref_oracle, seed, kw):
    data = gen_random_ipb_stream(4, 3, n_gops=2, seed=seed, **kw)
    ref_trace = ref_oracle.trace(data)
    _, rets, my_trace = native_decode_all(data, log=True)
    assert_traces_match(ref_trace, my_trace, ctx=f"b-trace seed={seed}")


@pytest.mark.parametrize("seed,kw", [
    (7, dict(deblock=False)),
    (8, dict()),
    (9, dict(direct_spatial=False, deblock=False)),
    (10, dict(direct_spatial=False)),
    (11, dict(wbi=2)),
    (12, dict(wbi=2, direct_spatial=False, mv_range=64)),
])
def test_b_pixels(ref_oracle, seed, kw):
    data = gen_random_ipb_stream(4, 3, n_gops=3, seed=seed, **kw)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"b-pixels seed={seed} {kw}")


def test_b_pixels_jax(ref_oracle):
    data = gen_random_ipb_stream(4, 3, n_gops=2, seed=21, wbi=2)
    assert_frames_match(_decode_ours(data, backend="jax"),
                        _ref_frames(ref_oracle, data), ctx="b-jax")


@pytest.mark.parametrize("seed,density", [(11, 0.3), (5, 0.4)])
def test_b8x8_direct_neighbor_order_cabac(ref_oracle, seed, density):
    """Regression: a B_8x8 direct sub-block must NOT be `written` when an
    earlier quadrant's 4x4 mvp asks for its C neighbour (decode-order
    availability, §6.4.11.7) — the direct quad derives at its turn, not
    up front.  Caught as a 26-pixel mismatch at 10x6 seed=11."""
    from tools.avcgen import gen_random_cabac_ipb_stream
    data = gen_random_cabac_ipb_stream(10, 6, n_gops=3, seed=seed,
                                       density=density)
    assert_frames_match(_decode_ours(data), _ref_frames(ref_oracle, data),
                        ctx=f"b8x8-direct-order seed={seed}")

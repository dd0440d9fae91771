"""Device (JAX/XLA) pixel path vs the numpy oracle and the reference:
must be bit-exact on all three-way comparisons."""

import numpy as np
import pytest

from tools.avcgen import gen_random_intra_stream
from tests.test_intra_pixels import _decode_ours, _ref_frames, \
    assert_frames_match


@pytest.mark.parametrize("deblock", [False, True])
@pytest.mark.parametrize("kinds,seed", [
    (("i16",), 1),
    (("i4",), 2),
    (("i4", "i16", "pcm"), 3),
])
def test_jax_vs_numpy(kinds, seed, deblock):
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=seed, kinds=kinds,
                                   deblock=deblock)
    ours_np = _decode_ours(data, backend="numpy")
    ours_jax = _decode_ours(data, backend="jax")
    assert len(ours_np) == len(ours_jax)
    for i, (a, b) in enumerate(zip(ours_np, ours_jax)):
        for name in ("y", "cb", "cr"):
            x, y = getattr(a, name), getattr(b, name)
            if not np.array_equal(x, y):
                bad = np.argwhere(x != y)
                raise AssertionError(
                    f"kinds={kinds} deblock={deblock} frame {i} {name}: "
                    f"{len(bad)} diffs, first {bad[0]}: "
                    f"np={x[tuple(bad[0])]} jax={y[tuple(bad[0])]}")


def test_jax_vs_reference(ref_oracle):
    data = gen_random_intra_stream(6, 4, n_frames=2, seed=17, density=0.5)
    assert_frames_match(_decode_ours(data, backend="jax"),
                        _ref_frames(ref_oracle, data), ctx="jax-vs-ref")


def test_jax_multi_slice(ref_oracle):
    data = gen_random_intra_stream(5, 4, n_frames=2, seed=23,
                                   slices_per_frame=2)
    assert_frames_match(_decode_ours(data, backend="jax"),
                        _ref_frames(ref_oracle, data), ctx="jax-multislice")


def test_jax_p_slices(ref_oracle):
    from tools.avcgen import gen_random_ipp_stream
    data = gen_random_ipp_stream(4, 3, n_frames=4, seed=7, nrefs=2)
    assert_frames_match(_decode_ours(data, backend="jax"),
                        _ref_frames(ref_oracle, data), ctx="jax-p")


def test_jax_p_motion_heavy(ref_oracle):
    from tools.avcgen import gen_random_ipp_stream
    data = gen_random_ipp_stream(5, 4, n_frames=4, seed=11, mv_range=96,
                                 skip_prob=0.1, intra_prob=0.1, nrefs=3)
    assert_frames_match(_decode_ours(data, backend="jax"),
                        _ref_frames(ref_oracle, data), ctx="jax-p-motion")

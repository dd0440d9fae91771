"""MVC Stereo High (Annex H): subset SPS, NAL 14/20, inter-view
prediction, paired-view output — bit-exact on both views vs the reference
(BASELINE.md config #5)."""

import numpy as np
import pytest

from tools.avcgen import gen_random_mvc_stream
from edge264_tpu.api import decode_annexb


def _ref_views(ref_oracle, data):
    metas, yuv, yuv2 = ref_oracle.decode_yuv(data)
    out = []
    pos = pos2 = 0
    for fid, wy, hy, wc, hc in metas:
        def take(buf, p):
            y = np.frombuffer(buf, np.uint8, wy * hy, p).reshape(hy, wy)
            cb = np.frombuffer(buf, np.uint8, wc * hc,
                               p + wy * hy).reshape(hc, wc)
            cr = np.frombuffer(buf, np.uint8, wc * hc,
                               p + wy * hy + wc * hc).reshape(hc, wc)
            return (y, cb, cr), p + wy * hy + 2 * wc * hc
        base, pos = take(yuv, pos)
        view1, pos2 = take(yuv2, pos2)
        out.append((base, view1))
    return out


def assert_mvc_match(ref_oracle, data, ctx=""):
    refs = _ref_views(ref_oracle, data)
    frames = list(decode_annexb(data))
    assert len(frames) == len(refs), f"{ctx}: {len(frames)} vs {len(refs)}"
    for i, (f, (base, view1)) in enumerate(zip(frames, refs)):
        for name, a, b in (("Y", f.y, base[0]), ("Cb", f.cb, base[1]),
                           ("Cr", f.cr, base[2]),
                           ("Y1", f.y_mvc, view1[0]),
                           ("Cb1", f.cb_mvc, view1[1]),
                           ("Cr1", f.cr_mvc, view1[2])):
            assert a is not None, f"{ctx} AU {i}: missing {name}"
            assert np.array_equal(a, b), \
                f"{ctx} AU {i} {name}: {int((a != b).sum())} diffs"


@pytest.mark.parametrize("seed,kw", [
    (1, dict()),
    (2, dict(deblock=False)),
    (3, dict(mv_range=48, density=0.4)),
])
def test_mvc_stereo(ref_oracle, seed, kw):
    data = gen_random_mvc_stream(4, 3, n_aus=3, seed=seed, **kw)
    assert_mvc_match(ref_oracle, data, ctx=f"mvc seed={seed}")


def test_mvc_longer(ref_oracle):
    data = gen_random_mvc_stream(5, 4, n_aus=5, seed=7)
    assert_mvc_match(ref_oracle, data, ctx="mvc 5x4")


def test_mvc_jax_backend(ref_oracle):
    """Both views through the jax pixel path (inter-view references must
    live in the device reference ring)."""
    data = gen_random_mvc_stream(4, 3, n_aus=3, seed=9)
    refs = _ref_views(ref_oracle, data)
    frames = list(decode_annexb(data, backend="jax"))
    assert len(frames) == len(refs)
    for i, (f, (base, view1)) in enumerate(zip(frames, refs)):
        assert np.array_equal(np.asarray(f.y), base[0]), f"AU {i} Y"
        assert np.array_equal(np.asarray(f.y_mvc), view1[0]), f"AU {i} Y1"
        assert np.array_equal(np.asarray(f.cb_mvc), view1[1]), f"AU {i} Cb1"

"""Decode every .264 stream bundled with the reference and match its
output exactly (frame count + bit-exact YUV).  These streams exercise the
error paths: missing parameter sets, unsupported NALs, no-refs P/B
slices, POC reordering, frame_num gaps, zero cropping."""

import glob

import numpy as np
import pytest

from edge264_tpu.api import decode_annexb

STREAMS = sorted(glob.glob("/root/reference/tests/*.264"))


@pytest.mark.parametrize("path", STREAMS,
                         ids=[p.split("/")[-1] for p in STREAMS])
def test_reference_stream(ref_oracle, path):
    data = open(path, "rb").read()
    metas, yuv, _ = ref_oracle.decode_yuv(data)
    ours = list(decode_annexb(data))
    assert len(ours) == len(metas), \
        f"{path}: {len(ours)} frames vs reference {len(metas)}"
    pos = 0
    for i, (f, (fid, wy, hy, wc, hc)) in enumerate(zip(ours, metas)):
        ry = np.frombuffer(yuv, np.uint8, wy * hy, pos).reshape(hy, wy)
        rcb = np.frombuffer(yuv, np.uint8, wc * hc,
                            pos + wy * hy).reshape(hc, wc)
        rcr = np.frombuffer(yuv, np.uint8, wc * hc,
                            pos + wy * hy + wc * hc).reshape(hc, wc)
        pos += wy * hy + 2 * wc * hc
        assert np.array_equal(f.y, ry), f"{path} frame {i} Y"
        assert np.array_equal(f.cb, rcb), f"{path} frame {i} Cb"
        assert np.array_equal(f.cr, rcr), f"{path} frame {i} Cr"

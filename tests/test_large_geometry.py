"""Bit-exact parity at REAL frame sizes (tiling/padding/bucket coverage,
VERDICT r1 weak #5): CIF-class CABAC IPB end-to-end vs the reference
binary, and a 1080p-geometry frame through the XLA pixel path."""

import numpy as np
import pytest

from edge264_tpu.api import decode_annexb
from tools.avcgen import gen_random_cabac_ipb_stream, gen_random_intra_stream


@pytest.mark.slow
def test_cif_cabac_ipb_parity(ref_oracle):
    """22x18 mbs (352x288, CIF) CABAC IPB, host entropy + jax pixel path
    vs the reference binary."""
    data = gen_random_cabac_ipb_stream(22, 18, n_gops=2, seed=17)
    frames, yuv, _ = ref_oracle.decode_yuv(data)
    mine = b""
    n = 0
    for f in decode_annexb(data, backend="jax", n_tasks=4):
        mine += np.asarray(f.y).tobytes() + np.asarray(f.cb).tobytes() \
            + np.asarray(f.cr).tobytes()
        n += 1
    assert n == len(frames)
    assert mine == yuv


@pytest.mark.slow
def test_1080p_geometry_intra_parity(ref_oracle):
    """One 120x68-mb (1920x1088) intra frame through the jax path — the
    bench geometry, catching padding/tiling bugs that only appear at
    full size."""
    data = gen_random_intra_stream(120, 68, n_frames=1, seed=23,
                                   density=0.1)
    frames, yuv, _ = ref_oracle.decode_yuv(data)
    out = list(decode_annexb(data, backend="jax"))
    assert len(out) == len(frames) == 1
    f = out[0]
    mine = np.asarray(f.y).tobytes() + np.asarray(f.cb).tobytes() \
        + np.asarray(f.cr).tobytes()
    assert mine == yuv

"""CLI test app (edge264_tpu/cli.py — the edge264_test.c analog):
golden-YUV compare mode and Y4M export with the VUI-derived frame rate
(edge264_test.c:276-423 decode_file; SDL display substituted by -o)."""

import numpy as np
import pytest

from edge264_tpu.api import decode_annexb, find_start_code
from edge264_tpu.cli import decode_file
from tools.avcgen import gen_random_intra_stream, make_sps


def _write_stream_and_yuv(tmp_path, data):
    frames = list(decode_annexb(data, backend="numpy"))
    yuv = b"".join(np.asarray(f.y).tobytes() + np.asarray(f.cb).tobytes() +
                   np.asarray(f.cr).tobytes() for f in frames)
    p264 = tmp_path / "s.264"
    pyuv = tmp_path / "s.yuv"
    p264.write_bytes(data)
    pyuv.write_bytes(yuv)
    return p264, pyuv, frames


def test_cli_golden_compare_pass(tmp_path):
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=1)
    p264, pyuv, _ = _write_stream_and_yuv(tmp_path, data)
    assert decode_file(str(p264), yuv=str(pyuv), backend="numpy",
                       quiet=True)


def test_cli_golden_compare_fail(tmp_path):
    data = gen_random_intra_stream(4, 3, n_frames=1, seed=2)
    p264, pyuv, _ = _write_stream_and_yuv(tmp_path, data)
    bad = bytearray(pyuv.read_bytes())
    bad[100] ^= 0xFF
    pyuv.write_bytes(bytes(bad))
    assert not decode_file(str(p264), yuv=str(pyuv), backend="numpy",
                           quiet=True)


def test_cli_y4m_rate_from_vui(tmp_path):
    """Y4M header carries the stream's VUI rate (time_scale over
    2*num_units_in_tick), not a hard-coded 30:1."""
    data = gen_random_intra_stream(4, 3, n_frames=1, seed=3)
    sps = make_sps(4, 3, timing=(1001, 48000))       # 23.98 fps
    p1 = find_start_code(data, find_start_code(data, 0) + 3)
    data = sps + data[p1:]
    p264 = tmp_path / "t.264"
    p264.write_bytes(data)
    out = tmp_path / "t.y4m"
    assert decode_file(str(p264), backend="numpy", quiet=True,
                       out_y4m=str(out))
    header = out.read_bytes().split(b"\n", 1)[0]
    assert b"F48000:2002" in header, header


def test_cli_y4m_rate_fallback(tmp_path):
    data = gen_random_intra_stream(4, 3, n_frames=1, seed=4)
    p264 = tmp_path / "u.264"
    p264.write_bytes(data)
    out = tmp_path / "u.y4m"
    assert decode_file(str(p264), backend="numpy", quiet=True,
                       out_y4m=str(out))
    header = out.read_bytes().split(b"\n", 1)[0]
    assert b"F30:1" in header, header

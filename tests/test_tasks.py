"""Frame-task worker pool: threaded entropy decode must be bit-exact with
synchronous mode (the reference's determinism contract across n_threads,
SURVEY.md §4.6), including B-slice colocated dependencies, multi-slice
frames, and erroneous streams that need concealment."""

import numpy as np
import pytest

from edge264_tpu.api import decode_annexb
from tools.avcgen import (gen_random_intra_stream, gen_random_ipp_stream,
                          gen_random_ipb_stream, gen_random_cabac_ipb_stream)


def run(data, **kw):
    return [(f.frame_id, f.y.copy(), f.cb.copy(), f.cr.copy(),
             None if f.mb_errors is None else f.mb_errors.copy())
            for f in decode_annexb(data, backend="numpy", **kw)]


def assert_same(a, b, name):
    assert len(a) == len(b) and len(a) > 0, (name, len(a), len(b))
    for fa, fb in zip(a, b):
        assert fa[0] == fb[0], (name, fa[0], fb[0])
        for k, (xa, xb) in enumerate(zip(fa[1:], fb[1:])):
            if xa is None or xb is None:
                assert xa is None and xb is None, (name, fa[0], k)
            else:
                assert np.array_equal(xa, xb), (name, fa[0], k)


STREAMS = {
    "intra": lambda: gen_random_intra_stream(6, 4, n_frames=3, seed=3),
    "multislice": lambda: gen_random_intra_stream(
        5, 4, n_frames=3, seed=9, slices_per_frame=3),
    "ipp": lambda: gen_random_ipp_stream(6, 4, n_frames=8, seed=7,
                                         density=0.2, skip_prob=0.3,
                                         intra_prob=0.1, mv_range=16,
                                         nrefs=2),
    "ipb": lambda: gen_random_ipb_stream(6, 4, n_gops=4, seed=11),
    "cabac_ipb": lambda: gen_random_cabac_ipb_stream(6, 4, n_gops=4,
                                                     seed=13),
    # slices of ONE frame parse concurrently (intra-frame slice
    # parallelism, reference edge264_headers.c:539-568): P and B frames
    # split into multiple slices, CAVLC and CABAC
    "multislice_ipp": lambda: gen_random_ipp_stream(
        8, 6, n_frames=6, seed=17, nrefs=2, density=0.25,
        slices_per_frame=4),
    "multislice_cabac_ipb": lambda: gen_random_cabac_ipb_stream(
        8, 6, n_gops=3, seed=19, slices_per_frame=3),
    "multislice_closed": lambda: gen_random_cabac_ipb_stream(
        8, 6, n_gops=4, seed=3, closed=True, slices_per_frame=3),
}


@pytest.mark.parametrize("name", sorted(STREAMS))
def test_tasks_bitexact(name):
    data = STREAMS[name]()
    assert_same(run(data), run(data, n_tasks=4), name)


def test_tasks_concealment():
    """A truncated slice leaves holes; the deferred (seal-snapshot)
    concealment path must match the synchronous one."""
    data = gen_random_ipp_stream(6, 4, n_frames=6, seed=5, density=0.2,
                                 skip_prob=0.3, intra_prob=0.1,
                                 mv_range=16, nrefs=1)
    # truncate the middle of the stream's 3rd slice NAL payload
    from edge264_tpu.api import find_start_code
    starts = []
    pos = find_start_code(data, 0)
    while pos < len(data):
        starts.append(pos)
        pos = find_start_code(data, pos + 3)
    starts.append(len(data))
    slices = [i for i in range(len(starts) - 1)
              if data[starts[i] + 3] & 31 in (1, 5)]
    s = slices[2]
    cut = starts[s] + (starts[s + 1] - starts[s]) * 2 // 3
    broken = data[:cut] + data[starts[s + 1]:]
    assert_same(run(broken), run(broken, n_tasks=4), "concealed")


def test_tasks_many_threads_stress():
    """More workers than frames in flight; repeated runs for schedule
    variety."""
    data = gen_random_ipb_stream(5, 3, n_gops=3, seed=2)
    ref = run(data)
    for _ in range(3):
        assert_same(ref, run(data, n_tasks=8), "stress")

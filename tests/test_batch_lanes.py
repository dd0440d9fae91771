"""K-lane lockstep GOP decoding (parallel/batch.py): bit-exact against the
serial decoder, on one device and sharded over the 8-device CPU mesh
(conftest sets XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest
import jax

from edge264_tpu.api import decode_annexb
from edge264_tpu.parallel.batch import decode_gops_batched
from edge264_tpu.parallel.mesh import make_decode_mesh
from tools.avcgen import gen_random_ipp_stream, gen_random_ipb_stream


def _multi_gop_ipb(n_gops=4, seed=5):
    return gen_random_ipb_stream(6, 4, n_gops=n_gops, seed=seed)


def _serial(data):
    return [(f.frame_id, np.asarray(f.y), np.asarray(f.cb),
             np.asarray(f.cr)) for f in decode_annexb(data, backend="numpy")]


def _check(serial, got, label):
    got = [(f.frame_id, np.asarray(f.y), np.asarray(f.cb), np.asarray(f.cr))
           for f in got]
    assert len(got) == len(serial) > 0, (label, len(got), len(serial))
    # frame_id is a per-decoder counter; lanes renumber per GOP (like
    # decode_annexb_parallel), so only pixel content and order compare
    for (ia, ya, ca, ra), (ib, yb, cb_, rb) in zip(serial, got):
        assert np.array_equal(ya, yb), (label, ia, "y")
        assert np.array_equal(ca, cb_), (label, ia, "cb")
        assert np.array_equal(ra, rb), (label, ia, "cr")


def test_lockstep_lanes_single_device():
    data = _multi_gop_ipb(n_gops=4)
    _check(_serial(data), decode_gops_batched(data, lanes=4), "K=4")


def test_lockstep_uneven_group():
    """5 GOPs with 4 lanes: a second partially-filled group."""
    data = _multi_gop_ipb(n_gops=5, seed=9)
    _check(_serial(data), decode_gops_batched(data, lanes=4), "5/4")


def test_lockstep_lanes_sharded_mesh():
    """Lane axis sharded over all 8 virtual devices via shard_map (8
    truly independent GOPs, one per device)."""
    assert len(jax.devices()) == 8
    data = b"".join(gen_random_ipb_stream(6, 4, n_gops=1, seed=s)
                    for s in range(8))
    mesh = make_decode_mesh()
    _check(_serial(data), decode_gops_batched(data, lanes=8, mesh=mesh),
           "mesh8")


def test_lockstep_sharded_uneven_group():
    """5 closed GOPs over 8 mesh lanes: the mesh path pads the group with
    3 dead lanes, which must stay out of the output (round-2 regression:
    dead lanes crashed the output loop with fmt=None)."""
    assert len(jax.devices()) == 8
    data = gen_random_ipb_stream(5, 3, n_gops=5, seed=13, closed=True,
                                 gop_pb=1)
    mesh = make_decode_mesh()
    _check(_serial(data), decode_gops_batched(data, lanes=8, mesh=mesh),
           "mesh5/8")


def test_lockstep_ring_growth():
    """A lane whose live reference count exceeds the starting ring (S=8)
    must grow the ring (doubling) instead of silently mis-referencing:
    12-frame IPP GOP with up to 10 refs alive."""
    data = gen_random_ipp_stream(5, 4, n_frames=12, seed=3, nrefs=10,
                                 density=0.2, mv_range=8)
    _check(_serial(data), decode_gops_batched(data, lanes=1), "ring-grow")


def test_closed_gop_generation():
    """closed=True emits one IDR per GOP (distinct idr_pic_id, POC
    reset), so split_gops yields exactly n_gops independent chunks."""
    from edge264_tpu.parallel.gop import split_gops
    from tools.avcgen import gen_random_cabac_ipb_stream
    data = gen_random_ipb_stream(4, 3, n_gops=6, seed=1, closed=True,
                                 gop_pb=1)
    assert len(split_gops(data)) == 6
    data = gen_random_cabac_ipb_stream(4, 3, n_gops=3, seed=1, closed=True)
    assert len(split_gops(data)) == 3


def _check_mvc(serial, got, label):
    got = list(got)
    assert len(got) == len(serial) > 0, (label, len(got), len(serial))
    for a, b in zip(serial, got):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), label
        assert np.array_equal(np.asarray(a.cb), np.asarray(b.cb)), label
        assert np.array_equal(np.asarray(a.cr), np.asarray(b.cr)), label
        assert (a.y_mvc is None) == (b.y_mvc is None), label
        if a.y_mvc is not None:
            assert np.array_equal(np.asarray(a.y_mvc),
                                  np.asarray(b.y_mvc)), label
            assert np.array_equal(np.asarray(a.cb_mvc),
                                  np.asarray(b.cb_mvc)), label
            assert np.array_equal(np.asarray(a.cr_mvc),
                                  np.asarray(b.cr_mvc)), label


def test_lockstep_mvc():
    """MVC Stereo High through the lane driver: base + non-base views are
    consecutive lockstep steps (inter-view reference via the ring), and
    output pairs the views per access unit (edge264.c:373-399)."""
    from tools.avcgen import gen_random_mvc_stream
    data = b"".join(gen_random_mvc_stream(4, 3, n_aus=3, seed=s)
                    for s in (1, 2))
    serial = list(decode_annexb(data, backend="numpy"))
    _check_mvc(serial, decode_gops_batched(data, lanes=2), "mvc-K2")


def test_lockstep_mvc_sharded_mesh():
    from tools.avcgen import gen_random_mvc_stream
    assert len(jax.devices()) == 8
    data = b"".join(gen_random_mvc_stream(4, 3, n_aus=2, seed=s)
                    for s in range(3))
    serial = list(decode_annexb(data, backend="numpy"))
    mesh = make_decode_mesh()
    _check_mvc(serial, decode_gops_batched(data, lanes=8, mesh=mesh),
               "mvc-mesh3/8")


def test_lockstep_ipp_streams():
    parts = [gen_random_ipp_stream(5, 4, n_frames=4, seed=s, density=0.25,
                                   skip_prob=0.3, intra_prob=0.1,
                                   mv_range=8, nrefs=2)
             for s in (11, 22, 33, 44)]
    data = b"".join(parts)
    _check(_serial(data), decode_gops_batched(data, lanes=4), "ipp")


def test_multihost_gop_partition():
    """Contiguous GOP shares cover the stream exactly, once, in order,
    and stay balanced within one GOP."""
    from edge264_tpu.parallel.distributed import my_gop_range
    for n_gops in (1, 2, 5, 8, 17):
        for world in (1, 2, 3, 4, 8):
            spans = [my_gop_range(n_gops, r, world) for r in range(world)]
            flat = [i for lo, hi in spans for i in range(lo, hi)]
            assert flat == list(range(n_gops)), (n_gops, world, spans)
            sizes = [hi - lo for lo, hi in spans]
            assert max(sizes) - min(sizes) <= 1


def test_multihost_single_process_decode():
    """Uninitialized distributed runtime = rank 0 of 1: the multihost
    entry must decode the whole stream identically to serial."""
    from edge264_tpu.parallel.distributed import decode_stream_multihost
    data = b"".join(gen_random_ipb_stream(5, 3, n_gops=1, seed=s)
                    for s in range(3))
    _check(_serial(data),
           list(decode_stream_multihost(data, lanes=4, use_mesh=False)),
           "multihost1")


def test_lockstep_coef16_fallback(monkeypatch):
    """A stream with residual levels beyond int8 drops the group to
    16-bit coefficient planes (the int8 fast path must never corrupt
    out-of-range levels)."""
    monkeypatch.setenv("E264T_COEF8", "1")   # TPU default, forced on CPU
    import random
    from tools.avcgen import (MbSpec, make_sps, make_pps, make_idr_slice,
                              random_frame_specs)
    rng = random.Random(41)
    w, h = 4, 3
    out = b""
    for g in range(2):
        specs = random_frame_specs(rng, w, h, "i")
        i4 = next(s for s in specs if s.kind == "i4")
        i4.luma_coeffs[0] = [900, -900] + [0] * 14    # far beyond int8
        i4.cbp |= 1
        out += make_sps(w, h) + make_pps()
        out += make_idr_slice(w, h, specs, idr_pic_id=g)
    serial = [np.asarray(f.y).tobytes()
              for f in decode_annexb(out, backend="numpy")]
    got = list(decode_gops_batched(out, lanes=2))
    assert len(got) == len(serial) == 2
    for a, g_ in zip(serial, got):
        assert a == np.asarray(g_.y).tobytes()


def test_lockstep_coef8_bit_exact(monkeypatch):
    """int8 coefficient shipping is bit-exact on in-range content."""
    monkeypatch.setenv("E264T_COEF8", "1")
    data = _multi_gop_ipb(n_gops=3, seed=7)
    _check(_serial(data), decode_gops_batched(data, lanes=3), "coef8")


def test_lockstep_digest_sink():
    """sink="digest": frames stay in device HBM; the yielded 64-bit
    device checksums must equal host_frame_digest over the serially
    decoded (cropped) frames — the bench's steady-state bit-exactness
    check without full-frame D2H."""
    from edge264_tpu.ops.batched import host_frame_digest
    data = _multi_gop_ipb(n_gops=3, seed=21)
    serial = list(decode_annexb(data, backend="numpy"))
    got = list(decode_gops_batched(data, lanes=3, sink="digest"))
    assert len(got) == len(serial) > 0
    for f, g in zip(serial, got):
        want = host_frame_digest(np.asarray(f.y), np.asarray(f.cb),
                                 np.asarray(f.cr))
        assert g.digest == want, (f.frame_id, g.digest, want)


def test_lockstep_digest_sink_mvc():
    from tools.avcgen import gen_random_mvc_stream
    from edge264_tpu.ops.batched import host_frame_digest
    data = gen_random_mvc_stream(4, 3, n_aus=2, seed=7)
    serial = list(decode_annexb(data, backend="numpy"))
    got = list(decode_gops_batched(data, lanes=1, sink="digest"))
    assert len(got) == len(serial) > 0
    for f, g in zip(serial, got):
        want = host_frame_digest(np.asarray(f.y), np.asarray(f.cb),
                                 np.asarray(f.cr))
        assert g.digest == want
        if f.y_mvc is not None:
            want = host_frame_digest(np.asarray(f.y_mvc),
                                     np.asarray(f.cb_mvc),
                                     np.asarray(f.cr_mvc))
            assert g.digest_mvc == want

"""Expected-errno sequences per scenario stream — the reference's
`test(..., (uint8_t[]){0,0,...,ENOBUFS,...})` contract
(edge264_check.c:438-445): every NAL's return code is asserted, not just
the final output."""

import errno

import pytest

from edge264_tpu.api import find_start_code
from edge264_tpu.native import NativeDecoder
from tools.avcgen import (gen_random_intra_stream, gen_random_ipp_stream,
                          make_sps, make_pps)


def decode_rets(data, drain=True):
    nd = NativeDecoder()
    rets = []
    pos = find_start_code(data, 0)
    while pos < len(data):
        end = find_start_code(data, pos + 3)
        ret, _ = nd.decode_nal(data[pos + 3:end])
        while nd.get_frame() is not None:
            pass
        rets.append(ret)
        pos = end
    if drain:
        while True:
            ret, _ = nd.decode_nal(b"")
            rets.append(ret)
            while nd.get_frame() is not None:
                pass
            if ret != errno.ENOBUFS:
                break
    nd.close()
    return rets


def test_supported_stream_all_zero():
    data = gen_random_intra_stream(4, 3, n_frames=2, seed=1)
    rets = decode_rets(data)
    # SPS, PPS, 2 IDR slices all succeed; drain ENOBUFS while frames
    # queue out, then ENODATA
    assert rets[:4] == [0, 0, 0, 0]
    assert rets[-1] == errno.ENODATA
    assert all(r in (0, errno.ENOBUFS, errno.ENODATA) for r in rets)


def test_unsupported_nal_types():
    """Data-partition NALs (2-4) and unknown types must return ENOTSUP
    without touching decoder state (reference: unsupp-nals stream)."""
    base = gen_random_intra_stream(4, 3, n_frames=1, seed=2)
    unsupp = b"".join(b"\x00\x00\x01" + bytes([t]) + b"\x55\xAA\x80"
                      for t in (2, 3, 4, 13, 16))
    rets = decode_rets(unsupp + base)
    assert rets[:5] == [errno.ENOTSUP] * 5
    assert rets[5:8] == [0, 0, 0]       # SPS/PPS/IDR still decode


def test_missing_parameter_sets():
    """A slice before any SPS/PPS is EBADMSG (reference: missing-ps)."""
    data = gen_random_intra_stream(4, 3, n_frames=1, seed=3)
    # strip SPS+PPS: find the IDR NAL and send only it
    pos = find_start_code(data, 0)
    nals = []
    while pos < len(data):
        end = find_start_code(data, pos + 3)
        nals.append(data[pos:end])
        pos = end
    idr = next(n for n in nals if n[3] & 31 == 5)
    rets = decode_rets(idr, drain=False)
    assert rets == [errno.EBADMSG]


def test_slice_with_bad_pps_id():
    """PPS id out of range -> ENOTSUP (clamped parse, deferred errors)."""
    sps = make_sps(4, 3)
    # a slice referencing pps_id 200 (> 3): first_mb=0 ue, slice_type=7
    # (I) ue, pps 200 — craft via the generator's writer
    from tools.avcgen import BitWriter
    w = BitWriter()
    w.ue(0)        # first_mb_in_slice
    w.ue(7)        # slice_type I (IDR-style)
    w.ue(200)      # pic_parameter_set_id (invalid)
    w.rbsp_trailing()
    payload = bytes([0x65]) + w.bytes_unescaped()
    data = sps + make_pps() + b"\x00\x00\x01" + payload
    rets = decode_rets(data, drain=False)
    assert rets[-1] in (errno.ENOTSUP, errno.EBADMSG)


def test_truncated_slice_reports_in_events_not_ret():
    """Deferred error checking: a truncated slice still returns 0 from
    decode_NAL; the error surfaces in the EV_SLICE_DONE event and the
    mb_errors plane (reference README.md:273 contract)."""
    data = gen_random_ipp_stream(5, 4, n_frames=2, seed=5, density=0.2,
                                 skip_prob=0.3, intra_prob=0.1,
                                 mv_range=8, nrefs=1)
    pos = find_start_code(data, 0)
    nals = []
    while pos < len(data):
        end = find_start_code(data, pos + 3)
        nals.append(data[pos:end])
        pos = end
    out = []
    slice_errs = []
    nd = NativeDecoder()
    for i, nal in enumerate(nals):
        t = nal[3] & 31
        payload = nal[3:]
        if t == 1:      # truncate the P slice's payload
            payload = payload[:max(4, len(payload) * 2 // 3)]
        ret, events = nd.decode_nal(payload)
        out.append(ret)
        slice_errs += [e[5] for e in events if e[0] == 3]   # EV_SLICE_DONE
    nd.decode_nal(b"")
    nd.close()
    assert all(r in (0, errno.ENOBUFS) for r in out)
    assert any(e != 0 for e in slice_errs)


def test_borrowed_frames_create_enobufs_backpressure():
    """get_frame(borrow=True) keeps DPB slots pinned: holding every
    output eventually starves slot allocation into a sustained ENOBUFS
    stall, and return_frame releases it (the reference's borrow
    bookkeeping, edge264.c:365-411)."""
    from edge264_tpu.api import Decoder

    data = gen_random_intra_stream(2, 2, n_frames=40, seed=6)
    with Decoder(backend="numpy") as dec:
        borrowed = []
        pos = find_start_code(data, 0) + 3
        stall = 0
        while pos < len(data) and stall < 64:
            end = find_start_code(data, pos)
            ret = dec.decode_nal(data[pos:end])
            while (f := dec.get_frame(borrow=True)) is not None:
                borrowed.append(f)
            if ret == errno.ENOBUFS:
                stall += 1                  # same NAL retried
            else:
                stall = 0
                pos = end + 3
        # without returning frames the decoder must wedge well before all
        # 40 frames decode: borrowed slots + the reorder backlog exhaust
        # the 32 DPB slots (here 16 borrowed + 14 pending + 2 refs)
        assert stall >= 64, "borrowed frames never caused backpressure"
        assert 8 <= len(borrowed) < 40
        n_before = len(borrowed)
        for f in borrowed:
            dec.return_frame(f)
        while pos < len(data):              # now the stream finishes
            end = find_start_code(data, pos)
            ret = dec.decode_nal(data[pos:end])
            while (f := dec.get_frame(borrow=True)) is not None:
                borrowed.append(f)
                dec.return_frame(f)
            assert ret != errno.ENOBUFS or len(borrowed) > n_before
            pos = end + 3
        while dec.decode_nal(None) == errno.ENOBUFS:
            while (f := dec.get_frame()) is not None:
                borrowed.append(f)
        assert len(borrowed) == 40

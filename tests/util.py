"""Shared test helpers: Annex-B iteration, decode loops, trace filtering."""

from __future__ import annotations

import re


def iter_nals(buf: bytes):
    pos = buf.find(b"\x00\x00\x01")
    while pos >= 0:
        nxt = buf.find(b"\x00\x00\x01", pos + 3)
        yield buf[pos + 3: nxt if nxt >= 0 else len(buf)]
        pos = nxt


def native_decode_all(data: bytes, log=False):
    """Drive a NativeDecoder through a whole stream with the canonical
    ENOBUFS-retry loop (edge264_test.c:361-375).  Returns (frame_ids,
    per-NAL rets, trace)."""
    from edge264_tpu.native import NativeDecoder

    d = NativeDecoder(log=log, log_mbs=log)
    frames, rets, parts = [], [], []
    pos = data.find(b"\x00\x00\x01") + 3
    stall = 0
    while True:
        end = data.find(b"\x00\x00\x01", pos)
        if end < 0:
            end = len(data)
        ret, _ = d.decode_nal(bytes(data[pos:end]) if pos < len(data) else b"")
        rets.append(ret)
        if log:
            parts.append(d.get_log())
        stall += 1
        while (fr := d.get_frame()) is not None:
            frames.append(fr["frame_id"])
            stall = 0
        if ret != 105:              # ENOBUFS: retry the same NAL
            pos = end + 3
        if pos >= len(data) and ret == 61:   # ENODATA: drained
            break
        if ret == 105 and stall > 64:
            break                   # stuck (incomplete frames)
    d.close()
    return frames, rets, "".join(parts)


# keys both decoders emit in identical format; '#' comments stripped
TRACE_KEYS = ["mbAddr", "mb_type", "rem_intra4x4_pred_modes",
              "Intra4x4PredModes", "intra_chroma_pred_mode",
              "coded_block_pattern", "mb_qp_delta", "- {nC:",
              "pic_order_cnt:", "frame_num:", "slice_qp_delta",
              "transform_size_8x8_flag", "ref_idx", "mvd",
              "mb_skip_run", "sub_mb_types", "RefPicLists"]


def filter_trace(trace: str):
    out = []
    for line in trace.splitlines():
        ls = line.strip()
        if any(ls.startswith("- " + k) or ls.startswith(k)
               for k in TRACE_KEYS):
            out.append(re.sub(r"\s*#.*$", "", ls))
    return out


def assert_traces_match(ref_trace: str, my_trace: str, ctx=""):
    a, b = filter_trace(ref_trace), filter_trace(my_trace)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"{ctx}: trace diff at line {i}:\nref: {x}\nmy : {y}"
    assert len(a) == len(b), f"{ctx}: trace length {len(a)} vs {len(b)}"

"""Public decoder API.

Mirrors the 7 entry points of the reference (edge264.h:64-70):
  edge264_alloc          -> Decoder(...)
  edge264_decode_NAL     -> Decoder.decode_nal(buf) -> errno int
  edge264_get_frame      -> Decoder.get_frame(borrow=False) -> Frame | None
  edge264_return_frame   -> Decoder.return_frame(frame)
  edge264_flush          -> Decoder.flush()
  edge264_free           -> Decoder.close() / context manager
  edge264_find_start_code-> find_start_code(buf, offset, four_byte=False)

Return codes follow the reference contract (README.md:188-196): 0 success,
ENOTSUP unsupported feature, EBADMSG erroneous/corrupt NAL, ENOBUFS wait for
free frame slot, ENODATA drained at end of stream.
"""

from __future__ import annotations

import errno
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Frame:
    """A decoded frame view (reference: Edge264Frame, edge264.h:45-62)."""

    y: np.ndarray           # [height_Y, width_Y] uint8 (cropped)
    cb: np.ndarray          # [height_C, width_C]
    cr: np.ndarray
    frame_id: int = -1
    # second MVC view, if any
    y_mvc: np.ndarray | None = None
    cb_mvc: np.ndarray | None = None
    cr_mvc: np.ndarray | None = None
    frame_id_mvc: int = -1
    mb_errors: np.ndarray | None = None   # [mb_h, mb_w] uint8 percent, or None
    bit_depth_y: int = 8
    bit_depth_c: int = 8
    crop_offsets: tuple = (0, 0, 0, 0)    # top, right, bottom, left
    timing: tuple = (0, 0)   # VUI (num_units_in_tick, time_scale), 0 = absent
    return_arg: object = None


def find_start_code(buf: bytes, offset: int = 0, four_byte: bool = False) -> int:
    """Return the index of the next 00 00 01 (or 00 00 00 01) start-code
    prefix at/after `offset`, or len(buf) if none.  Mirrors
    edge264_find_start_code (edge264.c:87)."""
    n = 4 if four_byte else 3
    pat = b"\x00" * (n - 1) + b"\x01"
    i = buf.find(pat, offset)
    return len(buf) if i < 0 else i


class Decoder:
    """Streaming H.264 decoder: host C++ entropy front end + TPU pixel
    back end.  See ARCHITECTURE.md."""

    def __init__(self, n_tasks: int = 0, log_cb=None, log_mbs: bool = False,
                 device=None, backend: str = "numpy"):
        from .core import DecoderCore
        self._core = DecoderCore(log_cb=log_cb, log_mbs=log_mbs, device=device,
                                 backend=backend, n_tasks=n_tasks)

    # -- streaming ---------------------------------------------------------
    def decode_nal(self, buf: bytes | memoryview | None) -> int:
        """Decode one NAL unit (without its start code).  Passing None or an
        empty buffer drains the DPB (end-of-stream semantics)."""
        return self._core.decode_nal(buf)

    def get_frame(self, borrow: bool = False) -> Frame | None:
        return self._core.get_frame(borrow)

    def return_frame(self, frame: Frame) -> None:
        self._core.return_frame(frame)

    def flush(self) -> None:
        self._core.flush()

    def close(self) -> None:
        self._core.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def decode_annexb(stream: bytes, **kw):
    """Convenience: decode a whole Annex-B stream, yielding Frames in output
    order (the loop of the reference's decode_file, edge264_test.c:361-375)."""
    with Decoder(**kw) as dec:
        pos = find_start_code(stream, 0)
        pos += 3
        res = 0
        stall = 0
        while res in (0, errno.ENOBUFS, errno.ENOTSUP, errno.EBADMSG):
            end = find_start_code(stream, pos)
            res = dec.decode_nal(stream[pos:end] if pos < len(stream) else None)
            stall += 1
            while (frm := dec.get_frame()) is not None:
                yield frm
                stall = 0
            if res != errno.ENOBUFS:
                pos = end + 3
            elif stall > 0:
                # incomplete frames can never complete: cap the stall no
                # matter what wait_frame reports (a "ready" head frame that
                # get_frame still refuses, e.g. an MVC pair whose non-base
                # view is pending, must not spin forever)
                if stall > 64:
                    break
                # frame-task mode: the head frame may still be parsing on
                # a worker; block for it instead of spinning
                if dec._core.wait_frame() == 0:
                    continue

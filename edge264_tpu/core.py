"""DecoderCore: wires the native syntax front end to a pixel back end.

The front end (edge264_tpu/native) parses NALs into per-slot syntax planes
and emits events; this core reacts to them:

  EV_FORMAT      (re)size the frame store
  EV_FRAME_DONE  run the pixel back end on the slot's planes -> YUV
  EV_OUTPUT      queue the decoded frame (paired with MVC slot if any)

Backends share one interface: `reconstruct(planes, slot, store) -> (y,cb,cr)`
where `store` gives access to previously decoded reference frames (for MC).
Available backends:
  "numpy"  exact scalar oracle (edge264_tpu/ops/oracle.py) — golden model
  "jax"    batched XLA/Pallas device path (edge264_tpu/ops/jaxdec.py)

This mirrors the decoupling the reference achieves with task snapshots
(edge264_internal.h:219-261): entropy state never outlives the slice, pixel
work sees only dense planes.
"""

from __future__ import annotations

import errno

import numpy as np

from .api import Frame
from .native import (NativeDecoder, EV_FORMAT, EV_FRAME_START, EV_SLICE_DONE,
                     EV_FRAME_DONE, EV_OUTPUT, EV_UNPIN)


class FrameStore:
    """Holds decoded YUV planes per DPB slot (the host mirror of the
    HBM-resident DPB; the jax backend keeps device arrays here)."""

    def __init__(self):
        self.frames = {}          # slot -> (y, cb, cr) uint8 numpy

    def put(self, slot, y, cb, cr):
        self.frames[slot] = (y, cb, cr)

    def get(self, slot):
        return self.frames.get(slot)

    def drop(self, slot):
        self.frames.pop(slot, None)

    def clear(self):
        self.frames.clear()


class NumpyBackend:
    """Bit-exact scalar model; the correctness oracle."""

    def __init__(self):
        from .ops import oracle, deblock_oracle
        self.oracle = oracle
        self.deblock = deblock_oracle
        self.sm = oracle.ScalingMatrices()

    def reconstruct(self, planes, slot, store: FrameStore):
        ws8 = np.full((6, 64), 16, np.int32)
        ws8[0] = planes.sm8[0]
        ws8[1] = planes.sm8[1]
        sm = self.oracle.ScalingMatrices(ws4=np.asarray(planes.sm4),
                                         ws8=ws8)
        y, cb, cr = self.oracle.reconstruct_frame(planes, sm, store.frames)
        self.deblock.deblock_frame(planes, y, cb, cr)
        self.deblock.blend_recovered_frame(planes, y, cb, cr)
        return y, cb, cr


class DecoderCore:
    def __init__(self, log_cb=None, log_mbs=False, device=None,
                 backend: str = "numpy", n_tasks: int = 0):
        # frame-task workers and YAML logging are mutually exclusive (the
        # native layer falls back to synchronous when logging is on, like
        # the reference's separate logs build variant)
        self._nd = NativeDecoder(log=log_cb is not None, log_mbs=log_mbs,
                                 n_tasks=n_tasks)
        self._log_cb = log_cb
        self._store = FrameStore()
        self._errors = {}         # slot -> mb_errors plane (or None)
        self._outq = []           # decoded Frames in output order
        self._fmt = None
        if not isinstance(backend, str):
            self._backend = backend       # custom backend instance
        elif backend == "numpy":
            self._backend = NumpyBackend()
        elif backend == "jax":
            from .ops.jaxdec import JaxBackend
            self._backend = JaxBackend(device=device)
        else:
            raise ValueError(f"unknown backend {backend!r}")
        # probe is_ref support once: a per-frame `except TypeError` around
        # reconstruct would swallow TypeErrors raised INSIDE it and rerun a
        # backend that may already have mutated its ring state
        import inspect
        try:
            sig = inspect.signature(self._backend.reconstruct)
            self._backend_is_ref = ("is_ref" in sig.parameters or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values()))
        except (TypeError, ValueError):
            self._backend_is_ref = False

    # -- event pump --------------------------------------------------------
    def _handle(self, events):
        for kind, slot, a, b, c, d in events:
            if kind == EV_FORMAT:
                self._fmt = self._nd.format()
                self._store.clear()
            elif kind == EV_FRAME_DONE:
                planes = self._nd.planes(slot)
                if self._backend_is_ref:
                    y, cb, cr = self._backend.reconstruct(
                        planes, slot, self._store, is_ref=bool(b))
                else:
                    y, cb, cr = self._backend.reconstruct(planes, slot,
                                                          self._store)
                self._store.put(slot, y, cb, cr)
                errs = np.asarray(planes.mb_errors)
                self._errors[slot] = errs.copy() if errs.any() else None
            elif kind == EV_UNPIN:
                self._store.drop(slot)
                if hasattr(self._backend, "unpin"):
                    self._backend.unpin(slot)
        if self._log_cb is not None:
            log = self._nd.get_log()
            if log:
                self._log_cb(log)

    def decode_nal(self, buf) -> int:
        data = bytes(buf) if buf else b""
        ret, events = self._nd.decode_nal(data)
        self._handle(events)
        return ret

    def wait_frame(self) -> int:
        """Block until the oldest queued output frame completes (frame-task
        mode); then drain the retirement events so its planes reconstruct."""
        r = self._nd.wait_frame()
        self._handle(self._nd.poll())
        return r

    def get_frame(self, borrow: bool = False) -> Frame | None:
        # worker tasks may have retired frames since the last decode_nal:
        # drain their events first so the store holds the planes
        self._handle(self._nd.poll())
        info = self._nd.get_frame(borrow=borrow)
        if info is None:
            return None
        fmt = self._fmt or self._nd.format()
        slot = info["slot"]
        planes = self._store.get(slot)
        if planes is None:            # frame had no parsed mbs (shouldn't)
            return None
        y, cb, cr = (np.asarray(p) for p in planes)
        ct, cr_, cb_, cl = (fmt["crop_top"], fmt["crop_right"],
                            fmt["crop_bottom"], fmt["crop_left"])
        wY, hY = fmt["mb_w"] * 16, fmt["mb_h"] * 16
        f = Frame(
            y=y[ct:hY - cb_, cl:wY - cr_],
            cb=cb[ct // 2:(hY - cb_) // 2, cl // 2:(wY - cr_) // 2],
            cr=cr[ct // 2:(hY - cb_) // 2, cl // 2:(wY - cr_) // 2],
            frame_id=info["frame_id"],
            mb_errors=self._errors.get(slot),
            crop_offsets=(ct, cr_, cb_, cl),
            timing=(fmt.get("num_units_in_tick", 0),
                    fmt.get("time_scale", 0)),
            return_arg=slot,
        )
        mslot = info["slot_mvc"]
        if mslot >= 0:
            f.return_arg = (slot, mslot)   # return both views' borrows
            mp = self._store.get(mslot)
            if mp is not None:
                my, mcb, mcr = (np.asarray(p) for p in mp)
                f.y_mvc = my[ct:hY - cb_, cl:wY - cr_]
                f.cb_mvc = mcb[ct // 2:(hY - cb_) // 2,
                               cl // 2:(wY - cr_) // 2]
                f.cr_mvc = mcr[ct // 2:(hY - cb_) // 2,
                               cl // 2:(wY - cr_) // 2]
                f.frame_id_mvc = info["frame_id_mvc"]
        return f

    def return_frame(self, frame: Frame) -> None:
        """Release a borrowed frame's DPB slot(s).  Only meaningful after
        get_frame(borrow=True); borrowed slots stay in `outputq` and count
        toward the 32-slot ENOBUFS backpressure until returned (the
        reference's borrow bitmask, edge264.c:365-411)."""
        arg = frame.return_arg
        if arg is None:
            return
        slots = arg if isinstance(arg, tuple) else (arg,)
        for s in slots:
            if s is not None and s >= 0:
                self._nd.return_frame(s)

    def flush(self) -> None:
        self._nd.flush()
        self._store.clear()
        self._outq.clear()

    def close(self) -> None:
        self._nd.close()

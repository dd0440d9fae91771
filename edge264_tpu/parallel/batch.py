"""K-lane lockstep GOP decoding — the TPU-native scaling unit.

A stream splits into closed GOPs (independent by construction); K of them
decode in LOCKSTEP: every device step processes one frame from each lane
as a single batched program (ops/batched.decode_batch_step), so the
wavefront kernels' per-wave fixed cost and every dense op's dispatch
overhead amortize over K.  Host entropy for the K lanes runs on worker
threads (the C++ front end releases the GIL).

The same lane axis is the MULTI-CHIP axis: passing a jax Mesh shards the
[K, ...] batch over its "gop" axis with NamedSharding — each device
decodes its lanes' frames, keeping its lane-local reference rings in HBM;
no cross-chip traffic is needed because GOP lanes are reference-closed
(the reference's frame-task dependency graph, edge264_headers.c:1275-1277,
never crosses an IDR).  Cross-host GOP distribution composes on top by
giving each host a disjoint GOP range (see BASELINE.md scaling row).

Within a lane, frames still decode in order (P/B need their references'
pixels), matching the reference's dependency gating; lanes that exhaust
their GOP early idle out with masked (zero-arena) steps until the batch
drains.

MVC streams ride the same machinery: each view-frame is one lockstep
step (base first, then the non-base view inter-view referencing it —
base frames stay in the ring via EV_FRAME_DONE's base-view bit), and
output pairs the views per access unit like the reference
(edge264.c:373-399).
"""

from __future__ import annotations

import concurrent.futures
import os
import queue
import threading

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..api import Frame, find_start_code
from ..native import NativeDecoder, EV_FORMAT, EV_FRAME_DONE, EV_UNPIN
from ..ops import jaxdec as J
from ..ops import batched as B
from .gop import split_gops


class _Lane:
    """One GOP's native front end, pumped frame-by-frame.

    Drives decode_nal until EV_FRAME_DONE, then exposes the completed
    slot's planes for the batched device step; get_frame drains output
    order."""

    def __init__(self, stream: bytes):
        self.nd = NativeDecoder()
        self.stream = stream
        self.pos = find_start_code(stream, 0) + 3
        self.done_slots = []      # slots parsed, awaiting device step
        self.out_frames = []      # get_frame info dicts in output order
                                  # (slot/slot_mvc pairs for MVC)
        self.ring_map = {}        # DPB slot -> ring index
        self.ring_free = None     # assigned by the driver
        self.slot_ring = np.zeros(32, np.int32)
        self.finished = False
        self.fmt = None
        self.store = {}           # frame_id -> (step, lane) into step_out
        # outputs are taken with borrow=True so their DPB slots stay
        # PINNED (planes memory intact) until the driver has packed them
        # -- that is what makes it safe to parse the NEXT frame on a
        # worker thread while the main thread packs this step's planes
        self.fid_step = {}        # frame_id -> index into done_slots
        self.unreturned = []      # borrowed infos awaiting pack

    def _pump_events(self, events):
        for kind, slot, a, b, c, d in events:
            if kind == EV_FORMAT:
                self.fmt = self.nd.format()
            elif kind == EV_FRAME_DONE:
                # a = frame_id, b = is_ref|is_mvc_base
                self.fid_step[a] = len(self.done_slots)
                self.done_slots.append((slot, a, b))
            elif kind == EV_UNPIN:
                i = self.ring_map.pop(slot, None)
                if i is not None and i != self.S:   # S = write-off lane
                    self.ring_free.append(i)

    def parse_next_frame(self):
        """Advance the bitstream until one more frame completes (appends
        to done_slots) or the stream ends."""
        want = len(self.done_slots) + 1
        stall = 0
        while len(self.done_slots) < want:
            if self.pos >= len(self.stream):
                if self.finished:
                    return False
                ret, events = self.nd.decode_nal(b"")
                self._pump_events(events)
                while True:
                    info = self.nd.get_frame(borrow=True)
                    if info is None:
                        break
                    self.out_frames.append(info)
                    self.unreturned.append(info)
                if ret != 105:          # != ENOBUFS: fully drained
                    self.finished = True
                continue
            end = find_start_code(self.stream, self.pos)
            ret, events = self.nd.decode_nal(self.stream[self.pos:end])
            self._pump_events(events)
            while True:
                info = self.nd.get_frame(borrow=True)
                if info is None:
                    break
                self.out_frames.append(info)
                self.unreturned.append(info)
            if ret == 105:
                stall += 1
                if stall > 64:
                    return False
            else:
                stall = 0
                self.pos = end + 3
        return True


class DigestFrame:
    """Lightweight per-frame record yielded by sink="digest": the pixels
    stay in device HBM (the TPU-native delivery — the consumer of a
    TPU decoder is a TPU model); `digest` is the 64-bit device checksum
    whose numpy twin (ops.batched.host_frame_digest) derives golden
    values from the reference decoder's YUV."""

    __slots__ = ("frame_id", "digest", "frame_id_mvc", "digest_mvc")

    def __init__(self, frame_id, digest):
        self.frame_id = frame_id
        self.digest = digest
        self.frame_id_mvc = None
        self.digest_mvc = None


def _stack_level_tables(lane_tabs, planes_list):
    """Stack per-lane level-compressed intra tables into one
    [K, 3, Lb, Nb] int32 batch (mxs | mys | valid — ONE device transfer,
    lane-major so the mesh path shards it like every other batch),
    padding every lane to the largest bucket in the group (bucket menus
    in jaxdec.intra_level_tables keep the jit-variant count bounded).
    Returns None when any LIVE lane is intra-dense (no table): the whole
    step then uses the sheared scan, keeping one program per step."""
    live = [t for t, pl in zip(lane_tabs, planes_list) if pl is not None]
    if any(t is None for t in live):
        return None
    Lb = max(t[0].shape[0] for t in live)
    Nb = max(t[0].shape[1] for t in live)
    tabs = np.zeros((len(lane_tabs), 3, Lb, Nb), np.int32)
    for k, (t, pl) in enumerate(zip(lane_tabs, planes_list)):
        if pl is None:
            continue                    # dead lane: all-invalid tables
        tl, tn = t[0].shape
        tabs[k, 0, :tl, :tn] = t[0]
        tabs[k, 1, :tl, :tn] = t[1]
        tabs[k, 2, :tl, :tn] = t[2]
    return tabs


class _DaemonFetcher:
    """Small executor on DAEMON threads, used for eager D2H fetches.  A
    ThreadPoolExecutor worker blocked in np.asarray on a wedged tunnel
    is non-daemon and prevents process exit (the exact hang the bench
    watchdog exists to avoid); daemon threads cannot."""

    def __init__(self, n=1):
        self._q = queue.SimpleQueue()
        self._ts = [threading.Thread(target=self._run, daemon=True,
                                     name=f"e264t-fetcher-{i}")
                    for i in range(n)]
        for t in self._ts:
            t.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, fut = item
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                fut.set_result(fn(*args))
            except BaseException as e:          # noqa: BLE001
                fut.set_exception(e)

    def submit(self, fn, *args):
        fut = concurrent.futures.Future()
        self._q.put((fn, args, fut))
        return fut

    def shutdown(self, wait=True):
        for _ in self._ts:
            self._q.put(None)
        if wait:
            for t in self._ts:
                t.join(timeout=60.0)


def _return_packed(ln: _Lane, step: int):
    """Release output borrows whose planes were packed at done index
    <= step (both views for MVC pairs): the native DPB may then reuse
    those slots while the NEXT step's entropy parses concurrently.
    Must run while the lane's parse thread is idle (native API calls
    are not synchronized against decode_nal)."""
    still = []
    for info in ln.unreturned:
        s = ln.fid_step.get(info["frame_id"], 1 << 30)
        if info["slot_mvc"] >= 0:
            s = max(s, ln.fid_step.get(info["frame_id_mvc"], 1 << 30))
        if s <= step:
            ln.nd.return_frame(info["slot"])
            if info["slot_mvc"] >= 0:
                ln.nd.return_frame(info["slot_mvc"])
        else:
            still.append(info)
    ln.unreturned = still


def decode_gops_batched(stream: bytes, *, lanes: int = 4, mesh: Mesh = None,
                        axis: str = "gop", sink: str = "frames"):
    """Decode a whole Annex-B stream with GOPs in K-lane lockstep; yields
    Frames in stream order.  With `mesh`, the lane axis is sharded over
    the mesh devices (lanes must be a multiple of the mesh size).

    sink="frames": frames are copied to host and yielded as Frames.
    sink="digest": frames STAY IN DEVICE HBM; yields DigestFrames
    carrying only the 64-bit device checksum per frame (the TPU-native
    delivery — consumers of a TPU decoder are TPU models; the host link
    then carries 8 bytes/frame instead of 3 MB)."""
    gops = split_gops(stream)
    results = [[] for _ in gops]
    # per-lane reference ring slots; grows by doubling on demand.  The
    # Pallas MC kernel's VMEM band scratch scales with S, so a smaller
    # start is cheaper when streams use few references.
    S = int(os.environ.get("E264T_RING_S", "8"))

    sharding = None
    if mesh is not None:
        assert lanes % mesh.devices.size == 0, \
            "lanes must be a multiple of the mesh size"
        sharding = NamedSharding(mesh, P(axis))

    for base in range(0, len(gops), lanes):
        group = gops[base:base + lanes]
        _decode_group(group, results, base, S, lanes, sharding, sink)
    for frames in results:
        yield from frames


def _decode_group(group, results, base, S, lanes, sharding,
                  sink="frames"):
    import sys
    import time as _time
    prof = (dict(entropy=0.0, pack=0.0, dispatch=0.0, d2h=0.0, frames=0,
                 steps=0, t_start=_time.perf_counter(), t_loop=0.0)
            if os.environ.get("E264T_LANE_PROF") else None)
    _clk = _time.perf_counter
    # sparse-intra path: masked level-rounds (jaxdec.intra_rounds) —
    # full-frame static-slice passes, one per intra dependency depth —
    # replace both the ~254-wave sheared scan (TPU: ~25 ms/frame at
    # 1080p) and the old level-compressed gather scan (whose dynamic
    # gathers serialize on TPU: 276 ms/frame) on P/B steps.
    # E264T_LEVELS=1 restores the gather scan (CPU debug);
    # E264T_NO_ROUNDS falls back to sheared everywhere.
    use_levels = (bool(os.environ.get("E264T_LEVELS"))
                  and not J.use_pallas())
    use_rounds = (not use_levels
                  and not os.environ.get("E264T_NO_ROUNDS"))
    if sharding is not None:
        # shardings need the full lane count; missing GOPs become dead
        # lanes (empty streams decode to nothing)
        group = list(group) + [b""] * (lanes - len(group))
    K = len(group)
    lane_objs = [_Lane(g) for g in group]
    for ln in lane_objs:
        ln.S = S
        ln.ring_free = list(range(S))

    def start_parsing(at_step):
        ts = []
        for ln in lane_objs:
            if len(ln.done_slots) <= at_step and not ln.finished:
                t = threading.Thread(target=ln.parse_next_frame)
                t.start()
                ts.append(t)
        return ts

    def live_at(at_step):
        return [i for i, ln in enumerate(lane_objs)
                if len(ln.done_slots) > at_step]

    # 2 fetcher threads: the D2H wire runs at ~30-40 MB/s and a single
    # in-order fetch stream leaves it idle between steps (the demand
    # also drives execution, which is enqueue-ordered regardless of
    # which thread asks)
    fetcher = _DaemonFetcher(
        n=int(os.environ.get("E264T_FETCH_THREADS",
                             "2" if sink != "digest" else "1")))
    refL = refC = None
    keep = set()
    gat_state = {}      # sticky sparse-coefficient buckets (pack_planes_batch)
    # residual levels ship as int8 while every frame fits (~37% less
    # H2D); the first over-range lane drops the group to int16 for good
    # (one layout change, bounded program count).  Default on only for
    # the real TPU: on CPU it just doubles the test suite's compile load
    coef8 = os.environ.get(
        "E264T_COEF8", "1" if J.use_pallas() else "0") != "0"
    step = 0
    step_out = []     # per-step batched (y, cb, cr) device arrays
    # PIPELINE: step N+1's entropy threads are started before step N's
    # pack+dispatch, so host parsing overlaps both the packing and the
    # device execution (the reference's parse/deblock pipelining idea,
    # edge264_slice.c:1810-1820).  Output borrows keep packed-pending
    # slots pinned, and all native API calls stay on the main thread
    # while lane threads are idle.
    threads = start_parsing(0)
    while True:
        # --- wait for this step's entropy (overlapped with the previous
        # step's pack + device work) -------------------------------------
        t0 = _clk() if prof else 0.0
        for t in threads:
            t.join()
        live = live_at(step)
        if prof:
            prof["entropy"] += _clk() - t0
        if not live:
            # a reorder backlog plus not-yet-returned borrows can wedge
            # parse_next_frame's ENOBUFS stall cap: release every packed
            # borrow and retry once before declaring the group done
            for ln in lane_objs:
                _return_packed(ln, step - 1)
            for t in start_parsing(step):
                t.join()
            live = live_at(step)
        if not live:
            break

        # --- form the lockstep batch -----------------------------------
        t0 = _clk() if prof else 0.0
        mbW = lane_objs[live[0]].fmt["mb_w"]
        mbH = lane_objs[live[0]].fmt["mb_h"]

        # grow the reference rings by doubling when any lane runs out of
        # slots (mirrors JaxBackend._ring_reserve; max_num_ref_frames can
        # reach 16, so a fixed ring silently mis-references legal streams)
        needs_slot = any(
            ln.done_slots[step][2] and not ln.ring_free
            for ln in lane_objs if len(ln.done_slots) > step)
        if needs_slot:
            S2 = S * 2
            if refL is not None:
                refL, refC = B.grow_ref_rings(refL, refC, S, S2, sharding)
            for ln in lane_objs:
                ln.ring_free.extend(range(S, S2))
                ln.S = S2
            S = S2

        planes_list = []
        sm4s, sm8s, ring_slots, slot_maps = [], [], [], []
        lane_tabs = []
        for i, ln in enumerate(lane_objs):
            if len(ln.done_slots) > step:
                slot, _fid, is_ref = ln.done_slots[step]
                pl = ln.nd.planes(slot)
                flags = np.asarray(pl.mb_flags)
                if (flags & 8).any():          # MBF_T8x8
                    keep |= {"coef_y8", "i8_modes"}
                if (flags & 4).any():          # MBF_IPCM
                    keep |= {"pcm_y", "pcm_c"}
                if (flags & 256).any():        # MBF_BLEND
                    keep |= {"mb_errors", "slice_id"}
                if (np.asarray(pl.wp).any()
                        or np.asarray(pl.wp8).any()):
                    keep |= {"wp", "wp8"}
                # sparse-intra scheduling: depth plane for the rounds
                # path (or legacy level tables); any intra-dense lane
                # (IDRs) falls the whole STEP back to the sheared scan
                # (lanes share one program per step)
                if use_rounds:
                    lane_tabs.append(
                        J.intra_round_plane(flags, mbW, mbH))
                elif use_levels:
                    lane_tabs.append(
                        J.intra_level_tables(flags, mbW, mbH))
                else:
                    lane_tabs.append(None)
                planes_list.append(pl)
                sm4 = np.asarray(pl.sm4).astype(np.int32)
                ws8 = np.full((6, 64), 16, np.int32)
                ws8[0] = pl.sm8[0]
                ws8[1] = pl.sm8[1]
                sm4s.append(sm4)
                sm8s.append(ws8)
                # reference bookkeeping: reserve a ring slot (or the
                # write-off lane S for non-reference frames)
                # only REFERENCE frames occupy ring slots (non-refs are
                # never read back; they go to the write-off lane S) --
                # bounded by max_num_ref_frames like the reference DPB
                if is_ref and ln.ring_free:
                    ri = ln.ring_free.pop()
                    ln.ring_map[slot] = ri
                else:
                    ri = S
                ln.slot_ring[slot] = ri
                ring_slots.append(ln.slot_ring[slot])
                smap = np.zeros(32, np.int32)
                for s_, r_ in ln.ring_map.items():
                    smap[s_] = min(r_, S - 1)
                slot_maps.append(smap)
            else:
                planes_list.append(None)
                lane_tabs.append(None)
                sm4s.append(np.full((6, 16), 16, np.int32))
                sm8s.append(np.full((6, 64), 16, np.int32))
                ring_slots.append(S)
                slot_maps.append(np.zeros(32, np.int32))

        # borrows packed at earlier steps are safe to release now; then
        # kick off the NEXT step's entropy so it overlaps this step's
        # pack + dispatch (phase order matters: native API calls only
        # while the lane threads are idle)
        for ln in lane_objs:
            _return_packed(ln, step - 1)
        threads = start_parsing(step + 1)
        if prof:
            prof["form"] = prof.get("form", 0.0) + _clk() - t0
            t0 = _clk()

        # ONE device transfer per step: all lanes' planes + the per-step
        # meta block (scaling matrices, slot maps, ring slots) in a
        # single [K, L] put — each separate put pays the tunnel's ~25 ms
        # fixed cost (tools/profile_h2d.py).  Dead lanes are all-zero
        # rows of the shared layout.
        ref_pl = next(p for p in planes_list if p is not None)
        meta = B.pack_meta(sm4s, sm8s, slot_maps, ring_slots)
        # int8 coefficients stay off for good once any frame exceeds the
        # range (pack_planes_batch probes and sets coef8_off) — one
        # layout change per stream, bounded program count
        if coef8 and gat_state.get("coef8_off"):
            coef8 = False
        bufnp, layout, meta_off = J.pack_planes_batch(
            planes_list, ref_pl, keep=keep, coef8=coef8, extra=meta,
            gat_state=gat_state)
        if prof:
            prof["npk"] = prof.get("npk", 0.0) + _clk() - t0
            t0 = _clk()
        if sharding is not None:
            arenas = jax.device_put(bufnp, sharding)
        else:
            arenas = jnp.asarray(bufnp)
        if prof:
            prof["put"] = prof.get("put", 0.0) + _clk() - t0
            t0 = _clk()
        if refL is None:
            refL, refC = B.alloc_ref_rings(K, S, mbW, mbH)
            if sharding is not None:
                refL = jax.device_put(refL, sharding)
                refC = jax.device_put(refC, sharding)

        mc = step > 0 and not os.environ.get("E264T_NO_MC")
        fmt = lane_objs[live[0]].fmt
        crop = (fmt["crop_top"], fmt["crop_right"],
                fmt["crop_bottom"], fmt["crop_left"])
        emit = "digest" if sink == "digest" else "flat"
        if prof:
            prof["pack"] += _clk() - t0
            t0 = _clk()
        # the Mosaic intra kernel is RETIRED from the driver: it faulted
        # the chip on real 1080p content across rounds 2-4 (suspected
        # Mosaic compiler issue; interpret-mode bit-exact — see
        # ops/pallas_intra.py and tools/bisect_pallas_intra.py), and the
        # masked level-rounds path below removed its reason to exist on
        # P/B steps.  Intra-dense steps use the sheared XLA scan.
        intra_mode = "sheared"
        itabs = None
        if intra_mode == "sheared" and use_rounds:
            live_tabs = [t for t, pl in zip(lane_tabs, planes_list)
                         if pl is not None]
            if live_tabs and all(t is not None for t in live_tabs):
                if all(int(t[0].max()) == 0 for t in live_tabs):
                    intra_mode = "skip"     # no intra/PCM mb anywhere
                else:
                    # nested buckets, so the max is itself a bucket; the
                    # depth plane is recomputed on device from mb_flags
                    # (no extra H2D)
                    intra_mode = f"rounds{max(t[1] for t in live_tabs)}"
        elif intra_mode == "sheared" and use_levels:
            itabs = _stack_level_tables(lane_tabs, planes_list)
            if itabs is not None:
                intra_mode = "levels"
                itabs = (jax.device_put(itabs, sharding)
                         if sharding is not None else jnp.asarray(itabs))
        update = not os.environ.get("E264T_NO_UPDATE_REFS")
        if sharding is not None:
            y, cb, cr, aux, refL, refC = B.decode_batch_step_sharded(
                arenas, (refL, refC), itabs, layout=layout,
                meta_off=meta_off, mbW=mbW, mbH=mbH, has_b=True,
                intra_mode=intra_mode, mc=mc, emit=emit, crop=crop,
                update=update, mesh=sharding.mesh)
        else:
            y, cb, cr, aux, refL, refC = B.decode_batch_step(
                arenas, (refL, refC), itabs, layout=layout,
                meta_off=meta_off, mbW=mbW, mbH=mbH, has_b=True,
                intra_mode=intra_mode, mc=mc, emit=emit, crop=crop,
                update=update)
        if os.environ.get("E264T_SYNC_STEPS"):
            # debug/profiling: surface device faults AT the faulting step
            # (async dispatch otherwise defers them to the output D2H).
            # The fence is a D2H of computed data — block_until_ready is
            # NOT a fence on the axon backend (tools/profile_stages2.py)
            t0s = _clk()
            np.asarray(aux if aux is not None else refL[:, :1, :1, :1, :8])
            sys.stderr.write(f"[sync-step] step {step} "
                             f"({len(live)} live lanes) ready "
                             f"in {_clk()-t0s:.3f}s\n")
        if prof:
            prof["dispatch"] += _clk() - t0
            prof["steps"] += 1
            prof["frames"] += len(live)

        # --- hand decoded frames back to their lanes (keyed by frame_id:
        # DPB slots are reused within a lane).  The step's aux output
        # (ONE flattened [K, Y+C+C] buffer, or [K, 2] digests) is FETCHED
        # BY A BACKGROUND THREAD immediately: the axon backend dispatches
        # lazily (nothing executes until a result is demanded), so
        # without an eager demand every step's device work would
        # serialize AFTER the host loop instead of overlapping the next
        # steps' entropy + pack.  One fetcher thread keeps fetches in
        # step order. ---------------------------------------------------
        step_out.append((fetcher.submit(np.asarray, aux),
                         y.shape, cb.shape))
        for i, ln in enumerate(lane_objs):
            if planes_list[i] is not None:
                ln.store[ln.done_slots[step][1]] = (step, i)
        step += 1

    if prof:
        prof["t_loop"] = _clk() - prof["t_start"]

    # --- output in stream order ------------------------------------------
    host_steps = {}        # step -> (y, cb, cr) numpy batches | digests

    def step_np(s):
        """ONE D2H per STEP (the whole flattened [K, ...] batch, already
        in flight from copy_to_host_async), not one per plane/frame."""
        if s not in host_steps:
            t0 = _clk() if prof else 0.0
            fut, yshape, cshape = step_out[s]
            a = fut.result()
            if sink == "digest":
                host_steps[s] = a                       # [K, 2] uint32
            else:
                ny = yshape[1] * yshape[2]
                nc = cshape[1] * cshape[2]
                host_steps[s] = (a[:, :ny].reshape(yshape),
                                 a[:, ny:ny + nc].reshape(cshape),
                                 a[:, ny + nc:].reshape(cshape))
            if prof:
                prof["d2h"] += _clk() - t0
        return host_steps[s]

    for i, ln in enumerate(lane_objs):
        fmt = ln.fmt
        if fmt is None or base + i >= len(results):
            # dead padding lane (mesh path rounds the group up to `lanes`
            # with empty streams): nothing was decoded, nothing to emit
            ln.nd.close()
            continue
        ct, cr_, cb_, cl = (fmt["crop_top"], fmt["crop_right"],
                            fmt["crop_bottom"], fmt["crop_left"])
        wY, hY = fmt["mb_w"] * 16, fmt["mb_h"] * 16

        def crop(s, lane):
            yb, cbb, crb = step_np(s)
            return (yb[lane][ct:hY - cb_, cl:wY - cr_],
                    cbb[lane][ct // 2:(hY - cb_) // 2,
                              cl // 2:(wY - cr_) // 2],
                    crb[lane][ct // 2:(hY - cb_) // 2,
                              cl // 2:(wY - cr_) // 2])

        for info in ln.out_frames:
            frame_id = info["frame_id"]
            if sink == "digest":
                s, lane = ln.store[frame_id]
                f = DigestFrame(frame_id, tuple(int(v) for v in
                                                step_np(s)[lane]))
                if info["slot_mvc"] >= 0:
                    mfid = info["frame_id_mvc"]
                    s, lane = ln.store[mfid]
                    f.frame_id_mvc = mfid
                    f.digest_mvc = tuple(int(v) for v in
                                         step_np(s)[lane])
                results[base + i].append(f)
                continue
            ya, cba, cra = crop(*ln.store[frame_id])
            f = Frame(
                y=ya, cb=cba, cr=cra,
                frame_id=frame_id,
                crop_offsets=(ct, cr_, cb_, cl),
                return_arg=info["slot"],
            )
            if info["slot_mvc"] >= 0:      # paired MVC view (edge264.c:
                mfid = info["frame_id_mvc"]  # 373-399 output protocol)
                f.y_mvc, f.cb_mvc, f.cr_mvc = crop(*ln.store[mfid])
                f.frame_id_mvc = mfid
            results[base + i].append(f)
        ln.nd.close()
    fetcher.shutdown(wait=True)
    if prof and prof["frames"]:
        n = prof["frames"]
        sys.stderr.write(
            f"[lane-prof] {n} frames / {prof['steps']} steps: "
            f"entropy {prof['entropy']/n*1e3:.1f} pack "
            f"{prof['pack']/n*1e3:.1f} "
            f"(form {prof.get('form', 0.0)/n*1e3:.1f} npk "
            f"{prof.get('npk', 0.0)/n*1e3:.1f} put "
            f"{prof.get('put', 0.0)/n*1e3:.1f}) dispatch "
            f"{prof['dispatch']/n*1e3:.1f} d2h+device "
            f"{prof['d2h']/n*1e3:.1f} ms/frame "
            f"| wall: loop {prof['t_loop']:.2f}s drain "
            f"{_clk()-prof['t_start']-prof['t_loop']:.2f}s "
            "(dispatch is async enqueue; device execution drains into "
            "d2h)\n")

"""Lockstep-batched device pixel path: K independent frames (from K
concurrent GOPs) run every stage together, so the wavefront kernels'
per-wave fixed cost and every dense op's dispatch/layout overhead
amortize over the batch.  This is the TPU analog of the reference's
frame-level task parallelism (edge264_headers.c:1275-1277): chips don't
want more threads, they want wider ops.

The step is SPLIT INTO ONE PROGRAM PER STAGE (residual | MC | intra |
deblock | refs) rather than one fused program:

  * the axon TPU compiler (2026-08 update) MISCOMPILES the fused
    1080p program — residual feeding the sheared intra scan in one
    executable faults the chip on launch, while every stage alone (and
    the stage-split pipeline) runs correctly (tools/repro_fault.py);
  * compile time is superlinear in program size: the fused 1080p step
    took ~175-600 s to compile, the split stages ~21 s total;
  * stages re-unpack the planes they need from the shared arena (slice
    + bitcast fuse into the consumers; XLA DCEs the planes a stage
    doesn't read), so no giant int32 plane dict materializes in HBM.

The per-lane reference store is a persistent device ring
[K, S+1, ...] (slot S is a write-off lane for non-reference frames);
`update_refs` donates its inputs so slot writes are in-place in HBM.

See parallel/batch.py for the host-side rendezvous that forms batches.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import jaxdec as J
from . import oracle as _o


def _stage_norms():
    norm4 = jnp.asarray(_o.NORM_ADJUST_4x4.reshape(6, 16))
    norm8 = jnp.asarray(_o.NORM_ADJUST_8x8.reshape(6, 64))
    return norm4, norm8


def _unpack(arenas, layout):
    return jax.vmap(lambda a: J._unpack_planes(a, layout))(arenas)


# ---------------------------------------------------------------------------
# stage programs (each its own jit; see module docstring for why)

@functools.partial(jax.jit, static_argnames=("layout", "has_t8"))
def _stage_residual(arenas, sm4, sm8, *, layout, has_t8):
    norm4, norm8 = _stage_norms()
    p = _unpack(arenas, layout)
    return jax.vmap(
        lambda pp, s4, s8: J.residual_frame(pp, s4, s8, norm4, norm8,
                                            has_t8))(p, sm4, sm8)


@functools.partial(jax.jit, static_argnames=("layout", "has_b", "mbW",
                                             "mbH"))
def _stage_mc(arenas, res_y, res_cb, res_cr, refL, refC, slot_maps, *,
              layout, has_b, mbW, mbH):
    """Inter prediction + residual add (masked to inter mbs) — XLA
    gather path (CPU / fallback)."""
    p = _unpack(arenas, layout)
    pred = jax.vmap(
        lambda pp, rl, rc, sm: J.mc_frame(pp, rl, rc, sm, has_b)
    )(p, refL, refC, slot_maps)
    pred_y, pred_cb, pred_cr, mask_y, mask_c = pred
    y = jnp.where(mask_y, jnp.clip(pred_y + res_y, 0, 255), 0)
    cb = jnp.where(mask_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
    cr = jnp.where(mask_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    return y, cb, cr


# The Pallas MC stage runs as THREE programs (param pack | Mosaic
# kernels | weighted combine): embedding the kernel custom calls in a
# larger program trips the same axon miscompile as the fused step
# (tools/repro_mc_fault.py — kernels alone pass, kernels + surrounding
# XLA fault).

@functools.partial(jax.jit, static_argnames=("layout", "has_b", "mbW",
                                             "mbH"))
def _stage_mc_pack(arenas, slot_maps, *, layout, has_b, mbW, mbH):
    from . import pallas_mc
    p = _unpack(arenas, layout)
    return pallas_mc.pack_mc_params(p, slot_maps, has_b, mbW, mbH)


@functools.partial(jax.jit, static_argnames=("has_b", "mbW", "mbH"))
def _stage_mc_kernels(flg, pkl, pkc, refL, refC, *, has_b, mbW, mbH):
    from . import pallas_mc
    return pallas_mc.run_mc_kernels(flg, pkl, pkc, refL, refC, has_b,
                                    mbW, mbH)


@functools.partial(jax.jit, static_argnames=("layout", "has_b"))
def _stage_mc_combine(arenas, slot_maps, flat, res_y, res_cb, res_cr, *,
                      layout, has_b):
    from . import pallas_mc
    p = _unpack(arenas, layout)
    pred_y, pred_cb, pred_cr, mask_y, mask_c = pallas_mc.combine_mc(
        p, slot_maps, flat, has_b)
    y = jnp.where(mask_y, jnp.clip(pred_y + res_y, 0, 255), 0)
    cb = jnp.where(mask_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
    cr = jnp.where(mask_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    return y, cb, cr


def _mc_pallas(arenas, res_y, res_cb, res_cr, refL, refC, slot_maps,
               layout, has_b, mbW, mbH):
    flg, pkl, pkc = _stage_mc_pack(arenas, slot_maps, layout=layout,
                                   has_b=has_b, mbW=mbW, mbH=mbH)
    flat = _stage_mc_kernels(flg, pkl, pkc, refL, refC, has_b=has_b,
                             mbW=mbW, mbH=mbH)
    return _stage_mc_combine(arenas, slot_maps, flat, res_y, res_cb,
                             res_cr, layout=layout, has_b=has_b)


def _intra_dispatch(y, cb, cr, res_y, res_cb, res_cr, p, itabs,
                    intra_mode, mbW, mbH, has_t8, has_pcm):
    """Shared intra-mode dispatch.  `itabs` is mode-specific: level
    tables [K, 3, Lb, Nb] for "levels", the dependency-depth plane
    [K, mbH, mbW] for "rounds{R}" (see jaxdec.intra_rounds), None
    otherwise.  "skip" = the step has no intra/PCM macroblock in any
    lane, so the stage is the identity."""
    if intra_mode == "skip":
        return y, cb, cr
    if intra_mode.startswith("rounds"):
        R = int(intra_mode[len("rounds"):])
        return jax.vmap(
            lambda yy, cc, rr, ry, rcb, rcr, pp:
            J.intra_rounds(yy, cc, rr, ry, rcb, rcr, pp, None, mbW, mbH,
                           R, has_t8, has_pcm)
        )(y, cb, cr, res_y, res_cb, res_cr, p)
    if intra_mode == "levels":
        return jax.vmap(
            lambda yy, cc, rr, ry, rcb, rcr, pp, tt:
            J.intra_scan(yy, cc, rr, ry, rcb, rcr, pp,
                         (tt[0], tt[1], tt[2].astype(bool)))
        )(y, cb, cr, res_y, res_cb, res_cr, p, itabs)
    if intra_mode == "pallas":
        from .pallas_intra import intra_pallas_batch
        return intra_pallas_batch(y, cb, cr, res_y, res_cb, res_cr,
                                  p, mbW, mbH)
    return jax.vmap(
        lambda yy, cc, rr, ry, rcb, rcr, pp:
        J.intra_scan_sheared(yy, cc, rr, ry, rcb, rcr, pp, mbW, mbH,
                             has_t8, has_pcm)
    )(y, cb, cr, res_y, res_cb, res_cr, p)


@functools.partial(jax.jit, static_argnames=("layout", "mbW", "mbH",
                                             "intra_mode", "has_t8",
                                             "has_pcm"))
def _stage_intra(pred, res_y, res_cb, res_cr, arenas, itabs, *, layout,
                 mbW, mbH, intra_mode, has_t8, has_pcm):
    """Intra reconstruction over the inter-predicted frame (or zeros
    when `pred` is None — intra-only steps)."""
    p = _unpack(arenas, layout)
    if pred is None:
        K = arenas.shape[0]
        y = jnp.zeros((K, 16 * mbH, 16 * mbW), jnp.int32)
        cb = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        cr = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
    else:
        y, cb, cr = pred
    return _intra_dispatch(y, cb, cr, res_y, res_cb, res_cr, p, itabs,
                           intra_mode, mbW, mbH, has_t8, has_pcm)


@functools.partial(jax.jit, static_argnames=("layout", "mbW", "mbH",
                                             "pallas"))
def _stage_deblock(y, cb, cr, arenas, *, layout, mbW, mbH, pallas):
    p = _unpack(arenas, layout)
    bs_v, bs_h = jax.vmap(J.deblock_bs)(p)
    if pallas:
        from .pallas_deblock import deblock_pallas_batch
        y, cb, cr = deblock_pallas_batch(y, cb, cr, p, bs_v, bs_h,
                                         mbW, mbH)
    else:
        y, cb, cr = jax.vmap(
            lambda yy, cc, rr, pp, bv, bh:
            J.deblock_scan(yy, cc, rr, pp, bv, bh, mbW, mbH)
        )(y, cb, cr, p, bs_v, bs_h)
    return (y.astype(jnp.uint8), cb.astype(jnp.uint8),
            cr.astype(jnp.uint8))


@jax.jit
def _stage_refs(y8, cb8, cr8):
    return jax.vmap(J.make_ref_planes)(y8, cb8, cr8)


def _kernel_choices():
    up = J.use_pallas()
    return (up and not os.environ.get("E264T_NO_PALLAS_MC"),
            up and not os.environ.get("E264T_NO_PALLAS_DEBLOCK"))


# ---------------------------------------------------------------------------
# frame digests: a 64-bit (2x uint32) position-weighted checksum computed
# ON DEVICE, so the bench's steady state ships 8 bytes/frame over the
# host link instead of 3 MB of YUV.  host_frame_digest is the exact
# numpy twin, applied to the reference decoder's YUV to derive golden
# values — every timed frame stays bit-exactness-checked.

DIG_MULS = (2654435761, 2246822519)          # Knuth / xxhash odd primes


def _digest3(y8, cb8, cr8, crop):
    """Digest of ONE frame over its CROPPED planes (uint8 2-D each)."""
    ct, cr_, cb_, cl = crop
    H, W = y8.shape
    y = y8[ct:H - cb_, cl:W - cr_]
    c0 = cb8[ct // 2:(H - cb_) // 2, cl // 2:(W - cr_) // 2]
    c1 = cr8[ct // 2:(H - cb_) // 2, cl // 2:(W - cr_) // 2]
    outs = []
    for k, mul in enumerate(DIG_MULS):
        acc = jnp.uint32(0)
        base = 1
        for p in (y, c0, c1):
            n = p.size
            i = ((jax.lax.iota(jnp.uint32, n) + jnp.uint32(base))
                 * jnp.uint32(mul))
            if k == 1:
                # quadratic weights: word 1 would otherwise be word 0
                # times a constant (both are mul*S of the same weighted
                # sum S), i.e. a 32-bit checksum dressed as 64
                i = i * i
            acc = acc + jnp.sum((p.reshape(-1).astype(jnp.uint32) + 1) * i,
                                dtype=jnp.uint32)
            base += n
        outs.append(acc)
    return jnp.stack(outs)


def host_frame_digest(y, cb, cr):
    """numpy twin of _digest3 over an ALREADY-CROPPED frame; returns a
    (d0, d1) int tuple."""
    outs = []
    for k, mul in enumerate(DIG_MULS):
        acc = 0
        base = 1
        for p in (y, cb, cr):
            n = p.size
            with np.errstate(over="ignore"):
                i = ((np.arange(n, dtype=np.uint32) + np.uint32(base))
                     * np.uint32(mul))
                if k == 1:
                    i = i * i   # quadratic word (see _digest3)
                s = ((np.ascontiguousarray(p).reshape(-1)
                      .astype(np.uint32) + 1) * i).sum(dtype=np.uint32)
            acc = (acc + int(s)) & 0xFFFFFFFF
            base += n
        outs.append(acc)
    return tuple(outs)


def _emit_aux(y8, cb8, cr8, emit, crop):
    if emit == "flat":
        K = y8.shape[0]
        return jnp.concatenate([y8.reshape(K, -1), cb8.reshape(K, -1),
                                cr8.reshape(K, -1)], axis=1)
    if emit == "digest":
        return jax.vmap(lambda a, b, c: _digest3(a, b, c, crop))(
            y8, cb8, cr8)
    return None


# ---------------------------------------------------------------------------
# per-step metadata rides the arena transfer: scaling matrices, the
# DPB-slot -> ring map and the destination ring slot are ~2 KB/lane of
# int32 appended to the packed planes (pack_planes_batch `extra`), so a
# lockstep step costs ONE device_put (each put pays the tunnel's ~25 ms
# fixed cost, tools/profile_h2d.py).

META_WORDS = 96 + 384 + 32 + 1          # sm4 | sm8 | slot_map | ring


def pack_meta(sm4s, sm8s, slot_maps, ring_slots):
    """Host side: [K, META_WORDS] int32 -> [K, 4*META_WORDS] uint8 rows
    for pack_planes_batch(extra=...)."""
    K = len(sm4s)
    m = np.empty((K, META_WORDS), np.int32)
    m[:, :96] = np.asarray(sm4s, np.int32).reshape(K, 96)
    m[:, 96:480] = np.asarray(sm8s, np.int32).reshape(K, 384)
    m[:, 480:512] = np.asarray(slot_maps, np.int32).reshape(K, 32)
    m[:, 512] = np.asarray(ring_slots, np.int32)
    return m.view(np.uint8)


def _meta_parts(arenas, meta_off):
    """Device side: slice + bitcast the meta block back out (fuses into
    consumers like _unpack_planes)."""
    K = arenas.shape[0]
    raw = jax.lax.slice(arenas, (0, meta_off),
                        (K, meta_off + 4 * META_WORDS))
    m = jax.lax.bitcast_convert_type(
        raw.reshape(K, META_WORDS, 4), jnp.int32)
    return (m[:, :96].reshape(K, 6, 16), m[:, 96:480].reshape(K, 6, 64),
            m[:, 480:512], m[:, 512])


# ---------------------------------------------------------------------------
# grouped step programs.  The step runs as AT MOST three dispatches —
#   A. _front: residual IQ/IDCT + the Mosaic MC kernels' param pack
#   B. _stage_mc_kernels: the Mosaic MC custom calls, ISOLATED (embedding
#      them in a larger XLA program trips the 2026-08 axon miscompile,
#      tools/repro_mc_fault.py)
#   C. _main: MC combine + intra + deblock + output emit + in-place ring
#      update (donated)
# — because over the axon tunnel every program dispatch costs a host
# round trip that dwarfs the device time of any single stage.
# E264T_SPLIT_STAGES=1 switches back to one-program-per-stage for fault
# bisection on hardware.

def _front_impl(arenas, *, layout, meta_off, has_t8, mcmode, has_b, mbW,
                mbH):
    norm4, norm8 = _stage_norms()
    sm4, sm8, slot_maps, _ = _meta_parts(arenas, meta_off)
    p = _unpack(arenas, layout)
    res = jax.vmap(
        lambda pp, s4, s8: J.residual_frame(pp, s4, s8, norm4, norm8,
                                            has_t8))(p, sm4, sm8)
    if mcmode == "pallas":
        from . import pallas_mc
        return res, pallas_mc.pack_mc_params(p, slot_maps, has_b, mbW,
                                             mbH)
    return res, None


_front = functools.partial(jax.jit, static_argnames=(
    "layout", "meta_off", "has_t8", "mcmode", "has_b", "mbW",
    "mbH"))(_front_impl)


def _main_impl(arenas, res, mcflat, refL, refC, itabs, *, layout,
               meta_off, mbW, mbH, has_b, intra_mode, has_t8, has_pcm,
               emit, crop, mcmode, update, pallas_db):
    res_y, res_cb, res_cr = res
    _, _, slot_maps, ring_slots = _meta_parts(arenas, meta_off)
    p = _unpack(arenas, layout)
    if mcmode == "none":
        K = arenas.shape[0]
        y = jnp.zeros((K, 16 * mbH, 16 * mbW), jnp.int32)
        cb = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        cr = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
    else:
        if mcmode == "xla":
            pred = jax.vmap(
                lambda pp, rl, rc, sm: J.mc_frame(pp, rl, rc, sm, has_b)
            )(p, refL, refC, slot_maps)
        else:                              # Mosaic kernels' flat output
            from . import pallas_mc
            pred = pallas_mc.combine_mc(p, slot_maps, mcflat, has_b)
        pred_y, pred_cb, pred_cr, mask_y, mask_c = pred
        y = jnp.where(mask_y, jnp.clip(pred_y + res_y, 0, 255), 0)
        cb = jnp.where(mask_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
        cr = jnp.where(mask_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    y, cb, cr = _intra_dispatch(y, cb, cr, res_y, res_cb, res_cr, p,
                                itabs, intra_mode, mbW, mbH, has_t8,
                                has_pcm)
    bs_v, bs_h = jax.vmap(J.deblock_bs)(p)
    if pallas_db:
        from .pallas_deblock import deblock_pallas_batch
        y, cb, cr = deblock_pallas_batch(y, cb, cr, p, bs_v, bs_h,
                                         mbW, mbH)
    else:
        y, cb, cr = jax.vmap(
            lambda yy, cc, rr, pp, bv, bh:
            J.deblock_scan(yy, cc, rr, pp, bv, bh, mbW, mbH)
        )(y, cb, cr, p, bs_v, bs_h)
    y8 = y.astype(jnp.uint8)
    cb8 = cb.astype(jnp.uint8)
    cr8 = cr.astype(jnp.uint8)
    aux = _emit_aux(y8, cb8, cr8, emit, crop)
    if update:
        newL, newC = jax.vmap(J.make_ref_planes)(y8, cb8, cr8)
        lanes = jnp.arange(refL.shape[0])
        refL = refL.at[lanes, ring_slots].set(newL)
        refC = refC.at[lanes, ring_slots].set(newC)
    return y8, cb8, cr8, aux, refL, refC


_MAIN_STATICS = ("layout", "meta_off", "mbW", "mbH", "has_b",
                 "intra_mode", "has_t8", "has_pcm", "emit", "crop",
                 "mcmode", "update", "pallas_db")
_main = functools.partial(jax.jit, static_argnames=_MAIN_STATICS,
                          donate_argnums=(3, 4))(_main_impl)


# intermediate fusion granularity (E264T_FUSE=recon): _main split at the
# deblock boundary — _recon (MC combine + intra) and _db_tail (deblock +
# emit + ring update), two dispatches instead of one, for when the axon
# compiler miscompiles the fully fused main at a given geometry.

def _recon_impl(arenas, res, mcflat, itabs, *, layout, meta_off, mbW,
                mbH, has_b, intra_mode, has_t8, has_pcm, mcmode):
    res_y, res_cb, res_cr = res
    _, _, slot_maps, _ = _meta_parts(arenas, meta_off)
    p = _unpack(arenas, layout)
    if mcmode == "none":
        K = arenas.shape[0]
        y = jnp.zeros((K, 16 * mbH, 16 * mbW), jnp.int32)
        cb = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        cr = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
    else:
        if mcmode == "xla":
            raise AssertionError("recon split is a TPU fallback; the "
                                 "XLA MC path uses fused main")
        from . import pallas_mc
        pred = pallas_mc.combine_mc(p, slot_maps, mcflat, has_b)
        pred_y, pred_cb, pred_cr, mask_y, mask_c = pred
        y = jnp.where(mask_y, jnp.clip(pred_y + res_y, 0, 255), 0)
        cb = jnp.where(mask_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
        cr = jnp.where(mask_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    y, cb, cr = _intra_dispatch(y, cb, cr, res_y, res_cb, res_cr, p,
                                itabs, intra_mode, mbW, mbH, has_t8,
                                has_pcm)
    return y, cb, cr


_recon = functools.partial(jax.jit, static_argnames=(
    "layout", "meta_off", "mbW", "mbH", "has_b", "intra_mode", "has_t8",
    "has_pcm", "mcmode"))(_recon_impl)


def _db_tail_impl(y, cb, cr, arenas, refL, refC, *, layout, meta_off,
                  mbW, mbH, emit, crop, update, pallas_db):
    _, _, _, ring_slots = _meta_parts(arenas, meta_off)
    p = _unpack(arenas, layout)
    bs_v, bs_h = jax.vmap(J.deblock_bs)(p)
    if pallas_db:
        from .pallas_deblock import deblock_pallas_batch
        y, cb, cr = deblock_pallas_batch(y, cb, cr, p, bs_v, bs_h,
                                         mbW, mbH)
    else:
        y, cb, cr = jax.vmap(
            lambda yy, cc, rr, pp, bv, bh:
            J.deblock_scan(yy, cc, rr, pp, bv, bh, mbW, mbH)
        )(y, cb, cr, p, bs_v, bs_h)
    y8 = y.astype(jnp.uint8)
    cb8 = cb.astype(jnp.uint8)
    cr8 = cr.astype(jnp.uint8)
    aux = _emit_aux(y8, cb8, cr8, emit, crop)
    if update:
        newL, newC = jax.vmap(J.make_ref_planes)(y8, cb8, cr8)
        lanes = jnp.arange(refL.shape[0])
        refL = refL.at[lanes, ring_slots].set(newL)
        refC = refC.at[lanes, ring_slots].set(newC)
    return y8, cb8, cr8, aux, refL, refC


_db_tail = functools.partial(jax.jit, static_argnames=(
    "layout", "meta_off", "mbW", "mbH", "emit", "crop", "update",
    "pallas_db"), donate_argnums=(4, 5))(_db_tail_impl)


def _mode_flags(layout, refL, mc):
    present = {k for k, _, _, off, _m in layout if off != -1}
    has_t8 = "coef_y8" in present
    has_pcm = "pcm_y" in present
    pallas_mc_on, pallas_db_on = _kernel_choices()
    if not mc:
        mcmode = "none"
    else:
        from . import pallas_mc
        mcmode = ("pallas" if pallas_mc_on and pallas_mc.fits_pallas(refL)
                  else "xla")
    return has_t8, has_pcm, mcmode, pallas_db_on


def decode_batch_step(arenas, refs, itabs, *, layout, meta_off, mbW,
                      mbH, has_b, intra_mode, mc, emit="flat",
                      crop=(0, 0, 0, 0), update=True):
    """One lockstep step over K frames.

    arenas     [K, L] uint8: packed syntax planes (shared `layout`) +
               the meta block at meta_off (pack_meta: sm4 | sm8 |
               slot_map | ring slot) — ONE transfer per step
    refs       (refL [K,S1,4,ph,pw_b] u8, refC [K,S1,phc,2*pwc_pad] u8)
               persistent rings — DONATED and returned updated
    itabs      None or level-compressed intra tables [3, K, Lb, Nb] i32
    mc         False for intra-only steps (step 0)
    intra_mode "levels" | "pallas" | "sheared"
    emit       "flat" (one [K, Y+C+C] u8 output buffer) | "digest"
               ([K, 2] u32 per-frame checksums) | "none"
    crop       (top, right, bottom, left) for the digest

    Returns (y8, cb8, cr8, aux, refL', refC').
    """
    refL, refC = refs
    has_t8, has_pcm, mcmode, pallas_db = _mode_flags(layout, refL, mc)
    # program grouping: "split" is the TPU default — the 2026-08 axon
    # compiler MISCOMPILES the fully fused main program at 1080p (wedges
    # the chip; tools/profile_fuse.py r4 measurements), and split vs
    # recon vs main is perf-neutral because dispatch is async (~0.2
    # ms/frame) and the wall is device execution.  CPU (tests, XLA MC)
    # defaults to the fused main: fewest programs, fastest compiles.
    fuse = os.environ.get("E264T_FUSE") or \
        ("split" if J.use_pallas() else "main")
    if os.environ.get("E264T_SPLIT_STAGES"):
        fuse = "split"
    if fuse == "split":
        return _split_pipeline(arenas, refL, refC, itabs, layout,
                               meta_off, mbW, mbH, has_b, intra_mode,
                               emit, crop, update, has_t8, has_pcm,
                               mcmode, pallas_db)
    res, pk = _front(arenas, layout=layout, meta_off=meta_off,
                     has_t8=has_t8, mcmode=mcmode, has_b=has_b, mbW=mbW,
                     mbH=mbH)
    mcflat = None
    if mcmode == "pallas":
        mcflat = _stage_mc_kernels(*pk, refL, refC, has_b=has_b,
                                   mbW=mbW, mbH=mbH)
    if fuse == "recon" and mcmode != "xla":
        y, cb, cr = _recon(arenas, res, mcflat, itabs, layout=layout,
                           meta_off=meta_off, mbW=mbW, mbH=mbH,
                           has_b=has_b, intra_mode=intra_mode,
                           has_t8=has_t8, has_pcm=has_pcm, mcmode=mcmode)
        return _db_tail(y, cb, cr, arenas, refL, refC, layout=layout,
                        meta_off=meta_off, mbW=mbW, mbH=mbH, emit=emit,
                        crop=crop, update=update, pallas_db=pallas_db)
    return _main(arenas, res, mcflat, refL, refC, itabs, layout=layout,
                 meta_off=meta_off, mbW=mbW, mbH=mbH, has_b=has_b,
                 intra_mode=intra_mode, has_t8=has_t8, has_pcm=has_pcm,
                 emit=emit, crop=crop, mcmode=mcmode, update=update,
                 pallas_db=pallas_db)


@functools.partial(jax.jit, static_argnames=("emit", "crop"))
def _stage_emit(y8, cb8, cr8, *, emit, crop):
    return _emit_aux(y8, cb8, cr8, emit, crop)


@functools.partial(jax.jit, static_argnames=("meta_off",))
def _stage_meta(arenas, *, meta_off):
    return _meta_parts(arenas, meta_off)


def _split_pipeline(arenas, refL, refC, itabs, layout, meta_off, mbW,
                    mbH, has_b, intra_mode, emit, crop, update, has_t8,
                    has_pcm, mcmode, pallas_db):
    """One-program-per-stage fallback (E264T_SPLIT_STAGES=1) for fault
    bisection on hardware; same contract as decode_batch_step."""
    sm4, sm8, slot_maps, ring_slots = _stage_meta(arenas,
                                                  meta_off=meta_off)
    res_y, res_cb, res_cr = _stage_residual(arenas, sm4, sm8,
                                            layout=layout, has_t8=has_t8)
    pred = None
    if mcmode == "pallas":
        pred = _mc_pallas(arenas, res_y, res_cb, res_cr, refL, refC,
                          slot_maps, layout, has_b, mbW, mbH)
    elif mcmode == "xla":
        pred = _stage_mc(arenas, res_y, res_cb, res_cr, refL, refC,
                         slot_maps, layout=layout, has_b=has_b,
                         mbW=mbW, mbH=mbH)
    y, cb, cr = _stage_intra(pred, res_y, res_cb, res_cr, arenas, itabs,
                             layout=layout, mbW=mbW, mbH=mbH,
                             intra_mode=intra_mode, has_t8=has_t8,
                             has_pcm=has_pcm)
    y8, cb8, cr8 = _stage_deblock(y, cb, cr, arenas, layout=layout,
                                  mbW=mbW, mbH=mbH, pallas=pallas_db)
    aux = None
    if emit != "none":
        aux = _stage_emit(y8, cb8, cr8, emit=emit, crop=crop)
    if update:
        refL, refC = refs_update(refL, refC, y8, cb8, cr8, ring_slots)
    return y8, cb8, cr8, aux, refL, refC


@functools.partial(jax.jit, donate_argnums=(0, 1))
def refs_update(refL, refC, y8, cb8, cr8, ring_slots):
    """Fused make_ref_planes + in-place ring write (donated)."""
    newL, newC = jax.vmap(J.make_ref_planes)(y8, cb8, cr8)
    lanes = jnp.arange(refL.shape[0])
    return (refL.at[lanes, ring_slots].set(newL),
            refC.at[lanes, ring_slots].set(newC))


# ---------------------------------------------------------------------------
# multi-chip: the same stages, each wrapped in shard_map over the lane
# axis.  GOP lanes are reference-closed, so no stage needs cross-chip
# collectives — chips scale like the reference's worker threads
# (edge264_headers.c:450) but each carries whole GOPs.  Mosaic kernels
# batch their local lanes on the tile axis, which must stay
# device-local — hence shard_map rather than relying on the SPMD
# partitioner.

@functools.lru_cache(maxsize=None)
def _shmapped(fn, mesh, axis, n_args, donate=(), **static_kw):
    spec = P(axis)
    local = functools.partial(fn.__wrapped__ if hasattr(fn, "__wrapped__")
                              else fn, **static_kw)
    return jax.jit(jax.shard_map(local, mesh=mesh,
                                 in_specs=(spec,) * n_args,
                                 out_specs=spec, check_vma=False),
                   donate_argnums=donate)


def decode_batch_step_sharded(arenas, refs, itabs, *, layout, meta_off,
                              mbW, mbH, has_b, intra_mode, mc, emit,
                              crop, mesh, update=True, axis="gop"):
    """Multi-chip lockstep step (same contract as decode_batch_step):
    lane axis sharded over `mesh`'s `axis`; every grouped program runs
    shard-mapped on each device's LOCAL lanes (GOP lanes are
    reference-closed, so no collectives are needed)."""
    refL, refC = refs
    has_t8, has_pcm, mcmode, pallas_db = _mode_flags(layout, refL, mc)
    res, pk = _shmapped(_front_impl, mesh, axis, 1, layout=layout,
                        meta_off=meta_off, has_t8=has_t8, mcmode=mcmode,
                        has_b=has_b, mbW=mbW, mbH=mbH)(arenas)
    mcflat = None
    if mcmode == "pallas":
        mcflat = _shmapped(_stage_mc_kernels, mesh, axis, 5,
                           has_b=has_b, mbW=mbW, mbH=mbH)(
            *pk, refL, refC)
    return _shmapped(_main_impl, mesh, axis, 6, donate=(3, 4),
                     layout=layout, meta_off=meta_off, mbW=mbW, mbH=mbH,
                     has_b=has_b, intra_mode=intra_mode, has_t8=has_t8,
                     has_pcm=has_pcm, emit=emit, crop=crop,
                     mcmode=mcmode, update=update, pallas_db=pallas_db)(
        arenas, res, mcflat, refL, refC, itabs)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def update_refs(refL, refC, newL, newC, ring_slots):
    """Write each lane's new phase planes into its ring slot, in place
    (donation).  ring_slots [K] int32; lanes whose frame is not a
    reference carry slot index S (the write-off slot).  Lane-parallel, so
    it shards over the lane axis without communication."""
    lanes = jnp.arange(refL.shape[0])
    refL = refL.at[lanes, ring_slots].set(newL)
    refC = refC.at[lanes, ring_slots].set(newC)
    return refL, refC


def grow_ref_rings(refL, refC, S_old, S_new, sharding=None):
    """Double the per-lane ring capacity, preserving slots [0, S_old).
    The old write-off slot S_old holds only non-reference garbage (no
    slot_map entry points at it), so it is recycled as a regular slot;
    the write-off moves to S_new.  Shape change => one recompile of the
    step program, like JaxBackend._ring_reserve's doubling."""
    K = refL.shape[0]
    newL = jnp.zeros((K, S_new + 1) + refL.shape[2:], refL.dtype)
    newC = jnp.zeros((K, S_new + 1) + refC.shape[2:], refC.dtype)
    if sharding is not None:
        newL = jax.device_put(newL, sharding)
        newC = jax.device_put(newC, sharding)
    newL = newL.at[:, :S_old].set(refL[:, :S_old])
    newC = newC.at[:, :S_old].set(refC[:, :S_old])
    return newL, newC


def alloc_ref_rings(K, S, mbW, mbH):
    """Device ring buffers for K lanes x (S + 1 write-off) slots of MC
    half-pel planes (uint8; see jaxdec.make_ref_planes for the layout)."""
    ph, pw_b, phc, pwc_pad = J.mc_band_dims(mbW, mbH)
    refL = jnp.zeros((K, S + 1, 4, ph, pw_b), jnp.uint8)
    refC = jnp.zeros((K, S + 1, phc, 2 * pwc_pad), jnp.uint8)
    return refL, refC

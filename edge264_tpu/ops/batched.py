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
    if intra_mode == "levels":
        return jax.vmap(
            lambda yy, cc, rr, ry, rcb, rcr, pp, t0, t1, t2:
            J.intra_scan(yy, cc, rr, ry, rcb, rcr, pp, (t0, t1, t2))
        )(y, cb, cr, res_y, res_cb, res_cr, p, *itabs)
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


def decode_batch_step(arenas, sm4, sm8, mc_in, itabs, *, layout, mbW,
                      mbH, has_b, make_refs, intra_mode):
    """One lockstep step over K frames, as a pipeline of per-stage
    programs (async dispatch chains them without host syncs).

    arenas   [K, L] uint8 packed syntax planes (shared `layout`)
    sm4/sm8  [K, 6, 16] / [K, 6, 64] per-lane scaling matrices
    mc_in    None (intra-only) or (refL [K,S1,4,ph,pw_b] u8,
             refC [K,S1,phc,2*pwc_pad] u8, slot_maps [K,32] i32)
    itabs    None or level-compressed intra tables stacked per lane
             (mxs [K,Lb,Nb], mys, valid)
    intra_mode  "levels" (vmapped gather scan over itabs),
                "pallas" (lockstep Mosaic wavefront), or
                "sheared" (vmapped scan over anti-diagonal waves)
    make_refs   also return the new frames' MC phase planes

    Returns (y [K,16mbH,16mbW] u8, cb, cr, newL | None, newC | None).
    """
    present = {k for k, _, _, off in layout if off >= 0}
    has_t8 = "coef_y8" in present
    has_pcm = "pcm_y" in present
    pallas_mc_on, pallas_db_on = _kernel_choices()
    if pallas_mc_on and mc_in is not None:
        from . import pallas_mc
        pallas_mc_on = pallas_mc.fits_pallas(mc_in[0])

    res_y, res_cb, res_cr = _stage_residual(arenas, sm4, sm8,
                                            layout=layout, has_t8=has_t8)
    pred = None
    if mc_in is not None:
        refL, refC, slot_maps = mc_in
        if pallas_mc_on:
            pred = _mc_pallas(arenas, res_y, res_cb, res_cr, refL, refC,
                              slot_maps, layout, has_b, mbW, mbH)
        else:
            pred = _stage_mc(arenas, res_y, res_cb, res_cr, refL, refC,
                             slot_maps, layout=layout, has_b=has_b,
                             mbW=mbW, mbH=mbH)
    y, cb, cr = _stage_intra(pred, res_y, res_cb, res_cr, arenas, itabs,
                             layout=layout, mbW=mbW, mbH=mbH,
                             intra_mode=intra_mode, has_t8=has_t8,
                             has_pcm=has_pcm)
    y8, cb8, cr8 = _stage_deblock(y, cb, cr, arenas, layout=layout,
                                  mbW=mbW, mbH=mbH, pallas=pallas_db_on)
    if make_refs:
        newL, newC = _stage_refs(y8, cb8, cr8)
        return y8, cb8, cr8, newL, newC
    return y8, cb8, cr8, None, None


# ---------------------------------------------------------------------------
# multi-chip: the same stages, each wrapped in shard_map over the lane
# axis.  GOP lanes are reference-closed, so no stage needs cross-chip
# collectives — chips scale like the reference's worker threads
# (edge264_headers.c:450) but each carries whole GOPs.  Mosaic kernels
# batch their local lanes on the tile axis, which must stay
# device-local — hence shard_map rather than relying on the SPMD
# partitioner.

@functools.lru_cache(maxsize=None)
def _shmapped(fn, mesh, axis, n_args, **static_kw):
    spec = P(axis)
    local = functools.partial(fn.__wrapped__ if hasattr(fn, "__wrapped__")
                              else fn, **static_kw)
    return jax.jit(jax.shard_map(local, mesh=mesh,
                                 in_specs=(spec,) * n_args,
                                 out_specs=spec, check_vma=False))


def decode_batch_step_sharded(arenas, sm4, sm8, mc_in, itabs, *, layout,
                              mbW, mbH, has_b, make_refs, intra_mode,
                              mesh, axis="gop"):
    """Multi-chip lockstep step: lane axis sharded over `mesh`'s `axis`;
    every stage runs shard-mapped on each device's LOCAL lanes."""
    assert make_refs, "sharded lockstep always maintains the ref rings"
    present = {k for k, _, _, off in layout if off >= 0}
    has_t8 = "coef_y8" in present
    has_pcm = "pcm_y" in present
    pallas_mc_on, pallas_db_on = _kernel_choices()
    if pallas_mc_on and mc_in is not None:
        from . import pallas_mc
        pallas_mc_on = pallas_mc.fits_pallas(mc_in[0])

    res = _shmapped(_stage_residual, mesh, axis, 3, layout=layout,
                    has_t8=has_t8)(arenas, sm4, sm8)
    res_y, res_cb, res_cr = res
    pred = None
    if mc_in is not None:
        refL, refC, slot_maps = mc_in
        if pallas_mc_on:
            flg, pkl, pkc = _shmapped(
                _stage_mc_pack, mesh, axis, 2, layout=layout,
                has_b=has_b, mbW=mbW, mbH=mbH)(arenas, slot_maps)
            flat = _shmapped(
                _stage_mc_kernels, mesh, axis, 5, has_b=has_b,
                mbW=mbW, mbH=mbH)(flg, pkl, pkc, refL, refC)
            pred = _shmapped(
                _stage_mc_combine, mesh, axis, 6, layout=layout,
                has_b=has_b)(arenas, slot_maps, flat, res_y, res_cb,
                             res_cr)
        else:
            pred = _shmapped(_stage_mc, mesh, axis, 7, layout=layout,
                             has_b=has_b, mbW=mbW, mbH=mbH)(
                arenas, res_y, res_cb, res_cr, refL, refC, slot_maps)

    # shard_map in_specs must mirror the pytree structure, so the
    # pred/itabs None-vs-tuple cases are distinct wrappers
    def intra_fn(pred, res_y, res_cb, res_cr, arenas, itabs):
        return _stage_intra.__wrapped__(
            pred, res_y, res_cb, res_cr, arenas, itabs, layout=layout,
            mbW=mbW, mbH=mbH, intra_mode=intra_mode, has_t8=has_t8,
            has_pcm=has_pcm)

    spec = P(axis)
    y, cb, cr = jax.jit(jax.shard_map(
        intra_fn, mesh=mesh, in_specs=(spec,) * 6, out_specs=spec,
        check_vma=False))(pred, res_y, res_cb, res_cr, arenas, itabs)
    y8, cb8, cr8 = _shmapped(_stage_deblock, mesh, axis, 4,
                             layout=layout, mbW=mbW, mbH=mbH,
                             pallas=pallas_db_on)(y, cb, cr, arenas)
    newL, newC = _shmapped(_stage_refs, mesh, axis, 3)(y8, cb8, cr8)
    return y8, cb8, cr8, newL, newC


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

"""Lockstep-batched device pixel path: K independent frames (from K
concurrent GOPs) run every stage together, so the wavefront kernels'
per-wave fixed cost and every dense op's dispatch/layout overhead
amortize over the batch.  This is the TPU analog of the reference's
frame-level task parallelism (edge264_headers.c:1275-1277): chips don't
want more threads, they want wider ops.

The per-lane reference store is a persistent device ring
[K, S+1, ...] (slot S is a write-off lane for non-reference frames);
`update_refs` donates its inputs so slot writes are in-place in HBM.

See parallel/batch.py for the host-side rendezvous that forms batches.
"""

from __future__ import annotations

import functools

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


def _decode_batch_step_impl(arenas, sm4, sm8, mc_in, itabs, *, layout,
                            mbW, mbH, has_b, make_refs, intra_mode):
    """One lockstep step over K frames.

    arenas   [K, L] uint8 packed syntax planes (shared `layout`)
    sm4/sm8  [K, 6, 16] / [K, 6, 64] per-lane scaling matrices
    mc_in    None (intra-only) or (refL [K,S1,4,ph,pw_b] u8,
             refC [K,S1,phc,2*pwc_pad] u8, slot_maps [K,32] i32)
    itabs    None or level-compressed intra tables stacked per lane
             (mxs [K,Lb,Nb], mys, valid)
    intra_mode  "levels" (vmapped gather scan over itabs),
                "pallas" (lockstep Mosaic wavefront), or
                "sheared" (vmapped XLA scan; CPU path)
    make_refs   also return the new frames' MC phase planes

    Returns (y [K,16mbH,16mbW] u8, cb, cr, newL | None, newC | None).
    """
    norm4, norm8 = _stage_norms()
    p = jax.vmap(lambda a: J._unpack_planes(a, layout))(arenas)
    present = {k for k, _, _, off in layout if off >= 0}
    has_t8 = "coef_y8" in present

    res_y, res_cb, res_cr = jax.vmap(
        lambda pp, s4, s8: J.residual_frame(pp, s4, s8, norm4, norm8,
                                            has_t8))(p, sm4, sm8)

    if mc_in is not None:
        refL, refC, slot_maps = mc_in
        from . import pallas_mc
        if J.use_pallas() and pallas_mc.fits_pallas(refL):
            pred = pallas_mc.mc_frame_batch(p, refL, refC, slot_maps,
                                            has_b, mbW, mbH)
        else:
            pred = jax.vmap(
                lambda pp, rl, rc, sm: J.mc_frame(pp, rl, rc, sm, has_b)
            )(p, refL, refC, slot_maps)
        pred_y, pred_cb, pred_cr, mask_y, mask_c = pred
        y = jnp.where(mask_y, jnp.clip(pred_y + res_y, 0, 255), 0)
        cb = jnp.where(mask_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
        cr = jnp.where(mask_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    else:
        K = arenas.shape[0]
        y = jnp.zeros((K, 16 * mbH, 16 * mbW), jnp.int32)
        cb = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)
        cr = jnp.zeros((K, 8 * mbH, 8 * mbW), jnp.int32)

    if intra_mode == "levels":
        y, cb, cr = jax.vmap(
            lambda yy, cc, rr, ry, rcb, rcr, pp, t0, t1, t2:
            J.intra_scan(yy, cc, rr, ry, rcb, rcr, pp, (t0, t1, t2))
        )(y, cb, cr, res_y, res_cb, res_cr, p, *itabs)
    elif intra_mode == "pallas":
        from .pallas_intra import intra_pallas_batch
        y, cb, cr = intra_pallas_batch(y, cb, cr, res_y, res_cb, res_cr,
                                       p, mbW, mbH)
    else:
        y, cb, cr = jax.vmap(
            lambda yy, cc, rr, ry, rcb, rcr, pp:
            J.intra_scan_sheared(yy, cc, rr, ry, rcb, rcr, pp, mbW, mbH,
                                 has_t8, "pcm_y" in present)
        )(y, cb, cr, res_y, res_cb, res_cr, p)

    bs_v, bs_h = jax.vmap(J.deblock_bs)(p)
    if J.use_pallas():
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
    if make_refs:
        newL, newC = jax.vmap(J.make_ref_planes)(y8, cb8, cr8)
        return y8, cb8, cr8, newL, newC
    return y8, cb8, cr8, None, None


decode_batch_step = functools.partial(
    jax.jit,
    static_argnames=("layout", "mbW", "mbH", "has_b", "make_refs",
                     "intra_mode"))(_decode_batch_step_impl)


@functools.partial(
    jax.jit,
    static_argnames=("layout", "mbW", "mbH", "has_b", "make_refs",
                     "intra_mode", "mesh", "axis"))
def decode_batch_step_sharded(arenas, sm4, sm8, mc_in, itabs, *, layout,
                              mbW, mbH, has_b, make_refs, intra_mode,
                              mesh, axis="gop"):
    """Multi-chip lockstep step: the lane axis is sharded over `mesh`'s
    `axis`; shard_map runs the full per-step program on each device's
    LOCAL lanes (the Mosaic lockstep kernels batch the local lanes on
    their tile axis, which must stay device-local).  GOP lanes are
    reference-closed, so the step needs NO cross-chip collectives — chips
    scale like the reference's worker threads (edge264_headers.c:450) but
    each carries whole GOPs.  Cross-host distribution composes on top via
    disjoint GOP ranges per process."""
    assert make_refs, "sharded lockstep always maintains the ref rings"
    spec = P(axis)

    def local(arenas, sm4, sm8, mc_in, itabs):
        return _decode_batch_step_impl(
            arenas, sm4, sm8, mc_in, itabs, layout=layout, mbW=mbW,
            mbH=mbH, has_b=has_b, make_refs=make_refs,
            intra_mode=intra_mode)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec, spec, spec, spec, spec),
                       out_specs=(spec, spec, spec, spec, spec),
                       check_vma=False)
    return fn(arenas, sm4, sm8, mc_in, itabs)


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

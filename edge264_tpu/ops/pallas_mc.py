"""Pallas TPU motion-compensation kernel (§8.4.2.2).

The XLA slice-gather MC path costs ~854 ms/frame at 1080p on v5e (TPU
gathers run element-serial); this kernel replaces it with the dense
per-block dynamic-load shape validated at ~107 ns/cell by
tools/probe_mosaic_caps.py:

- the whole half-pel reference band (all ring slots; see
  jaxdec.make_ref_planes for the layout) is DMAed ONCE per lane from HBM
  into a VMEM scratch, then every block does aligned (16, 256) loads +
  dynamic rolls (Mosaic requires dynamic sublane/lane starts to be
  multiples of 8/128 — align down, rotate by the remainder);
- destinations are iterated in STATIC raster order (dynamic lane stores
  are impossible in Mosaic): an (8, 128) register accumulator per lane
  group, blocks placed by roll + iota mask;
- per-load parameters are packed one int32 each (plane<<24 | y<<12 | x,
  negative = skip) and pipelined as per-row-group SMEM blocks;
- per 8x8 luma block a UNIFORMITY fast path (all four 4x4 quadrants
  share slot+mv) does one 8x8 two-load quarter-pel average instead of
  four 4x4 ones; chroma mirrors the same structure with an in-register
  bilinear on the Cb/Cr-interleaved band.

Weighted-prediction combine stays in XLA (jaxdec._mc_combine): it is
dense elementwise math that XLA fuses for free.

Reference behavior matched: edge264_inter.c:1108-1251 (decode_inter) —
identical clamped-window semantics, expressed as half-pel plane-pair
averages (Table 8-12) instead of the reference's 48-case qpel switch.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import jaxdec as J

I32 = jnp.int32

# flags bits per 8x8 block
_F_USED0, _F_USED1, _F_UNIFORM = 1, 2, 4
# pair fast path: this EVEN block and its right neighbour form one
# uniform 16x8 region (16x16/16x8 partitions, skips) — the even block
# samples all 16 lanes from ONE load pair per list and the odd block's
# used bits are cleared (half the loads of the 8x8-uniform path)
_F_PAIR = 8
_F_PAIRODD = 16          # odd half of a pair: luma skips (chroma keeps
                         # its own per-quad path off the used bits)

# VMEM gate: band scratch + out blocks must fit under the raised
# scoped-VMEM limit (100 MB); beyond this the caller falls back to the
# XLA gather path.
_VMEM_BYTES = int(__import__("os").environ.get(
    "E264T_MC_VMEM_MB", "100")) * 1024 * 1024
_BAND_BYTES_MAX = 88 * 1024 * 1024


def fits_pallas(refL) -> bool:
    S1 = refL.shape[-4] if refL.ndim == 5 else refL.shape[0]
    ph, pw_b = refL.shape[-2], refL.shape[-1]
    return S1 * 4 * ph * pw_b <= _BAND_BYTES_MAX and S1 * 4 < 128


# ---------------------------------------------------------------------------
# Parameter packing (XLA; batched over K)

def _sel_phase(phase, col):
    """_MC_TAB_FLAT[phase, col] without a gather: 16-way one-hot sum."""
    tab = J._MC_TAB_FLAT[:, col]                # [16] numpy
    out = jnp.zeros_like(phase)
    for ph in range(16):
        v = int(tab[ph])
        if v:
            out = out + jnp.where(phase == ph, v, 0)
    return out


# all 6 table columns (p1, ox1, oy1, p2, ox2, oy2; each < 16) packed into
# one nibble-coded int so a phase select is ONE 16-way one-hot instead of
# six (the param pack runs this for 3 arms x 2 lists per step)
_MC_TAB_PACKED = [int(sum(int(v) << (4 * i) for i, v in enumerate(row)))
                  for row in J._MC_TAB_FLAT]


def _sel_phase6(phase):
    out = jnp.zeros_like(phase)
    for ph in range(16):
        v = _MC_TAB_PACKED[ph]
        if v:
            out = out + jnp.where(phase == ph, v, 0)
    return [(out >> (4 * c)) & 15 for c in range(6)]


def _pack_load_luma(sidx, y, x, p1, oy, ox, used):
    pk = ((sidx * 4 + p1) << 24) | ((y + oy) << 12) | (x + ox)
    return jnp.where(used, pk, -1)


def _quads(a):
    """[K, 2R, 2C] -> [K, R, C, 4] quadrant-last (q = qy*2 + qx)."""
    K, H2, W2 = a.shape
    return (a.reshape(K, H2 // 2, 2, W2 // 2, 2)
            .transpose(0, 1, 3, 2, 4).reshape(K, H2 // 2, W2 // 2, 4))


def _pad_blocks(a, BR, BC, fill=-1):
    """Pad block-grid trailing dims [K, br, bc, n] -> [K, BR, BC, n]."""
    K, br, bc, n = a.shape
    return jnp.pad(a, ((0, 0), (0, BR - br), (0, BC - bc), (0, 0)),
                   constant_values=fill)


def pack_mc_params(p, slot_maps, has_b, mbW, mbH):
    """Build (flags [K,BR,1,BC], pk_luma [K,BR,1,BC*16],
    pk_chroma [K,BR//2,1,2*BC*16]) for the kernels.  All int32.

    BR = 2*mbH 8x8-block rows, BC = padded block columns (W_b/8).
    Per block: 2 lists x 4 quadrants x 2 int32; uniform blocks carry
    their joint 8x8 (4x4 chroma) load params in the q0 slots.
    """
    ph, pw_b, phc, pwc_pad = J.mc_band_dims(mbW, mbH)
    W_b = max(-(-16 * mbW // 128) * 128, 128)
    BR, bc = 2 * mbH, 2 * mbW
    BC = W_b // 8
    K = p["refslot"].shape[0]
    BH, BW = 4 * mbH, 4 * mbW
    gx4 = jax.lax.broadcasted_iota(I32, (BH, BW), 1) * 4
    gy4 = jax.lax.broadcasted_iota(I32, (BH, BW), 0) * 4

    flags = jnp.zeros((K, BR, bc), I32)
    pk_l, pk_c = [], []
    uni_all = None
    metas = []
    for l in (0, 1) if has_b else (0,):
        used, sidx, mvx, mvy = jax.vmap(
            lambda pp, sm: J._mc_meta(pp, sm, l),
            in_axes=({k: 0 for k in p}, 0))(p, slot_maps)
        metas.append((used, sidx, mvx, mvy))
        # per-block uniformity of this list: all 4 quadrants share
        # (used, sidx, mvx, mvy)
        qs = [_quads(a.astype(I32)) for a in (used, sidx, mvx, mvy)]
        uni = functools.reduce(
            jnp.logical_and,
            [jnp.all(q == q[..., :1], axis=-1) for q in qs])
        uni_all = uni if uni_all is None else (uni_all & uni)

    # ---- pair (16x8) uniformity: even+odd 8x8 blocks identical in every
    # list (16x16/16x8 partitions, skips) — jointly sampled by the even
    # block from ONE load pair per list
    pair_eq = None
    for (used, sidx, mvx, mvy) in metas:
        eq = functools.reduce(
            jnp.logical_and,
            [a[:, ::2, ::2][:, :, 0::2] == a[:, ::2, ::2][:, :, 1::2]
             for a in (used.astype(I32), sidx.astype(I32), mvx, mvy)])
        pair_eq = eq if pair_eq is None else (pair_eq & eq)
    pairU = uni_all[:, :, 0::2] & uni_all[:, :, 1::2] & pair_eq

    for l, (used, sidx, mvx, mvy) in enumerate(metas):
        # ---- luma per-cell (4x4 quadrant path)
        px = jnp.clip(gx4 + (mvx >> 2) + J.PADL, 0, pw_b - 6)
        py = jnp.clip(gy4 + (mvy >> 2) + J.PADL, 0, ph - 6)
        phase = (mvy & 3) * 4 + (mvx & 3)
        s = _sel_phase6(phase)
        pkA = _pack_load_luma(sidx, py, px, s[0], s[2], s[1], used)
        pkB = _pack_load_luma(sidx, py, px, s[3], s[5], s[4], used)
        qA, qB = _quads(pkA), _quads(pkB)            # [K,BR,bc,4]
        # ---- luma joint 8x8 (uniform arm; quadrant-0 cell params)
        u0, s0 = used[:, ::2, ::2], sidx[:, ::2, ::2]
        mx0, my0 = mvx[:, ::2, ::2], mvy[:, ::2, ::2]
        px8 = jnp.clip(gx4[::2, ::2] + (mx0 >> 2) + J.PADL, 0, pw_b - 10)
        py8 = jnp.clip(gy4[::2, ::2] + (my0 >> 2) + J.PADL, 0, ph - 10)
        ph8 = (my0 & 3) * 4 + (mx0 & 3)
        s8 = _sel_phase6(ph8)
        pk8A = _pack_load_luma(s0, py8, px8, s8[0], s8[2], s8[1], u0)
        pk8B = _pack_load_luma(s0, py8, px8, s8[3], s8[5], s8[4], u0)
        qA = qA.at[..., 0].set(jnp.where(uni_all, pk8A, qA[..., 0]))
        qB = qB.at[..., 0].set(jnp.where(uni_all, pk8B, qB[..., 0]))
        # ---- luma joint 16x8 (pair arm; even-block q0 slots, wider
        # x clip for the 16-lane sample)
        u16, s16 = u0[:, :, 0::2], s0[:, :, 0::2]
        mx16, my16 = mx0[:, :, 0::2], my0[:, :, 0::2]
        px16 = jnp.clip(gx4[::2, ::4] + (mx16 >> 2) + J.PADL, 0,
                        pw_b - 18)
        py16 = jnp.clip(gy4[::2, ::4] + (my16 >> 2) + J.PADL, 0, ph - 10)
        ph16 = (my16 & 3) * 4 + (mx16 & 3)
        s16t = _sel_phase6(ph16)
        pk16A = _pack_load_luma(s16, py16, px16, s16t[0], s16t[2],
                                s16t[1], u16)
        pk16B = _pack_load_luma(s16, py16, px16, s16t[3], s16t[5],
                                s16t[4], u16)
        qA = qA.at[..., 0::2, 0].set(
            jnp.where(pairU, pk16A, qA[..., 0::2, 0]))
        qB = qB.at[..., 0::2, 0].set(
            jnp.where(pairU, pk16B, qB[..., 0::2, 0]))
        pk_l.append(jnp.stack([qA, qB], -1).reshape(K, BR, bc, 8))

        # ---- chroma per-cell (2x2)
        pxc = jnp.clip((gx4 >> 1) + (mvx >> 3) + J.PADC, 0, pwc_pad - 4)
        pyc = jnp.clip((gy4 >> 1) + (mvy >> 3) + J.PADC, 0, phc - 4)
        cA = jnp.where(used, (sidx << 24) | (pyc << 12) | (2 * pxc), -1)
        cB = ((mvy & 7) << 3) | (mvx & 7)
        cqA, cqB = _quads(cA), _quads(cB)
        # ---- chroma joint 4x4 (uniform arm)
        pxc8 = jnp.clip((gx4[::2, ::2] >> 1) + (mx0 >> 3) + J.PADC,
                        0, pwc_pad - 8)
        pyc8 = jnp.clip((gy4[::2, ::2] >> 1) + (my0 >> 3) + J.PADC,
                        0, phc - 8)
        c8A = jnp.where(u0, (s0 << 24) | (pyc8 << 12) | (2 * pxc8), -1)
        cqA = cqA.at[..., 0].set(jnp.where(uni_all, c8A, cqA[..., 0]))
        pk_c.append(jnp.stack([cqA, cqB], -1).reshape(K, BR, bc, 8))

        flags = flags | jnp.where(jnp.any(_quads(used)[..., :], -1),
                                  1 << l, 0)

    flags = flags | jnp.where(uni_all, _F_UNIFORM, 0)
    fE, fO = flags[:, :, 0::2], flags[:, :, 1::2]
    flags = jnp.stack([jnp.where(pairU, fE | _F_PAIR, fE),
                       jnp.where(pairU, fO | _F_PAIRODD, fO)],
                      -1).reshape(flags.shape)
    if not has_b:
        pk_l.append(jnp.full_like(pk_l[0], -1))
        pk_c.append(jnp.full_like(pk_c[0], -1))
    pkl = _pad_blocks(jnp.concatenate(pk_l, -1), BR, BC)
    pkc = _pad_blocks(jnp.concatenate(pk_c, -1), BR, BC)
    flg = _pad_blocks(flags[..., None], BR, BC, fill=0)[..., 0]
    return (flg.reshape(K, BR, 1, BC),
            pkl.reshape(K, BR, 1, BC * 16),
            pkc.reshape(K, BR // 2, 1, 2 * BC * 16))


# ---------------------------------------------------------------------------
# Kernels

def _aligned_load(scratch, pk, ph, pw_b):
    """(16, 256) int32 window with (y, x) rotated to the origin."""
    p = pk >> 24
    y = (pk >> 12) & 0xFFF
    x = pk & 0xFFF
    ya = jnp.minimum((y >> 3) << 3, ph - 16)
    xa = jnp.minimum((x >> 7) << 7, pw_b - 256)
    w = scratch[p, pl.ds(pl.multiple_of(ya, 8), 16),
                pl.ds(pl.multiple_of(xa, 128), 256)].astype(I32)
    w = pltpu.roll(w, ya - y, 0)
    return pltpu.roll(w, xa - x, 1)


def _luma_kernel(flags_ref, pk_ref, band_hbm, out0_ref, out1_ref,
                 scratch, sem, *, ph, pw_b, GROUPS, has_b):
    # ONE lane per pallas_call: a (K, rows) grid with a per-k band DMA
    # into one shared scratch faults the chip for K >= 2 (the runtime
    # overlaps grid steps across k); the caller loops lanes instead
    # (tools/repro_mc_fault.py)
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _dma():
        cp = pltpu.make_async_copy(band_hbm, scratch, sem)
        cp.start()
        cp.wait()

    lane = jax.lax.broadcasted_iota(I32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(I32, (8, 128), 0)
    zero = jnp.zeros((8, 128), I32)

    def group(g, _):
        gbase = g * 16

        def blk(j, accs):
            f = flags_ref[0, 0, gbase + j]
            off = (gbase + j) * 16

            def do_list(l, acc):
                lo = off + l * 8

                def sample(pka, pkb, n, qs, ql):
                    a = _aligned_load(scratch, pka, ph, pw_b)[:8, :128]
                    b = _aligned_load(scratch, pkb, ph, pw_b)[:8, :128]
                    v = pltpu.roll((a + b + 1) >> 1, j * 8 + ql, 1)
                    if qs:
                        v = pltpu.roll(v, qs, 0)
                    sel = ((lane >= j * 8 + ql) & (lane < j * 8 + ql + n)
                           & (sub >= qs) & (sub < qs + n))
                    return sel, v

                def uni(acc):
                    sel, v = sample(pk_ref[0, 0, lo],
                                    pk_ref[0, 0, lo + 1], 8, 0, 0)
                    return jnp.where(sel, v, acc)

                def pair(acc):
                    sel, v = sample(pk_ref[0, 0, lo],
                                    pk_ref[0, 0, lo + 1], 16, 0, 0)
                    return jnp.where(sel, v, acc)

                def quad(acc):
                    for q in range(4):
                        pka = pk_ref[0, 0, lo + 2 * q]
                        pkb = pk_ref[0, 0, lo + 2 * q + 1]

                        def one(acc, pka=pka, pkb=pkb, q=q):
                            sel, v = sample(pka, pkb, 4,
                                            (q >> 1) * 4, (q & 1) * 4)
                            return jnp.where(sel, v, acc)

                        acc = jax.lax.cond(pka >= 0, one, lambda a: a, acc)
                    return acc

                def go(acc):
                    return jax.lax.cond(
                        (f & _F_PAIR) != 0, pair,
                        lambda a: jax.lax.cond((f & _F_UNIFORM) != 0,
                                               uni, quad, a), acc)

                return jax.lax.cond(
                    ((f & (1 << l)) != 0) & ((f & _F_PAIRODD) == 0),
                    go, lambda a: a, acc)

            acc0, acc1 = accs
            acc0 = do_list(0, acc0)
            if has_b:
                acc1 = do_list(1, acc1)
            return acc0, acc1

        acc0, acc1 = jax.lax.fori_loop(0, 16, blk, (zero, zero))
        out0_ref[:, pl.ds(g * 128, 128)] = acc0.astype(jnp.uint8)
        if has_b:
            out1_ref[:, pl.ds(g * 128, 128)] = acc1.astype(jnp.uint8)
        return 0

    jax.lax.fori_loop(0, GROUPS, group, 0)


def _chroma_kernel(flags_ref, pk_ref, band_hbm, out0_ref, out1_ref,
                   scratch, sem, *, phc, pwc2, BC, GROUPS, has_b):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _dma():
        cp = pltpu.make_async_copy(band_hbm, scratch, sem)
        cp.start()
        cp.wait()

    lane = jax.lax.broadcasted_iota(I32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(I32, (8, 128), 0)
    zero = jnp.zeros((8, 128), I32)

    def group(g, _):
        def blk(j, accs):
            jr = j >> 4                      # block row within the pair
            jc = j & 15
            bidx = jr * BC + g * 16 + jc     # lane offset uses jc only
            f = flags_ref[0, 0, bidx]
            off = bidx * 16

            def do_list(l, acc):
                lo = off + l * 8

                def sample(pka, pkb, n, qs, ql):
                    w = _aligned_load(scratch, pka, phc, pwc2)[:8, :128]
                    dx = pkb & 7
                    dy = (pkb >> 3) & 7
                    B = pltpu.roll(w, 126, 1)       # = roll -2 (mod 128)
                    Cc = pltpu.roll(w, 7, 0)        # = roll -1 (mod 8)
                    D = pltpu.roll(B, 7, 0)
                    v = ((8 - dx) * (8 - dy) * w + dx * (8 - dy) * B
                         + (8 - dx) * dy * Cc + dx * dy * D + 32) >> 6
                    v = pltpu.roll(v, jc * 8 + ql, 1)
                    qs_d = jr * 4 + qs
                    v = pltpu.roll(v, qs_d, 0)
                    sel = ((lane >= jc * 8 + ql)
                           & (lane < jc * 8 + ql + 2 * n)
                           & (sub >= qs_d) & (sub < qs_d + n))
                    return sel, v

                def uni(acc):
                    sel, v = sample(pk_ref[0, 0, lo],
                                    pk_ref[0, 0, lo + 1], 4, 0, 0)
                    return jnp.where(sel, v, acc)

                def quad(acc):
                    for q in range(4):
                        pka = pk_ref[0, 0, lo + 2 * q]
                        pkb = pk_ref[0, 0, lo + 2 * q + 1]

                        def one(acc, pka=pka, pkb=pkb, q=q):
                            sel, v = sample(pka, pkb, 2,
                                            (q >> 1) * 2, (q & 1) * 4)
                            return jnp.where(sel, v, acc)

                        acc = jax.lax.cond(pka >= 0, one, lambda a: a, acc)
                    return acc

                def go(acc):
                    return jax.lax.cond((f & _F_UNIFORM) != 0, uni, quad, acc)

                return jax.lax.cond((f & (1 << l)) != 0, go, lambda a: a, acc)

            acc0, acc1 = accs
            acc0 = do_list(0, acc0)
            if has_b:
                acc1 = do_list(1, acc1)
            return acc0, acc1

        acc0, acc1 = jax.lax.fori_loop(0, 32, blk, (zero, zero))
        out0_ref[:, pl.ds(g * 128, 128)] = acc0.astype(jnp.uint8)
        if has_b:
            out1_ref[:, pl.ds(g * 128, 128)] = acc1.astype(jnp.uint8)
        return 0

    jax.lax.fori_loop(0, GROUPS, group, 0)


# ---------------------------------------------------------------------------
# Host-callable entry

def run_mc_kernels(flg, pkl, pkc, refL, refC, has_b, mbW, mbH,
                   interpret=False):
    """The Mosaic luma+chroma kernel calls alone (params from
    pack_mc_params).  Returns flat per-list (y [K,H,W] i32,
    c [K,H/2,W/2,2] i32) pairs.  Kept OUT of larger jit programs: the
    axon compiler (2026-08) miscompiles big combined programs around
    these custom calls (tools/repro_mc_fault.py)."""
    K = refL.shape[0]
    S1 = refL.shape[1]
    ph, pw_b, phc, pwc_pad = J.mc_band_dims(mbW, mbH)
    pwc2 = 2 * pwc_pad
    H, W = 16 * mbH, 16 * mbW
    W_b = max(-(-W // 128) * 128, 128)
    BC = W_b // 8
    GROUPS = W_b // 128
    NRG, NRGc = H // 8, H // 16

    bandL = refL.reshape(K, S1 * 4, ph, pw_b)

    n_out = 2 if has_b else 1
    kern = functools.partial(_luma_kernel, ph=ph, pw_b=pw_b,
                             GROUPS=GROUPS, has_b=has_b)
    if not has_b:
        def kern(fr, pr, br, o0, sc, se, _k=kern):     # noqa: E306
            return _k(fr, pr, br, o0, None, sc, se)
    luma_call = pl.pallas_call(
        kern,
        grid=(NRG,),
        in_specs=[
            pl.BlockSpec((1, 1, BC), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, BC * 16), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((8, W_b), lambda r: (r, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((H, W_b), jnp.uint8)] * n_out,
        scratch_shapes=[pltpu.VMEM((S1 * 4, ph, pw_b), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_BYTES),
        interpret=interpret,
    )
    # one call per lane: a (K, rows) grid with a per-k whole-band DMA
    # into shared VMEM scratch faults on-chip for K >= 2.  The barrier
    # keeps the K-stack from fusing into the kernels' outputs (that
    # fusion tries to hold the whole [K,H,W] batch in scoped VMEM).
    import os as _os
    if _os.environ.get("E264T_MC_SKIP_LUMA"):      # fault bisect knob
        outs = [jnp.zeros((K, H, W_b), jnp.uint8)] * n_out
    else:
        per_lane = [jax.lax.optimization_barrier(
            tuple(luma_call(flg[k], pkl[k], bandL[k]))) for k in range(K)]
        outs = [jnp.stack([pk[i] for pk in per_lane])
                for i in range(n_out)]
    y_lists = [o[:, :, :W].astype(I32) for o in outs]

    flg_c = flg.reshape(K, NRGc, 1, 2 * BC)
    ckern = functools.partial(_chroma_kernel, phc=phc, pwc2=pwc2, BC=BC,
                              GROUPS=GROUPS, has_b=has_b)
    if not has_b:
        def ckern(fr, pr, br, o0, sc, se, _k=ckern):   # noqa: E306
            return _k(fr, pr, br, o0, None, sc, se)
    chroma_call = pl.pallas_call(
        ckern,
        grid=(NRGc,),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * BC), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2 * BC * 16), lambda r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((8, W_b), lambda r: (r, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((H // 2, W_b), jnp.uint8)
                   ] * n_out,
        scratch_shapes=[pltpu.VMEM((S1, phc, pwc2), jnp.uint8),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_BYTES),
        interpret=interpret,
    )
    if _os.environ.get("E264T_MC_SKIP_CHROMA"):    # fault bisect knob
        outs_c = [jnp.zeros((K, H // 2, W_b), jnp.uint8)] * n_out
    else:
        per_lane_c = [jax.lax.optimization_barrier(
            tuple(chroma_call(flg_c[k], pkc[k], refC[k])))
            for k in range(K)]
        outs_c = [jnp.stack([pk[i] for pk in per_lane_c])
                  for i in range(n_out)]
    c_lists = [o[:, :, :W].reshape(K, H // 2, W // 2, 2).astype(I32)
               for o in outs_c]

    flat = []
    for l in range(len(y_lists)):
        flat += [y_lists[l], c_lists[l]]
    return tuple(flat)


def combine_mc(p, slot_maps, flat, has_b):
    """Weighted-prediction combine of the kernels' per-list planes
    (XLA; jaxdec._mc_combine semantics)."""
    def combine(pp, sm, *flat):
        preds = []
        for l in (0, 1) if has_b else (0,):
            used, _, _, _ = J._mc_meta(pp, sm, l)
            yl, ci = flat[2 * l], flat[2 * l + 1]
            preds.append((used, yl, ci[..., 0], ci[..., 1]))
        return J._mc_combine(pp, preds, has_b)

    return jax.vmap(combine, in_axes=({k: 0 for k in p}, 0)
                    + (0,) * len(flat))(p, slot_maps, *flat)


def mc_frame_batch(p, refL, refC, slot_maps, has_b, mbW, mbH,
                   interpret=False):
    """Pallas MC over K lockstep lanes.  p: stacked plane dict [K,...];
    refL [K,S1,4,ph,pw_b] u8; refC [K,S1,phc,2*pwc_pad] u8;
    slot_maps [K,32] i32.  Returns what vmapped jaxdec.mc_frame returns."""
    flg, pkl, pkc = pack_mc_params(p, slot_maps, has_b, mbW, mbH)
    flat = run_mc_kernels(flg, pkl, pkc, refL, refC, has_b, mbW, mbH,
                          interpret=interpret)
    return combine_mc(p, slot_maps, flat, has_b)

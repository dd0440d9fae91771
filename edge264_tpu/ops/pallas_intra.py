"""Pallas TPU kernel for the intra-prediction wavefront.  RETIRED from
the decode paths in round 5: on real 1080p stream content it
intermittently faulted the chip (rounds 2-4; interpret mode is bit-exact
on the same inputs — tests/test_pallas_intra.py — and synthetic-plane
runs on hardware succeed, so the working suspicion is a Mosaic compiler
issue in the scratch-ref wavefront; tools/bisect_pallas_intra.py and
tools/repro_fault.py are the investigation harnesses).  The driver now
uses jaxdec.intra_rounds for sparse-intra steps and the sheared XLA scan
for dense ones, which removed this kernel's performance motivation.  The
kernel and its tests remain as the incident record and as a Mosaic
wavefront reference.

Mirrors ops/pallas_deblock.py's architecture: ONE Mosaic kernel runs the
whole macroblock wavefront (sequential grid over waves w = mb_x + 2*mb_y)
with the rolling neighbour tiles [waves w-1, w-2, w-3] in VMEM scratch.
Per wave it reconstructs all intra macroblocks: 16 quad-order I4x4
substeps, 4 Intra8x8 substeps (with the §8.3.2.2.1 reference lowpass),
I16x16, I_PCM and chroma — exactly the schedule of
jaxdec.intra_scan_sheared, which remains the XLA reference/CPU path.

Directional prediction runs as small matmuls against the probe-derived
weight matrices (jaxdec._mk_dir_w -> MXU), DC/plane modes as explicit
arithmetic.  All mode/flag/residual inputs arrive pre-sheared per wave;
tiles convert between [mbH, ts, ts] blocks and the kernel's working
layouts via the Mosaic-supported sublane-merge + 2D-transpose pattern.

Reference behavior: edge264_intra.c (mode kernels), edge264_slice.c
(decode order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import jaxdec as J
from .jaxdec import (_shear_tiles, _unshear_tiles, _shear_plane,
                     _W4, _W8, _W16, _WCH, _WF8, BLK4_X, BLK4_Y,
                     _I16_HP, _I16_HM, _I16_VP, _I16_VM,
                     _CH_HP, _CH_HM, _CH_VP, _CH_VM,
                     MBF_INTRA, MBF_I16x16, MBF_IPCM, MBF_T8x8)

I32 = jnp.int32
F32 = jnp.float32


def _blk2flat(x, n):
    """[mbH, n, n] -> [mbH, n*n] via sublane-side ops only (lane merges
    are unsupported in Mosaic)."""
    return x.transpose(1, 2, 0).reshape(n * n, x.shape[0]).T


def _flat2blk(v, n):
    """[mbH, n*n] -> [mbH, n, n] (inverse of _blk2flat)."""
    return v.T.reshape(n, n, v.shape[0]).transpose(2, 0, 1)


def _patch(X, r0, nr, c0, nc, new):
    """X[:, r0:r0+nr, c0:c0+nc] = new, via concatenation of non-empty
    pieces only (Mosaic rejects zero-size vectors)."""
    mid_parts = []
    if c0 > 0:
        mid_parts.append(X[:, r0:r0 + nr, :c0])
    mid_parts.append(new)
    if c0 + nc < X.shape[2]:
        mid_parts.append(X[:, r0:r0 + nr, c0 + nc:])
    mid = jnp.concatenate(mid_parts, axis=2) if len(mid_parts) > 1 \
        else mid_parts[0]
    parts = []
    if r0 > 0:
        parts.append(X[:, :r0])
    parts.append(mid)
    if r0 + nr < X.shape[1]:
        parts.append(X[:, r0 + nr:])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def _rev_cols(x):
    """Static-slice column reversal (Mosaic has no `rev` primitive)."""
    n = x.shape[1]
    return jnp.concatenate([x[:, i:i + 1] for i in range(n - 1, -1, -1)],
                           axis=1)


def _dir_mm(nb, Wt, mode, nm, npx):
    """nb [mbH, ntap] i32; Wt [ntap+1, nm*npx] f32 (pre-transposed,
    passed as a kernel input -- Mosaic kernels cannot capture constants);
    mode [mbH, 1] -> [mbH, npx] directional prediction (values exact in
    f32; see jaxdec._mk_dir_w)."""
    mbH = nb.shape[0]
    nb1 = jnp.concatenate([nb, jnp.ones((mbH, 1), I32)],
                          axis=1).astype(F32)
    preds = jax.lax.dot_general(
        nb1, Wt, (((1,), (0,)), ((), ())), preferred_element_type=F32)
    # per-mode select via static lane slices (a [mbH,nm,npx] reshape is
    # a lane-split, which Mosaic does not support)
    sel = jnp.zeros((mbH, npx), F32)
    for m in range(nm):
        mask = (mode == m).astype(F32)
        sel = sel + preds[:, m * npx:(m + 1) * npx] * mask
    return sel.astype(I32) >> 2


def _plane_sum(nb, idx_p, idx_m, n):
    s = 0
    for i in range(n):
        a, b = int(idx_p[i]), int(idx_m[i])
        s = s + (i + 1) * (nb[:, a:a + 1] - nb[:, b:b + 1])
    return s[:, 0]


def _kernel(fl, i16m, chm, i4m, i8m, ry, rcb, rcr, xy, xcb, xcr,
            val, w4, w8, w16, wch, wf8,
            oy, ocb, ocr,
            A, B, C, Ab, Bb, Cb_, Ar, Br, Cr_, Xs, NBs, *, mbHf):
    # mbHf: one frame's mb-row count; the tile axis may hold several
    # lockstep frames back to back (batched GOP decode)
    mbH = fl.shape[1]
    w = pl.program_id(0)

    @pl.when(w == 0)
    def _init():
        for s in (A, B, C, Ab, Bb, Cb_, Ar, Br, Cr_):
            s[...] = jnp.zeros_like(s)

    flags = fl[0]                              # [mbH, 1]
    valv = val[0]
    is_pcm = (flags & MBF_IPCM) > 0
    is_i16 = (flags & MBF_I16x16) > 0
    is_t8 = (flags & MBF_T8x8) > 0
    is_intra = (flags & MBF_INTRA) > 0
    is_i4 = is_intra & ~is_i16 & ~is_pcm & ~is_t8
    is_i8 = is_intra & is_t8 & ~is_pcm

    def shift_my(t):
        """tile sublane shift: out[my] = t[my-1], zero row in at every
        FRAME start (the tile axis holds mbHf-row frames back to back)."""
        r = jnp.roll(t, 1, axis=0)
        sub = lax.broadcasted_iota(I32, t.shape, 0)
        if mbHf != t.shape[0]:
            sub = sub % mbHf
        return jnp.where(sub < 1, 0, r)

    # the working luma tile lives in a VMEM scratch ref (Xs): in-place
    # block stores avoid the value-concat rebuilds whose layout offsets
    # Mosaic's concat lowering rejects.  Neighbour vectors are likewise
    # assembled by column stores into NBs then loaded back -- the
    # store/load round-trip forces canonical layouts.
    Xs[...] = xy[0]
    Av, Bs, Cs, As = A[...], shift_my(B[...]), shift_my(C[...]), \
        shift_my(A[...])
    ryv = ry[0]

    def asm_nb(pieces, total):
        """pieces: list of (col_offset, [mbH, n] value) -> [mbH, total]
        loaded from the NBs scratch."""
        for off, v in pieces:
            NBs[:, off:off + v.shape[1]] = v
        return NBs[...][:, :total]

    def rev_store(l, n):
        """store columns of l reversed at NBs[0:n]."""
        for i in range(n):
            NBs[:, i:i + 1] = l[:, n - 1 - i:n - i]

    # ---- I4x4: 16 quad-order substeps --------------------------------
    for k in range(16):
        bx, by = int(BLK4_X[k]), int(BLK4_Y[k])
        r0, c0 = by * 4, bx * 4
        m = i4m[0][:, by * 4 + bx][:, None]
        mode = m & 15
        aA, aB, aC = (m >> 4) & 1, (m >> 5) & 1, (m >> 6) & 1
        if by == 0:
            t4 = Bs[:, 15, c0:c0 + 4]
            tr = As[:, 15, 0:4] if bx == 3 else Bs[:, 15, c0 + 4:c0 + 8]
        else:
            t4 = Xs[:, r0 - 1, c0:c0 + 4]
            if bx == 3:
                tr = jnp.broadcast_to(t4[:, 3:4], t4.shape)
            else:
                tr = Xs[:, r0 - 1, c0 + 4:c0 + 8]
        l = Av[:, r0:r0 + 4, 15] if bx == 0 else Xs[:, r0:r0 + 4, c0 - 1]
        if bx == 0 and by == 0:
            tl = Cs[:, 15, 15:16]
        elif by == 0:
            tl = Bs[:, 15, c0 - 1:c0]
        elif bx == 0:
            tl = Av[:, r0 - 1, 15:16]
        else:
            tl = Xs[:, r0 - 1, c0 - 1:c0]
        rev_store(l, 4)
        nb = asm_nb([(4, tl), (5, t4),
                     (9, jnp.where(aC > 0, tr, t4[:, 3:4]
                                   * jnp.ones((1, 4), I32)))], 13)
        dirp = _dir_mm(nb, w4[...], mode, 9, 16)
        sA = jnp.sum(l, axis=1, keepdims=True)
        sB = jnp.sum(t4, axis=1, keepdims=True)
        dc = jnp.where((aA & aB) > 0, (sA + sB + 4) >> 3,
                       jnp.where(aA > 0, (sA + 2) >> 2,
                                 jnp.where(aB > 0, (sB + 2) >> 2, 128)))
        pred = jnp.where(mode == 2, dc, dirp)
        res = _blk2flat(ryv[:, r0:r0 + 4, c0:c0 + 4], 4)
        recon = _flat2blk(jnp.clip(pred + res, 0, 255), 4)
        act = (valv & is_i4)[:, :, None] > 0
        Xs[:, r0:r0 + 4, c0:c0 + 4] = jnp.where(
            act, recon, Xs[:, r0:r0 + 4, c0:c0 + 4])

    # ---- Intra8x8: 4 quad-order substeps -----------------------------
    for b in range(4):
        bx8, by8 = b & 1, b >> 1
        r0, c0 = by8 * 8, bx8 * 8
        mm = i8m[0][:, by8 * 2 + bx8][:, None]
        mode = mm & 15
        aA, aB = (mm >> 4) & 1, (mm >> 5) & 1
        aC, aD = (mm >> 6) & 1, (mm >> 7) & 1
        if by8 == 0:
            t8v = Bs[:, 15, c0:c0 + 8]
            tr = As[:, 15, 0:8] if bx8 == 1 else Bs[:, 15, 8:16]
        else:
            t8v = Xs[:, 7, c0:c0 + 8]
            if bx8 == 1:
                tr = jnp.broadcast_to(t8v[:, 7:8], t8v.shape)
            else:
                tr = Xs[:, 7, 8:16]
        l = Av[:, r0:r0 + 8, 15] if bx8 == 0 else Xs[:, r0:r0 + 8, 7]
        if bx8 == 0 and by8 == 0:
            tl = Cs[:, 15, 15:16]
        elif by8 == 0:
            tl = Bs[:, 15, 7:8]
        elif bx8 == 0:
            tl = Av[:, 7, 15:16]
        else:
            tl = Xs[:, 7, 7:8]
        rev_store(l, 8)
        nb = asm_nb([(8, tl), (9, t8v),
                     (17, jnp.where(aC > 0, tr, t8v[:, 7:8]
                                    * jnp.ones((1, 8), I32)))], 25)
        NBs[:, 25:26] = jnp.ones((mbH, 1), I32)
        nb1 = NBs[...][:, :26].astype(F32)
        nbf = jax.lax.dot_general(
            nb1, wf8[...], (((1,), (0,)), ((), ())),
            preferred_element_type=F32).astype(I32) >> 2
        l0, t0, t1, l1 = nb[:, 7:8], nb[:, 9:10], nb[:, 10:11], nb[:, 6:7]
        tl0 = nb[:, 8:9]
        t0f = jnp.where(aD > 0, (tl0 + 2 * t0 + t1 + 2) >> 2,
                        (3 * t0 + t1 + 2) >> 2)
        l0f = jnp.where(aD > 0, (tl0 + 2 * l0 + l1 + 2) >> 2,
                        (3 * l0 + l1 + 2) >> 2)
        tlf = jnp.where(
            aD == 0, tl0,
            jnp.where((aA & aB) > 0, (t0 + 2 * tl0 + l0 + 2) >> 2,
                      jnp.where(aB > 0, (3 * tl0 + t0 + 2) >> 2,
                                jnp.where(aA > 0,
                                          (3 * tl0 + l0 + 2) >> 2,
                                          tl0))))
        lane25 = lax.broadcasted_iota(I32, (1, 25), 1)
        patch = jnp.where(lane25 == 7, l0f,
                          jnp.where(lane25 == 8, tlf, t0f))
        nbf = jnp.where((lane25 >= 7) & (lane25 <= 9), patch, nbf)
        nbf = jnp.where((aB > 0) | (lane25 < 9), nbf, nb)
        nbf = jnp.where((aA > 0) | (lane25 >= 8), nbf, nb)
        dirp = _dir_mm(nbf, w8[...], mode, 9, 64)
        st = jnp.where(aB[:, 0] > 0, nbf[:, 9:17].sum(1), 0)[:, None]
        sl = jnp.where(aA[:, 0] > 0, nbf[:, :8].sum(1), 0)[:, None]
        dc = jnp.where((aA & aB) > 0, (st + sl + 8) >> 4,
                       jnp.where(aA > 0, (sl + 4) >> 3,
                                 jnp.where(aB > 0, (st + 4) >> 3, 128)))
        pred = jnp.where(mode == 2, dc, dirp)
        res = _blk2flat(ryv[:, r0:r0 + 8, c0:c0 + 8], 8)
        recon = _flat2blk(jnp.clip(pred + res, 0, 255), 8)
        act = (valv & is_i8)[:, :, None] > 0
        Xs[:, r0:r0 + 8, c0:c0 + 8] = jnp.where(
            act, recon, Xs[:, r0:r0 + 8, c0:c0 + 8])

    # ---- I16x16 ------------------------------------------------------
    m = i16m[0]
    mode = m & 3
    aA, aB = (m >> 4) & 1, (m >> 5) & 1
    t = jnp.where(aB > 0, Bs[:, 15, :], 0)
    l = jnp.where(aA > 0, Av[:, :, 15], 0)
    tl = Cs[:, 15, 15:16]
    rev_store(l, 16)
    nb = asm_nb([(16, tl), (17, t)], 33)
    dirp = _dir_mm(nb, w16[...], jnp.clip(mode, 0, 1), 2, 256)
    st = t.sum(1)[:, None]
    sl = l.sum(1)[:, None]
    dc = jnp.where((aA & aB) > 0, (st + sl + 16) >> 5,
                   jnp.where(aA > 0, (sl + 8) >> 4,
                             jnp.where(aB > 0, (st + 8) >> 4, 128)))
    hs = _plane_sum(nb, _I16_HP, _I16_HM, 8)
    vs = _plane_sum(nb, _I16_VP, _I16_VM, 8)
    a_ = 16 * (nb[:, 0] + nb[:, 32])
    b_ = (5 * hs + 32) >> 6
    c_ = (5 * vs + 32) >> 6
    pix = lax.broadcasted_iota(I32, (1, 256), 1)
    xx = pix % 16
    yy = pix // 16
    plane = jnp.clip(
        (a_[:, None] + b_[:, None] * (xx - 7)
         + c_[:, None] * (yy - 7) + 16) >> 5, 0, 255)
    pred = jnp.where(mode == 2, dc,
                     jnp.where(mode == 3, plane, dirp))
    recon = _flat2blk(jnp.clip(pred + _blk2flat(ryv, 16), 0, 255), 16)
    X = Xs[...]
    X = jnp.where(((valv & is_i16) > 0)[:, :, None], recon, X)
    oy[0] = X
    C[...] = B[...]
    B[...] = A[...]
    A[...] = X

    # ---- chroma ------------------------------------------------------
    m = chm[0]
    mode = m & 3
    aA, aB = (m >> 4) & 1, (m >> 5) & 1
    pix8 = lax.broadcasted_iota(I32, (1, 64), 1)
    xx8 = pix8 % 8
    yy8 = pix8 // 8
    for Ac, Bc, Cc, xc, rc, oc in (
            (Ab, Bb, Cb_, xcb, rcb, ocb),
            (Ar, Br, Cr_, xcr, rcr, ocr)):
        Acv, Bcs, Ccs = Ac[...], shift_my(Bc[...]), shift_my(Cc[...])
        img = xc[0]
        t = jnp.where(aB > 0, Bcs[:, 7, :], 0)
        l = jnp.where(aA > 0, Acv[:, :, 7], 0)
        tl = Ccs[:, 7, 7:8]
        rev_store(l, 8)
        nb = asm_nb([(8, tl), (9, t)], 17)
        dirp = _dir_mm(nb, wch[...], jnp.clip(mode - 1, 0, 1), 2, 64)
        ts0 = t[:, :4].sum(1)[:, None]
        ts1 = t[:, 4:].sum(1)[:, None]
        ls0 = l[:, :4].sum(1)[:, None]
        ls1 = l[:, 4:].sum(1)[:, None]
        both, onlyA, onlyB = (aA & aB) > 0, aA > 0, aB > 0
        q00 = jnp.where(both, (ts0 + ls0 + 4) >> 3,
                        jnp.where(onlyA, (ls0 + 2) >> 2,
                                  jnp.where(onlyB, (ts0 + 2) >> 2, 128)))
        q01 = jnp.where(onlyB, (ts1 + 2) >> 2,
                        jnp.where(onlyA, (ls0 + 2) >> 2, 128))
        q10 = jnp.where(onlyA, (ls1 + 2) >> 2,
                        jnp.where(onlyB, (ts0 + 2) >> 2, 128))
        q11 = jnp.where(both, (ts1 + ls1 + 4) >> 3,
                        jnp.where(onlyA, (ls1 + 2) >> 2,
                                  jnp.where(onlyB, (ts1 + 2) >> 2, 128)))
        right = xx8 >= 4
        bottom = yy8 >= 4
        dcmap = jnp.where(bottom, jnp.where(right, q11, q10),
                          jnp.where(right, q01, q00))
        hs = _plane_sum(nb, _CH_HP, _CH_HM, 4)
        vs = _plane_sum(nb, _CH_VP, _CH_VM, 4)
        a_ = 16 * (nb[:, 0] + nb[:, 16])
        b_ = (34 * hs + 32) >> 6
        c_ = (34 * vs + 32) >> 6
        plane = jnp.clip(
            (a_[:, None] + b_[:, None] * (xx8 - 3)
             + c_[:, None] * (yy8 - 3) + 16) >> 5, 0, 255)
        pred = jnp.where(mode == 0, dcmap,
                         jnp.where(mode == 3, plane, dirp))
        recon = _flat2blk(jnp.clip(pred + _blk2flat(rc[0], 8), 0,
                                   255), 8)
        img = jnp.where(((valv & is_intra & ~is_pcm) > 0)[:, :, None],
                        recon, img)
        oc[0] = img
        Cc[...] = Bc[...]
        Bc[...] = Ac[...]
        Ac[...] = img


def intra_pallas(y, cb, cr, res_y, res_cb, res_cr, p, mbW, mbH,
                 interpret=False):
    """Drop-in for jaxdec.intra_scan_sheared as a single Mosaic kernel."""
    ys, cbs, crs = intra_pallas_batch(
        y[None], cb[None], cr[None], res_y[None], res_cb[None],
        res_cr[None], {k: v[None] for k, v in p.items()}, mbW, mbH,
        interpret=interpret)
    return ys[0], cbs[0], crs[0]


def intra_pallas_batch(ys, cbs, crs, res_ys, res_cbs, res_crs, p, mbW,
                       mbH, interpret=False):
    """Intra-reconstruct K independent same-geometry frames in LOCKSTEP:
    one Mosaic kernel whose wave steps carry all K frames' diagonal tiles
    back to back on the tile axis (amortizes the per-wave fixed cost;
    see deblock_pallas_batch).  ys [K,16mbH,16mbW] int32, p stacked."""
    K = ys.shape[0]
    NW = mbW + 2 * mbH - 2
    valid = np.zeros((NW, mbH), np.int32)
    for s in range(NW):
        mx = s - 2 * np.arange(mbH)
        valid[s] = ((0 <= mx) & (mx < mbW)).astype(np.int32)
    valid = np.tile(valid, (1, K))

    # I_PCM pixels are terminal content: blend them into the input frame
    # up front (the kernel preserves non-i4/i8/i16 tiles, so later mbs'
    # neighbour reads see them) -- keeps 3 plane streams out of VMEM
    pcm_mb = (p["mb_flags"] & MBF_IPCM) > 0
    m16 = jnp.repeat(jnp.repeat(pcm_mb, 16, 1), 16, 2)
    m8 = jnp.repeat(jnp.repeat(pcm_mb, 8, 1), 8, 2)
    ys = jnp.where(m16, p["pcm_y"], ys)
    cbs = jnp.where(m8, p["pcm_c"][:, 0], cbs)
    crs = jnp.where(m8, p["pcm_c"][:, 1], crs)

    cat = lambda parts, ax=1: (jnp.concatenate(parts, axis=ax)
                               if K > 1 else parts[0])
    shp = lambda pk: cat([_shear_plane(p[pk][k], mbW, mbH, extra=0)
                          for k in range(K)])
    sht = lambda a, ts: cat([_shear_tiles(a[k], mbW, mbH, ts, extra=0)
                             for k in range(K)])
    ins = [
        # mb-level planes carry a trailing singleton so their BlockSpec
        # satisfies Mosaic's (8,128)-divisible-or-full rule
        shp("mb_flags")[..., None],
        shp("i16_modes")[..., None],
        shp("ch_modes")[..., None],
        # mode tiles flatten to [mbH, by*4+bx] / [mbH, by8*2+bx8]
        cat([_shear_tiles(p["i4_modes"][k], mbW, mbH, 4,
                          extra=0).reshape(NW, mbH, 16)
             for k in range(K)]),
        cat([_shear_tiles(p["i8_modes"][k], mbW, mbH, 2,
                          extra=0).reshape(NW, mbH, 4)
             for k in range(K)]),
        sht(res_ys, 16), sht(res_cbs, 8), sht(res_crs, 8),
        sht(ys, 16), sht(cbs, 8), sht(crs, 8),
        jnp.asarray(valid)[..., None],
    ]
    wts = [jnp.asarray(W.T.copy(), jnp.float32)
           for W in (_W4, _W8, _W16, _WCH, _WF8)]

    def spec(shape):
        blk = (1,) + tuple(shape[1:])
        nd = len(shape)
        return pl.BlockSpec(blk, lambda w, nd=nd: (w,) + (0,) * (nd - 1))

    KH = K * mbH
    out_shapes = (jax.ShapeDtypeStruct((NW, KH, 16, 16), I32),
                  jax.ShapeDtypeStruct((NW, KH, 8, 8), I32),
                  jax.ShapeDtypeStruct((NW, KH, 8, 8), I32))
    scratch = [pltpu.VMEM((KH, 16, 16), I32)] * 3 + \
        [pltpu.VMEM((KH, 8, 8), I32)] * 6 + \
        [pltpu.VMEM((KH, 16, 16), I32), pltpu.VMEM((KH, 40), I32)]
    wspec = [pl.BlockSpec(wt.shape, lambda w: (0, 0)) for wt in wts]
    ey, ecb, ecr = pl.pallas_call(
        functools.partial(_kernel, mbHf=mbH),
        grid=(NW,),
        in_specs=[spec(a.shape) for a in ins] + wspec,
        out_specs=tuple(spec(s.shape) for s in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the unrolled substeps' temporaries exceed the default 16M
            # scoped-vmem budget for K > 1 (v5e has 128M physical)
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins, *wts)
    y = jnp.stack([_unshear_tiles(ey[:, k * mbH:(k + 1) * mbH], mbW, mbH,
                                  16, shift=0) for k in range(K)])
    cb = jnp.stack([_unshear_tiles(ecb[:, k * mbH:(k + 1) * mbH], mbW,
                                   mbH, 8, shift=0) for k in range(K)])
    cr = jnp.stack([_unshear_tiles(ecr[:, k * mbH:(k + 1) * mbH], mbW,
                                   mbH, 8, shift=0) for k in range(K)])
    return y, cb, cr

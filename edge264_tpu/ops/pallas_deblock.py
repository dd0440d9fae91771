"""Pallas TPU kernel for the deblocking wavefront.

The XLA sheared scan (jaxdec.deblock_scan) spends ~150us per wave on
kernel-launch overhead alone; at 254 waves for 1080p that is ~38ms.  This
module runs the ENTIRE wavefront as ONE Mosaic kernel: a sequential grid
over waves, with the rolling left/top neighbour tiles carried in VMEM
scratch, so per-wave cost drops to the actual vector math (~10us).

Layout: a wave's macroblock tiles are stored with the SAMPLE index on
sublanes and (mb, line) on lanes — a vertical edge's input is then the
static sublane slice S[4e:4e+8] of a [20, mbH*16] working tile, and every
filter op runs on [mbH*16]-lane vectors (8.5 VREGs at 1080p).  All
per-edge parameters (bS, alpha, beta, tc0, activity) are precomputed
batched OUTSIDE the kernel; the kernel is pure filtering.

Spec order (§8.7: per mb raster, V edges then H edges) maps to the wave
scan exactly as in jaxdec.deblock_scan: at wave w the kernel filters the
tiles of wave w (V then H), writes the V-edge-0 p-side halo into wave
w-1's tiles (scratch A) and the H-edge-0 p-side halo into wave w-2's
(scratch B), and emits B, whose last writer is this step.

Reference behavior: edge264_deblock.c (deblock_mb edge schedule).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deblock_oracle import ALPHA as _ALPHA, BETA as _BETA, TC0 as _TC0
from .jaxdec import _shear_tiles, _unshear_tiles

I32 = jnp.int32
DBF_LEFT, DBF_TOP, DBF_INNER = 1, 2, 4
MBF_T8x8 = 8


# ---------------------------------------------------------------------------
# Host-side (XLA) preparation: shear + per-edge parameter planes


def _shear_cm(img, mbW, mbH, ts, extra):
    """Dense [ts*mbH, ts*mbW] -> column-major sheared [T, ts, mbH*ts]:
    out[w][c][my*ts + r] = img[my*ts + r, (w-2my)*ts + c]."""
    T = mbW + 2 * mbH - 2 + extra
    strips = []
    for my in range(mbH):
        s = img[my * ts:(my + 1) * ts, :]
        off = 2 * my * ts
        strips.append(jnp.pad(s, ((0, 0), (off, (T - mbW) * ts - off))))
    sh = jnp.stack(strips)                        # [mbH, ts(r), T*ts]
    sh = sh.reshape(mbH, ts, T, ts)               # [my, r, w, c]
    return sh.transpose(2, 3, 0, 1).reshape(T, ts, mbH * ts)


def _unshear_rm(t, mbW, mbH, ts, shift):
    """Row-major emitted tiles [T, ts, mbH*ts] (out[w][r][my*ts+c]) ->
    dense [ts*mbH, ts*mbW]; tile (mx,my) was emitted at w=mx+2my+shift."""
    T = t.shape[0]
    a = t.reshape(T, ts, mbH, ts).transpose(2, 1, 0, 3)   # [my, r, w, c]
    a = a.reshape(mbH, ts, T * ts)
    rows = []
    for my in range(mbH):
        off = (2 * my + shift) * ts
        rows.append(a[my, :, off:off + mbW * ts])
    return jnp.concatenate(rows, axis=0)


def _shear_mb(pl_, mbW, mbH, extra):
    """[mbH, mbW, ...] -> [T, mbH, ...] (one gather; the per-row pad
    version emitted O(mbH) HLO ops and blew up XLA compile time)."""
    T = mbW + 2 * mbH - 2 + extra
    w = jnp.arange(T)[:, None]
    my = jnp.arange(mbH)[None, :]
    mx = w - 2 * my
    valid = (mx >= 0) & (mx < mbW)
    out = pl_[my, jnp.clip(mx, 0, mbW - 1)]
    vshape = valid.shape + (1,) * (out.ndim - 2)
    return jnp.where(valid.reshape(vshape), out, 0)


def _edge_params(p, bs_v, bs_h, mbW, mbH, extra=2):
    """Precompute per-(wave, edge, line) filter parameters, batched.

    Returns dict of arrays with leading dim T: luma bs/alpha/beta/tc0/act
    for V and H ([T,4,L]) and chroma equivalents ([T,2,Lc] / per-comp
    [T,2,2,Lc]), plus the tc0 select done via 3-row lookup (no big
    gathers)."""
    T = mbW + 2 * mbH - 2 + extra
    L = mbH * 16
    Lc = mbH * 8
    alpha_t = jnp.asarray(_ALPHA)
    beta_t = jnp.asarray(_BETA)
    tc0_t = jnp.asarray(_TC0)

    qp = _shear_mb(p["qp"], mbW, mbH, extra)             # [T,mbH,4]
    qpl = jnp.concatenate([jnp.zeros_like(qp[:1]), qp[:-1]], 0)
    qpt = jnp.concatenate([jnp.zeros_like(qp[:2]), qp[:-2]], 0)
    qpt = jnp.concatenate([jnp.zeros_like(qpt[:, :1]), qpt[:, :-1]], 1)
    ab = _shear_mb(p["deblock_ab"], mbW, mbH, extra)     # [T,mbH,2]
    db = _shear_mb(p["deblock"], mbW, mbH, extra)        # [T,mbH]
    t8 = _shear_mb((p["mb_flags"] & MBF_T8x8) > 0, mbW, mbH, extra)
    valid = np.zeros((T, mbH), bool)
    for s in range(T):
        mx = s - 2 * np.arange(mbH)
        valid[s] = (0 <= mx) & (mx < mbW)
    val = jnp.asarray(valid)
    offA, offB = ab[..., 0], ab[..., 1]

    def params(comp, qp_prev_edge0, bs_tile, nseg, db_edge0):
        """-> (bs, alpha, beta, tc0, act) each [T, nedge, mbH*nseg]."""
        nedge = bs_tile.shape[2]
        qpq = qp[..., comp]
        acts, als, bes, tcs, bss = [], [], [], [], []
        for e in range(nedge):
            qpp = qp_prev_edge0[..., comp] if e == 0 else qpq
            ia = jnp.clip(((qpp + qpq + 1) >> 1) + offA, 0, 51)
            ib = jnp.clip(((qpp + qpq + 1) >> 1) + offB, 0, 51)
            al = alpha_t[ia]
            be = beta_t[ib]
            t3 = tc0_t[:, ia]                            # [3,T,mbH]
            if e == 0:
                act = val & ((db & db_edge0) > 0)
            else:
                act = val & ((db & DBF_INNER) > 0)
                if nseg >= 16 and e % 2:
                    act = act & ~t8
            bs = bs_tile[:, :, e, :]                     # [T,mbH,4seg]
            rep = nseg // 4
            bs = jnp.repeat(bs, rep, axis=2)             # [T,mbH,nseg]
            tc0 = jnp.where(
                bs == 0, 0,
                jnp.where(bs == 1, t3[0][..., None],
                          jnp.where(bs == 2, t3[1][..., None],
                                    t3[2][..., None])))
            ex = lambda a: jnp.repeat(a[..., None], nseg, -1)
            acts.append(ex(act.astype(I32)))
            als.append(ex(al))
            bes.append(ex(be))
            tcs.append(tc0)
            bss.append(bs)
        pack = lambda xs: jnp.stack(xs, 1).reshape(T, nedge,
                                                   mbH * nseg)
        return (pack(bss), pack(als), pack(bes), pack(tcs), pack(acts))

    # luma: bs tiles [T,mbH,4e,4seg]
    # bs_v[4my+seg, 4mx+e] -> [my, mx, e, seg] -> sheared [T,mbH,e,seg]
    bsv_sh = _shear_mb(bs_v.reshape(mbH, 4, mbW, 4)
                       .transpose(0, 2, 3, 1), mbW, mbH, extra)
    bsh_sh = _shear_mb(bs_h.reshape(mbH, 4, mbW, 4)
                       .transpose(0, 2, 1, 3), mbW, mbH, extra)
    # bs_h[4my+e, 4mx+seg] -> tile already [e, seg]

    # pack each direction's parameters into ONE tensor: per-wave DMA
    # stream count dominates the kernel's per-step cost
    pv = jnp.concatenate(params(0, qpl, bsv_sh, 16, DBF_LEFT),
                         axis=1)                          # [T, 20, L]
    ph = jnp.concatenate(params(0, qpt, bsh_sh, 16, DBF_TOP), axis=1)
    # chroma: edges {0,2}; seg8 = line>>1
    bsv_c = bsv_sh[:, :, ::2, :]                          # [T,mbH,2e,4seg]
    bsh_c = bsh_sh[:, :, ::2, :]
    cb_v = params(1, qpl, bsv_c, 8, DBF_LEFT)
    cr_v = params(2, qpl, bsv_c, 8, DBF_LEFT)
    cb_h = params(1, qpt, bsh_c, 8, DBF_TOP)
    cr_h = params(2, qpt, bsh_c, 8, DBF_TOP)
    pcv = jnp.concatenate(cb_v + cr_v, axis=1)            # [T, 20, Lc]
    pch = jnp.concatenate(cb_h + cr_h, axis=1)
    return pv, ph, pcv, pch


# ---------------------------------------------------------------------------
# Kernel


def _filt_luma(S, al, be, bs, tc0, act):
    """§8.7.2.3/.4; S = list of 8 [L] rows p3..p0,q0..q3, params [L].
    Returns the 6 middle rows' new values as a list (row-list form keeps
    Mosaic free of sublane-shifted concats, which each cost a relayout)."""
    p3, p2, p1, p0 = S[0], S[1], S[2], S[3]
    q0, q1, q2, q3 = S[4], S[5], S[6], S[7]
    filt = (act > 0) & (bs > 0) & (jnp.abs(p0 - q0) < al) & \
        (jnp.abs(p1 - p0) < be) & (jnp.abs(q1 - q0) < be)
    ap = jnp.abs(p2 - p0) < be
    aq = jnp.abs(q2 - q0) < be
    lim = (al >> 2) + 2
    sp = ap & (jnp.abs(p0 - q0) < lim)
    sq = aq & (jnp.abs(p0 - q0) < lim)
    sp0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = jnp.where(sq, (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = jnp.where(sq, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)
    tc = tc0 + ap + aq
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    wp0 = jnp.clip(p0 + delta, 0, 255)
    wq0 = jnp.clip(q0 - delta, 0, 255)
    avg = (p0 + q0 + 1) >> 1
    wp1 = jnp.where(ap, p1 + jnp.clip((p2 + avg - 2 * p1) >> 1, -tc0,
                                      tc0), p1)
    wq1 = jnp.where(aq, q1 + jnp.clip((q2 + avg - 2 * q1) >> 1, -tc0,
                                      tc0), q1)
    s4 = bs == 4
    out = [jnp.where(s4, sp2, p2), jnp.where(s4, sp1, wp1),
           jnp.where(s4, sp0, wp0), jnp.where(s4, sq0, wq0),
           jnp.where(s4, sq1, wq1), jnp.where(s4, sq2, q2)]
    return [jnp.where(filt, o, s) for o, s in zip(out, S[1:7])]


def _filt_chroma(S, al, be, bs, tc0, act):
    """S = list of 4 [Lc] rows p1 p0 q0 q1; returns 2 new middle rows."""
    p1, p0, q0, q1 = S[0], S[1], S[2], S[3]
    filt = (act > 0) & (bs > 0) & (jnp.abs(p0 - q0) < al) & \
        (jnp.abs(p1 - p0) < be) & (jnp.abs(q1 - q0) < be)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    s4 = bs == 4
    out = [jnp.where(s4, sp0, jnp.clip(p0 + delta, 0, 255)),
           jnp.where(s4, sq0, jnp.clip(q0 - delta, 0, 255))]
    return [jnp.where(filt, o, s) for o, s in zip(out, S[1:3])]


def _t_cm_rm(x, n, mbH):
    """[n, mbH*n] col-major tile block -> row-major (swap r<->c inside
    each mb tile).  Formulated as 2D transposes + a sublane-dim swap,
    the only shape-change combination Mosaic's layout inference accepts
    (a direct lane-dim split reshape is unsupported)."""
    return (x.T.reshape(mbH, n, n).transpose(0, 2, 1)
            .reshape(mbH * n, n).T)


def _shift_top(x, ts, L, Lf=None):
    """[1, L] lane shift by +ts with zero fill: out[l] = x[l-ts] (the
    top-neighbour view Bts[my] = B[my-1]).  When the lane axis holds
    several frames' tiles back to back (batched lockstep decode), Lf is
    one frame's extent and the zero fill applies at every frame start."""
    r = jnp.roll(x, ts, 1)
    lane = lax.broadcasted_iota(I32, (1, L), 1)
    if Lf is not None and Lf != L:
        lane = lane % Lf
    return jnp.where(lane < ts, 0, r)


def _unshift_merge(bts_row, orig_row, ts, L, Lf=None):
    """Inverse lane shift of an updated [1, L] Bts row, keeping the last
    mb's original values (it has no below-neighbour in this wave)."""
    r = jnp.roll(bts_row, -ts, 1)
    lane = lax.broadcasted_iota(I32, (1, L), 1)
    if Lf is not None and Lf != L:
        lane = lane % Lf
        L = Lf
    return jnp.where(lane >= L - ts, orig_row, r)


def _kernel(xy, xcb, xcr, pv, ph, pcv, pch,
            oy, ocb, ocr,
            A, Bm, Acb, Bcb, Acr, Bcr, *, mbHf):
    # mbHf: one frame's mb-row count; the tile axis may hold several
    # lockstep frames back to back (batched GOP decode)
    # packed params: luma [1,20,L] = (bs, alpha, beta, tc0, act) x 4
    # edges; chroma [1,20,Lc] = cb(bs,al,be,tc,act)x2e + cr(...)x2e
    w = pl.program_id(0)
    L = xy.shape[1] * 16          # [1, mbH, 16, 16] tile blocks
    Lc = xcb.shape[1] * 8
    # all per-line data is kept as [1, L] 2-D rows: 1-D vectors with
    # sublane offsets crash Mosaic's layout inference
    PV, PH, PCV, PCH = pv[0], ph[0], pcv[0], pch[0]
    lum_v = lambda kind, e: PV[4 * kind + e:4 * kind + e + 1]
    lum_h = lambda kind, e: PH[4 * kind + e:4 * kind + e + 1]
    chr_v = lambda comp, kind, i: \
        PCV[10 * comp + 2 * kind + i:10 * comp + 2 * kind + i + 1]
    chr_h = lambda comp, kind, i: \
        PCH[10 * comp + 2 * kind + i:10 * comp + 2 * kind + i + 1]

    @pl.when(w == 0)
    def _init():
        A[...] = jnp.zeros_like(A)
        Bm[...] = jnp.zeros_like(Bm)
        Acb[...] = jnp.zeros_like(Acb)
        Bcb[...] = jnp.zeros_like(Bcb)
        Acr[...] = jnp.zeros_like(Acr)
        Bcr[...] = jnp.zeros_like(Bcr)

    # ---- luma V ------------------------------------------------------
    # tiles arrive as [mbH, ts, ts]; convert to col-major [ts, mbH*ts]
    # via sublane-merge + 2D transpose (the only Mosaic-supported way)
    x = xy[0].reshape(L, 16).T
    Av = A[...]
    W = [Av[12 + i:13 + i] for i in range(4)] \
        + [x[i:i + 1] for i in range(16)]
    for e in range(4):
        new = _filt_luma(W[4 * e:4 * e + 8], lum_v(1, e), lum_v(2, e),
                         lum_v(0, e), lum_v(3, e), lum_v(4, e))
        W[4 * e + 1:4 * e + 7] = new
    A[13:16] = jnp.concatenate(W[1:4], axis=0)
    xr = _t_cm_rm(jnp.concatenate(W[4:20], axis=0), 16, L // 16)

    # ---- chroma V ----------------------------------------------------
    crs = []
    for comp, (xc, Ac) in enumerate(
            ((xcb[0].reshape(Lc, 8).T, Acb),
             (xcr[0].reshape(Lc, 8).T, Acr))):
        Acv = Ac[...]
        Wc = [Acv[6:7], Acv[7:8]] + [xc[i:i + 1] for i in range(8)]
        for i, e in enumerate((0, 2)):
            new = _filt_chroma(Wc[2 * e:2 * e + 4], chr_v(comp, 1, i),
                               chr_v(comp, 2, i), chr_v(comp, 0, i),
                               chr_v(comp, 3, i), chr_v(comp, 4, i))
            Wc[2 * e + 1:2 * e + 3] = new
        Ac[6:8] = jnp.concatenate(Wc[0:2], axis=0)
        crs.append(_t_cm_rm(jnp.concatenate(Wc[2:10], axis=0), 8,
                            Lc // 8))
    xcb_r, xcr_r = crs

    # ---- luma H ------------------------------------------------------
    Bv = Bm[...]
    V = [_shift_top(Bv[12 + i:13 + i], 16, L, mbHf * 16) for i in range(4)] \
        + [xr[i:i + 1] for i in range(16)]
    for e in range(4):
        new = _filt_luma(V[4 * e:4 * e + 8], lum_h(1, e), lum_h(2, e),
                         lum_h(0, e), lum_h(3, e), lum_h(4, e))
        V[4 * e + 1:4 * e + 7] = new
    b_tail = [_unshift_merge(V[1 + i], Bv[13 + i:14 + i], 16, L, mbHf * 16)
              for i in range(3)]
    b_rm = jnp.concatenate([Bv[:13]] + b_tail, axis=0)    # [16, L]
    oy[0] = b_rm.T.reshape(L // 16, 16, 16).transpose(0, 2, 1)
    # rotate the window: B <- A (V-halo final; its H-halo arrives next
    # step), A <- this wave's fully filtered tiles, back in col-major
    Bm[...] = _t_cm_rm(A[...], 16, L // 16)
    A[...] = _t_cm_rm(jnp.stack(V[4:20]), 16, L // 16)

    # ---- chroma H ----------------------------------------------------
    for comp, (xc_r, Ac, Bc, oc) in enumerate(
            ((xcb_r, Acb, Bcb, ocb), (xcr_r, Acr, Bcr, ocr))):
        Bcv = Bc[...]
        Vc = [_shift_top(Bcv[6 + i:7 + i], 8, Lc, mbHf * 8)
              for i in range(2)] \
            + [xc_r[i:i + 1] for i in range(8)]
        for i, e in enumerate((0, 2)):
            new = _filt_chroma(Vc[2 * e:2 * e + 4], chr_h(comp, 1, i),
                               chr_h(comp, 2, i), chr_h(comp, 0, i),
                               chr_h(comp, 3, i), chr_h(comp, 4, i))
            Vc[2 * e + 1:2 * e + 3] = new
        c_tail = [_unshift_merge(Vc[i], Bcv[6 + i:7 + i], 8, Lc, mbHf * 8)
                  for i in range(2)]
        c_rm = jnp.concatenate([Bcv[:6]] + c_tail, axis=0)
        oc[0] = c_rm.T.reshape(Lc // 8, 8, 8).transpose(0, 2, 1)
        Bc[...] = _t_cm_rm(Ac[...], 8, Lc // 8)
        Ac[...] = _t_cm_rm(jnp.stack(Vc[2:10]), 8, Lc // 8)


def deblock_pallas(y, cb, cr, p, bs_v, bs_h, mbW, mbH, interpret=False):
    """Drop-in for jaxdec.deblock_scan running the wavefront as one
    Mosaic kernel.  y/cb/cr int32 dense frames -> filtered int32."""
    ys, cbs, crs = deblock_pallas_batch(
        y[None], cb[None], cr[None],
        {k: v[None] for k, v in p.items()}, bs_v[None], bs_h[None],
        mbW, mbH, interpret=interpret)
    return ys[0], cbs[0], crs[0]


# Scoped-VMEM ceiling for one kernel invocation, in mb-tile rows
# (K*mbH).  Every kernel temporary is a [*, K*mbH*16]-lane vector, so
# scoped VMEM is linear in the row count: measured 120.4 MB at 544 rows
# (8 lanes x 1080p) against the 100 MB limit -> ~0.222 MB/row.  320 rows
# keeps one call at ~71 MB with margin for Mosaic's transpose scratch.
# A single 8-lane 1080p pass (560 rows @ 127 MB VMEM) compiles and is
# digest-correct but measured ~3% SLOWER than two 4-lane chunks (r5
# job18): the kernel is data-bound, not chunk-overhead-bound.  The env
# knobs remain for future hardware.
_ROWS_MAX = int(__import__("os").environ.get("E264T_DB_ROWS_MAX",
                                             "320"))
_VMEM_LIMIT = int(__import__("os").environ.get("E264T_DB_VMEM_MB",
                                               "100")) * 1024 * 1024


def deblock_pallas_batch(ys, cbs, crs, p, bs_v, bs_h, mbW, mbH,
                         interpret=False):
    """Deblock K independent same-geometry frames in LOCKSTEP: one
    Mosaic kernel whose wave steps carry all K frames' diagonal tiles
    back to back on the tile axis, amortizing the per-wave fixed cost
    (the TPU analog of the reference's frame-level task parallelism,
    edge264_headers.c:1275-1277).  ys [K,16mbH,16mbW] int32; p values
    stacked [K,...].

    Large batches are split so each pallas_call stays under the TPU's
    scoped-VMEM limit (see _ROWS_MAX); chunks still amortize waves
    within themselves and XLA runs them back to back."""
    K = ys.shape[0]
    kc = max(1, _ROWS_MAX // mbH)
    if K > kc:
        outs = [deblock_pallas_batch(
                    ys[i:i + kc], cbs[i:i + kc], crs[i:i + kc],
                    {kk: v[i:i + kc] for kk, v in p.items()},
                    bs_v[i:i + kc], bs_h[i:i + kc], mbW, mbH,
                    interpret=interpret)
                for i in range(0, K, kc)]
        return tuple(jnp.concatenate([o[j] for o in outs], axis=0)
                     for j in range(3))
    T = mbW + 2 * mbH - 2 + 2
    L = K * mbH * 16
    Lc = K * mbH * 8
    cat = lambda parts, ax: (jnp.concatenate(parts, axis=ax)
                             if K > 1 else parts[0])
    xy = cat([_shear_tiles(ys[k], mbW, mbH, 16, extra=2)
              for k in range(K)], 1)
    xcb = cat([_shear_tiles(cbs[k], mbW, mbH, 8, extra=2)
               for k in range(K)], 1)
    xcr = cat([_shear_tiles(crs[k], mbW, mbH, 8, extra=2)
               for k in range(K)], 1)
    params = [_edge_params({kk: v[k] for kk, v in p.items()},
                           bs_v[k], bs_h[k], mbW, mbH, 2)
              for k in range(K)]
    pv = cat([pr[0] for pr in params], 2)
    ph = cat([pr[1] for pr in params], 2)
    pcv = cat([pr[2] for pr in params], 2)
    pch = cat([pr[3] for pr in params], 2)
    ins = [xy, xcb, xcr, pv, ph, pcv, pch]

    def spec(shape):
        blk = (1,) + tuple(shape[1:])
        nd = len(shape)
        return pl.BlockSpec(blk, lambda w, nd=nd: (w,) + (0,) * (nd - 1))

    out_shapes = (jax.ShapeDtypeStruct((T, K * mbH, 16, 16), jnp.int32),
                  jax.ShapeDtypeStruct((T, K * mbH, 8, 8), jnp.int32),
                  jax.ShapeDtypeStruct((T, K * mbH, 8, 8), jnp.int32))
    ey, ecb, ecr = pl.pallas_call(
        functools.partial(_kernel, mbHf=mbH),
        grid=(T,),
        in_specs=[spec(a.shape) for a in ins],
        out_specs=tuple(spec(s.shape) for s in out_shapes),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((16, L), jnp.int32),
                        pltpu.VMEM((16, L), jnp.int32),
                        pltpu.VMEM((8, Lc), jnp.int32),
                        pltpu.VMEM((8, Lc), jnp.int32),
                        pltpu.VMEM((8, Lc), jnp.int32),
                        pltpu.VMEM((8, Lc), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*ins)
    y = jnp.stack([_unshear_tiles(ey[:, k * mbH:(k + 1) * mbH], mbW, mbH,
                                  16, shift=2) for k in range(K)])
    cb = jnp.stack([_unshear_tiles(ecb[:, k * mbH:(k + 1) * mbH], mbW, mbH,
                                   8, shift=2) for k in range(K)])
    cr = jnp.stack([_unshear_tiles(ecr[:, k * mbH:(k + 1) * mbH], mbW, mbH,
                                   8, shift=2) for k in range(K)])
    return y, cb, cr

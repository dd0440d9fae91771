"""JAX/XLA device pixel path: batched residual decode + wavefront intra
reconstruction + wavefront deblocking.

Design (see ARCHITECTURE.md):
  * Residual (IQ + IDCT + DC hadamards) is a pure batched tensor op over
    the whole frame's coefficient planes — no intra-frame dependencies.
  * Intra prediction/reconstruction runs as a `lax.scan` over macroblock
    anti-diagonal waves (w = 2*mb_y + mb_x).  Within a wave, macroblocks
    are provably independent; the 16 I4x4 sub-blocks step in quad order.
    Directional prediction is pure gathers through the probe-verified
    index tables of ops/intra_tables.py.
  * Deblocking: boundary strengths are derived fully batched from the
    syntax planes (vector rules mirroring §8.7.2.1; reference description
    edge264_deblock.c:899-926), then a second wave scan applies the
    filters in spec order (V edges then H edges per mb; same-wave mbs are
    write-disjoint).

Everything is exact int32 integer math and bit-exact against
ops/oracle.py + ops/deblock_oracle.py (asserted by tests/test_jaxdec.py).
The Pallas single-kernel fusion of the two scans is the planned follow-up
for TPU speed-of-light; this module is the XLA-native reference path and
the one used for multi-chip sharding.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# the big sheared-wavefront programs are expensive to compile: persist
# compiled executables across processes (huge win for CLI runs / benches).
# CPU is EXCLUDED: XLA:CPU serializes executables with the build machine's
# CPU features baked in, and deserializing one compiled elsewhere aborts
# the process (observed as a SIGABRT in backend.deserialize_executable
# mid-suite) or risks SIGILL.  The cache only exists to amortize TPU
# compiles, so enable it exactly when this process may reach a TPU:
# JAX_PLATFORMS=cpu (what tests/conftest.py forces) disables it.
def _enable_persistent_cache():
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and set(plats.replace(" ", "").split(",")) <= {"cpu"}:
        return
    if "host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        return      # virtual CPU mesh (tests / multichip dryrun)
    try:
        import platform as _pf
        # key the dir per machine so NFS/tmp shared across heterogeneous
        # hosts never mixes incompatible executables
        tag = f"{_pf.machine()}"
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("E264T_JAX_CACHE",
                           f"/tmp/e264t_jax_cache-{tag}"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          2.0)
    except Exception:
        pass


_enable_persistent_cache()

from . import oracle as _o
from .intra_tables import I4_IDX, I16_DIR_IDX, CH_DIR_IDX, \
    I8_IDX, I8_FILT_IDX
from .deblock_oracle import ALPHA as _ALPHA, BETA as _BETA, TC0 as _TC0

MBF_INTRA, MBF_I16x16, MBF_IPCM, MBF_T8x8 = 1, 2, 4, 8
MBF_SKIP, MBF_PARSED, MBF_INTER = 16, 32, 64
MBF_BLEND = 256
DBF_LEFT, DBF_TOP, DBF_INNER = 1, 2, 4

I32 = jnp.int32

# quad scan order of 4x4 blocks within a macroblock (§6.4.3)
BLK4_X = np.array([0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3])
BLK4_Y = np.array([0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3])

_H4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1],
                [1, -1, -1, 1], [1, -1, 1, -1]], np.int32)


# ---------------------------------------------------------------------------
# Residual: batched IQ + IDCT

def _dequant4(c, qp, ls):
    """§8.5.12.1 over [..., 16] blocks with per-block qp [..., 1]."""
    s = qp // 6
    t = c * ls
    hi = t << jnp.maximum(s - 4, 0)
    lo = (t + (1 << jnp.maximum(3 - s, 0))) >> jnp.maximum(4 - s, 0)
    return jnp.where(s >= 4, hi, lo)


def _idct4(d):
    """§8.5.12.2 over [..., 4, 4]."""
    d0, d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    e0, e1 = d0 + d2, d0 - d2
    e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    f0, f1 = f[..., 0, :], f[..., 1, :]
    f2, f3 = f[..., 2, :], f[..., 3, :]
    g0, g1 = f0 + f2, f0 - f2
    g2, g3 = (f1 >> 1) - f3, f1 + (f3 >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def _idct8(d):
    """§8.5.13.2 over [..., 8, 8]."""
    def pass1(a):
        x = [a[..., i] for i in range(8)]
        e = [x[0] + x[4],
             -x[3] + x[5] - x[7] - (x[7] >> 1),
             x[0] - x[4],
             x[1] + x[7] - x[3] - (x[3] >> 1),
             (x[2] >> 1) - x[6],
             -x[1] + x[7] + x[5] + (x[5] >> 1),
             x[2] + (x[6] >> 1),
             x[3] + x[5] + x[1] + (x[1] >> 1)]
        f = [e[0] + e[6], e[1] + (e[7] >> 2), e[2] + e[4], e[3] + (e[5] >> 2),
             e[2] - e[4], (e[3] >> 2) - e[5], e[0] - e[6], e[7] - (e[1] >> 2)]
        g = [f[0] + f[7], f[2] + f[5], f[4] + f[3], f[6] + f[1],
             f[6] - f[1], f[4] - f[3], f[2] - f[5], f[0] - f[7]]
        return jnp.stack(g, axis=-1)

    h = pass1(d)
    k = jnp.swapaxes(pass1(jnp.swapaxes(h, -1, -2)), -1, -2)
    return (k + 32) >> 6


def _mb_to_blk4(a):
    """[H, W] per-mb -> [4H, 4W] per-4x4-block."""
    return jnp.repeat(jnp.repeat(a, 4, axis=0), 4, axis=1)


def _blocks_to_pixels(b, n):
    """[BH, BW, n, n] -> [BH*n, BW*n]."""
    BH, BW = b.shape[0], b.shape[1]
    return b.transpose(0, 2, 1, 3).reshape(BH * n, BW * n)


def _sel_norm(qpm6, table):
    """6-way row select: qpm6 [H,W] in 0..5, table [6,K] -> [H,W,K] via a
    one-hot matmul (exact in f32; avoids a TPU gather)."""
    oh = (qpm6[..., None] == jnp.arange(6, dtype=I32)).astype(jnp.float32)
    return jnp.einsum("hwj,jk->hwk", oh, jnp.asarray(table, jnp.float32),
                      preferred_element_type=jnp.float32).astype(I32)


def _idct4_planes(d):
    """§8.5.12.2 on a list of 16 coefficient planes (plane-major layout
    keeps every op on cleanly-tiled [BH,BW] arrays)."""
    rows = []
    for r in range(4):
        d0, d1, d2, d3 = d[4 * r:4 * r + 4]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        rows += [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    out = []
    for c in range(4):
        f0, f1, f2, f3 = rows[c], rows[4 + c], rows[8 + c], rows[12 + c]
        g0, g1 = f0 + f2, f0 - f2
        g2, g3 = (f1 >> 1) - f3, f1 + (f3 >> 1)
        col = [g0 + g3, g1 + g2, g1 - g2, g0 - g3]
        out.append([(v + 32) >> 6 for v in col])
    return [out[c][r] for r in range(4) for c in range(4)]


def _idct8_planes(d):
    """§8.5.13.2 on 64 coefficient planes."""
    def pass1(x):
        e = [x[0] + x[4],
             -x[3] + x[5] - x[7] - (x[7] >> 1),
             x[0] - x[4],
             x[1] + x[7] - x[3] - (x[3] >> 1),
             (x[2] >> 1) - x[6],
             -x[1] + x[7] + x[5] + (x[5] >> 1),
             x[2] + (x[6] >> 1),
             x[3] + x[5] + x[1] + (x[1] >> 1)]
        f = [e[0] + e[6], e[1] + (e[7] >> 2), e[2] + e[4],
             e[3] + (e[5] >> 2), e[2] - e[4], (e[3] >> 2) - e[5],
             e[0] - e[6], e[7] - (e[1] >> 2)]
        return [f[0] + f[7], f[2] + f[5], f[4] + f[3], f[6] + f[1],
                f[6] - f[1], f[4] - f[3], f[2] - f[5], f[0] - f[7]]

    rows = []
    for r in range(8):
        rows += pass1(d[8 * r:8 * r + 8])
    cols = [pass1([rows[8 * r + c] for r in range(8)]) for c in range(8)]
    return [(cols[c][r] + 32) >> 6 for r in range(8) for c in range(8)]


def _planes_to_pixels(pl, n, BH, BW):
    """n*n coefficient planes [BH,BW] -> pixel image [n*BH, n*BW]."""
    a = jnp.stack(pl).reshape(n, n, BH, BW)
    return a.transpose(2, 0, 3, 1).reshape(BH * n, BW * n)


def residual_frame(p, sm4, sm8, norm4, norm8, has_t8=True):
    """All luma+chroma residuals for one frame.

    p: dict of syntax planes (int32 jnp arrays).  sm4 [6,16] / sm8 [6,64]
    weight-scale matrices, norm4 [6,16] / norm8 [6,64] normAdjust.
    Returns res_y [16H,16W], res_cb, res_cr [8H,8W] int32.

    Coefficients are processed in PLANE-major layout ([16,BH,BW] instead
    of [BH,BW,16]): a trailing dim of 16 would be padded to 128 lanes by
    the TPU tiling, making every pass read 8x the bytes."""
    flags = p["mb_flags"]
    H, W = flags.shape
    intra = (flags & MBF_INTRA) > 0
    i16 = (flags & MBF_I16x16) > 0
    t8 = (flags & MBF_T8x8) > 0

    qpy = p["qp"][..., 0]
    s_mb = qpy // 6

    def expand4(a):
        return jnp.repeat(jnp.repeat(a, 4, 0), 4, 1)

    def dequant_planes(coef, ls_mb, s_mb, rep, shift_base):
        """coef [K,BH,BW] stacked planes; ls_mb [H,W,K] per-mb scales;
        s_mb [H,W] qp//6.  rep: mb->block expansion.  One stacked pass
        (a per-plane loop tripled XLA's op count and compile time)."""
        s = jnp.repeat(jnp.repeat(s_mb, rep, 0), rep, 1)[None]
        ls = jnp.repeat(jnp.repeat(ls_mb.transpose(2, 0, 1), rep, 1),
                        rep, 2)
        t = coef * ls
        hi = t << jnp.maximum(s - shift_base, 0)
        lo = (t + (1 << jnp.maximum(shift_base - 1 - s, 0))) \
            >> jnp.maximum(shift_base - s, 0)
        d = jnp.where(s >= shift_base, hi, lo)
        return [d[k] for k in range(coef.shape[0])]

    # ---- luma 4x4 ---------------------------------------------------
    ls4_mb = jnp.where(intra[..., None], sm4[0][None, None, :],
                       sm4[3][None, None, :]) * _sel_norm(qpy % 6, norm4)
    Cy = p["coef_y"].transpose(2, 0, 1)               # [16, 4H, 4W]
    d4 = dequant_planes(Cy, ls4_mb, s_mb, 4, 4)

    # Intra16x16 DC hadamard (§8.5.10)
    c = p["coef_y_dc"].reshape(H, W, 4, 4)
    f = jnp.einsum("ik,hwkl,lj->hwij", _H4, c, _H4)
    ls00 = sm4[0, 0] * norm4[qpy % 6, 0]
    s = s_mb
    tdc = f * ls00[..., None, None]
    dchi = tdc << jnp.maximum(s - 6, 0)[..., None, None]
    dclo = (tdc + (1 << jnp.maximum(5 - s, 0))[..., None, None]) \
        >> jnp.maximum(6 - s, 0)[..., None, None]
    dcy = jnp.where((s >= 6)[..., None, None], dchi, dclo)  # [H,W,4,4]
    dcy_blk = dcy.transpose(0, 2, 1, 3).reshape(4 * H, 4 * W)
    i16blk = expand4(i16)
    d4[0] = jnp.where(i16blk, dcy_blk, d4[0])
    r4 = _idct4_planes(d4)
    res4 = _planes_to_pixels(r4, 4, 4 * H, 4 * W)

    # ---- luma 8x8 (statically skipped when absent) ------------------
    if not has_t8:
        res_y = res4
    else:
        ls8_mb = jnp.where(intra[..., None], sm8[0][None, None, :],
                           sm8[1][None, None, :]) * _sel_norm(qpy % 6,
                                                              norm8)
        C8 = p["coef_y8"].transpose(2, 0, 1)          # [64, 2H, 2W]
        d8 = dequant_planes(C8, ls8_mb, s_mb, 2, 6)
        r8 = _idct8_planes(d8)
        res8 = _planes_to_pixels(r8, 8, 2 * H, 2 * W)
        t8pix = jnp.repeat(jnp.repeat(t8, 16, 0), 16, 1)
        res_y = jnp.where(t8pix, res8, res4)

    # ---- chroma (4:2:0): 2x2 DC hadamard (§8.5.11) + AC -------------
    res_c = []
    for comp, coef in ((1, p["coef_cb"]), (2, p["coef_cr"])):
        qpc = p["qp"][..., comp]
        lsc_mb = jnp.where(intra[..., None], sm4[comp][None, None, :],
                           sm4[comp + 3][None, None, :]) \
            * _sel_norm(qpc % 6, norm4)
        Cc = coef.transpose(2, 0, 1)                  # [16, 2H, 2W]
        dc4 = dequant_planes(Cc, lsc_mb, qpc // 6, 2, 4)
        cdc = p["coef_c_dc"][:, :, comp - 1].reshape(H, W, 2, 2)
        c00, c01 = cdc[..., 0, 0], cdc[..., 0, 1]
        c10, c11 = cdc[..., 1, 0], cdc[..., 1, 1]
        f00 = c00 + c01 + c10 + c11
        f01 = c00 - c01 + c10 - c11
        f10 = c00 + c01 - c10 - c11
        f11 = c00 - c01 - c10 + c11
        fdc = jnp.stack([jnp.stack([f00, f01], -1),
                         jnp.stack([f10, f11], -1)], -2)   # [H,W,2,2]
        ls00c = sm4[comp, 0] * norm4[qpc % 6, 0]
        dcc = ((fdc * ls00c[..., None, None])
               << (qpc // 6)[..., None, None]) >> 5
        dcc_blk = dcc.transpose(0, 2, 1, 3).reshape(2 * H, 2 * W)
        dc4[0] = dcc_blk
        rc = _idct4_planes(dc4)
        res_c.append(_planes_to_pixels(rc, 4, 2 * H, 2 * W))
    return res_y, res_c[0], res_c[1]


# ---------------------------------------------------------------------------
# Wavefront tables (static per frame geometry)

def intra_level_tables(flags, mbW, mbH):
    """Host-side level compression of the intra wavefront.

    An intra macroblock only depends on *intra* neighbours' pixels (inter
    neighbours are reconstructed by the dense MC+residual pass before the
    scan runs), so the scan axis can be the longest intra->intra chain
    ("level") instead of the full anti-diagonal wave index.  For P/B
    frames with sparse intra mbs this collapses 254 waves to 2-4 levels.

    Levels are computed by fixpoint relaxation over the four causal
    neighbours (left, top, top-left, top-right).  Tables are padded to a
    small fixed menu of (L, N) buckets so jit caches stay bounded; returns
    None when the frame is too intra-dense to fit a bucket (caller falls
    back to full wave tables).
    """
    M = (flags & MBF_INTRA) > 0
    if M.mean() > 0.4:        # intra-dense: chains will exceed any bucket
        return None
    lvl = M.astype(np.int32)
    for it in range(17):      # levels > 16 never fit a bucket anyway
        left = np.pad(lvl, ((0, 0), (1, 0)))[:, :-1]
        top = np.pad(lvl, ((1, 0), (0, 0)))[:-1, :]
        tl = np.pad(lvl, ((1, 0), (1, 0)))[:-1, :-1]
        tr = np.pad(lvl, ((1, 0), (0, 1)))[:-1, 1:]
        new = np.where(M, 1 + np.maximum.reduce([left, top, tl, tr]), 0)
        if np.array_equal(new, lvl):
            break
        lvl = new
    else:
        return None           # did not converge within 8 levels
    lmax = int(lvl.max())
    if lmax == 0:
        mxs = np.zeros((1, 1), np.int32)
        return mxs, mxs.copy(), np.zeros((1, 1), bool)
    per = [np.nonzero(lvl == lv) for lv in range(1, lmax + 1)]
    nmax = max(len(ys) for ys, xs in per)
    Lb = next((b for b in (2, 4, 8, 16) if lmax <= b), None)
    Nb = next((b for b in (128, 512, 2048, 8160) if nmax <= b), None)
    if Lb is None or Nb is None:
        return None
    mxs = np.zeros((Lb, Nb), np.int32)
    mys = np.zeros((Lb, Nb), np.int32)
    valid = np.zeros((Lb, Nb), bool)
    for i, (ys, xs) in enumerate(per):
        mxs[i, :len(xs)] = xs
        mys[i, :len(ys)] = ys
        valid[i, :len(ys)] = True
    return mxs, mys, valid


def wave_tables(mbW, mbH):
    n_waves = mbW + 2 * mbH - 2
    maxd = min(mbH, (mbW + 1) // 2)
    mxs = np.zeros((n_waves, maxd), np.int32)
    mys = np.zeros((n_waves, maxd), np.int32)
    valid = np.zeros((n_waves, maxd), bool)
    for w in range(n_waves):
        lane = 0
        for my in range(mbH):
            mx = w - 2 * my
            if 0 <= mx < mbW:
                mxs[w, lane], mys[w, lane], valid[w, lane] = mx, my, True
                lane += 1
    return mxs, mys, valid


def _gather2(img, rows, cols):
    """img[rows, cols] with index clipping (values masked by callers)."""
    H, W = img.shape
    return img[jnp.clip(rows, 0, H - 1), jnp.clip(cols, 0, W - 1)]


def _scatter2(img, rows, cols, vals, active):
    """Masked scatter: lanes with active=False are dropped (sent OOB)."""
    big = jnp.asarray(1 << 28, I32)
    shape = [1] * rows.ndim
    shape[0] = -1
    act = active.reshape(shape)
    r = jnp.where(act, rows, big)
    return img.at[r, cols].set(vals, mode="drop")


def _tap3(nb, idx):
    """(a + 2b + c + 2) >> 2 through per-lane index triples.
    nb [L, N], idx [L, P, 3] -> [L, P]."""
    a = jnp.take_along_axis(nb, idx[..., 0], axis=1)
    b = jnp.take_along_axis(nb, idx[..., 1], axis=1)
    c = jnp.take_along_axis(nb, idx[..., 2], axis=1)
    return (a + 2 * b + c + 2) >> 2


# ---------------------------------------------------------------------------
# Intra reconstruction wave scan

# I16 plane-mode index vectors into nb33 (l[i]=15-i, tl=16, t[j]=17+j);
# the t[-1]/l[-1] -> tl substitutions fall out of the arithmetic.
_I16_HP = np.arange(25, 33)          # t[8+x]
_I16_HM = 23 - np.arange(8)          # t[6-x] (x=7 -> tl)
_I16_VP = 7 - np.arange(8)           # l[8+y]
_I16_VM = 9 + np.arange(8)           # l[6-y] (y=7 -> tl)
_CH_HP = 13 + np.arange(4)           # t[4+x]
_CH_HM = 11 - np.arange(4)           # t[2-x] (x=3 -> tl)
_CH_VP = 3 - np.arange(4)            # l[4+y]
_CH_VM = 5 + np.arange(4)            # l[2-y] (y=3 -> tl)


def _plane_sums(nb, idx_p, idx_m, n):
    w = jnp.arange(1, n + 1, dtype=I32)
    return ((nb[:, idx_p] - nb[:, idx_m]) * w).sum(1)


def _mk_dir_w(idx, ntap):
    """Directional-mode tap triples -> dense weight matrix [nm*npx, ntap+1]
    (last column = rounding bias) so prediction for every mode is ONE
    matmul: pred = (nb1 @ W.T) >> 2.  Integer values stay exact in f32
    (all inputs <= 255 and sums << 2^24)."""
    nm, npx, _ = idx.shape
    W = np.zeros((nm * npx, ntap + 1), np.float32)
    for m in range(nm):
        for pp in range(npx):
            i0, i1, i2 = idx[m, pp]
            W[m * npx + pp, i0] += 1
            W[m * npx + pp, i1] += 2
            W[m * npx + pp, i2] += 1
            W[m * npx + pp, ntap] += 2
    return W


_W4 = _mk_dir_w(I4_IDX, 13)            # [144, 14]
_W8 = _mk_dir_w(I8_IDX, 25)            # [576, 26]
_W16 = _mk_dir_w(I16_DIR_IDX, 33)      # [512, 34]
_WCH = _mk_dir_w(CH_DIR_IDX, 17)       # [128, 18]
_WF8 = _mk_dir_w(I8_FILT_IDX[None], 25)  # [25, 26] §8.3.2.2.1 lowpass


def _dir_matmul(nb, W, mode, nm, npx):
    """nb [L, ntap] int32, mode [L] -> directional prediction [L, npx] via
    one matmul + a one-hot mode contraction."""
    L = nb.shape[0]
    nb1 = jnp.concatenate(
        [nb, jnp.ones((L, 1), I32)], axis=1).astype(jnp.float32)
    preds = jnp.dot(nb1, jnp.asarray(W).T,
                    preferred_element_type=jnp.float32)
    preds = preds.reshape(L, nm, npx)
    oh = (mode[:, None] == jnp.arange(nm, dtype=I32)).astype(jnp.float32)
    sel = jnp.einsum("lmp,lm->lp", preds, oh,
                     preferred_element_type=jnp.float32)
    return sel.astype(I32) >> 2


def intra_scan_sheared(y, cb, cr, res_y, res_cb, res_cr, p, mbW, mbH,
                       has_t8=True, has_pcm=True):
    """Sheared-layout intra reconstruction for intra-DENSE frames.

    Same rolling-window idea as the sheared deblock scan: the wavefront is
    the leading axis of sheared tile stacks, and the scan carries the tiles
    of waves w-1 (left / top-right), w-2 (top) and w-3 (top-left), so each
    step is pure static slicing over [mbH, ts, ts] tiles — no frame-sized
    gather/scatter.  Directional prediction for all modes is one matmul
    through the probe-derived weight matrices (_mk_dir_w).  Sparse-intra
    frames use intra_scan() over level-compressed tables instead."""
    NW = mbW + 2 * mbH - 2
    valid = np.zeros((NW, mbH), bool)
    for s in range(NW):
        mx = s - 2 * np.arange(mbH)
        valid[s] = (0 <= mx) & (mx < mbW)
    val_t = jnp.asarray(valid)

    Xy_t = _shear_tiles(y, mbW, mbH, 16, extra=0)
    Xcb_t = _shear_tiles(cb, mbW, mbH, 8, extra=0)
    Xcr_t = _shear_tiles(cr, mbW, mbH, 8, extra=0)
    ry_t = _shear_tiles(res_y, mbW, mbH, 16, extra=0)
    rcb_t = _shear_tiles(res_cb, mbW, mbH, 8, extra=0)
    rcr_t = _shear_tiles(res_cr, mbW, mbH, 8, extra=0)
    if has_pcm:
        py_t = _shear_tiles(p["pcm_y"], mbW, mbH, 16, extra=0)
        pcb_t = _shear_tiles(p["pcm_c"][0], mbW, mbH, 8, extra=0)
        pcr_t = _shear_tiles(p["pcm_c"][1], mbW, mbH, 8, extra=0)
    else:
        NWt = mbW + 2 * mbH - 2
        py_t = jnp.zeros((NWt, 1, 1, 1), I32)
        pcb_t = pcr_t = jnp.zeros((NWt, 1, 1, 1), I32)
    i4m_t = _shear_tiles(p["i4_modes"], mbW, mbH, 4, extra=0)
    if has_t8:
        i8m_t = _shear_tiles(p["i8_modes"], mbW, mbH, 2, extra=0)
    else:
        i8m_t = jnp.zeros((mbW + 2 * mbH - 2, 1, 1, 1), I32)
    i16m_t = _shear_plane(p["i16_modes"], mbW, mbH, extra=0)
    chm_t = _shear_plane(p["ch_modes"], mbW, mbH, extra=0)
    fl_t = _shear_plane(p["mb_flags"], mbW, mbH, extra=0)

    L = mbH
    ones = jnp.ones((L, 1), I32)
    xx16 = jnp.tile(jnp.arange(16, dtype=I32), (16,)).reshape(16, 16)
    yy16 = xx16.T
    xx8 = jnp.tile(jnp.arange(8, dtype=I32), (8,)).reshape(8, 8)
    yy8 = xx8.T

    def shift_my(t):
        return jnp.concatenate([jnp.zeros_like(t[:1]), t[:-1]], 0)

    def step(carry, xs):
        A, B, C, Ab, Bb, Cb_, Ar, Br, Cr_ = carry
        (X, Xcb, Xcr, ry, rcb, rcr, pcy, pccb, pccr,
         i4m, i8m, i16m, chm, flags, val) = xs
        Bs, Cs, As = shift_my(B), shift_my(C), shift_my(A)
        is_pcm = (flags & MBF_IPCM) > 0
        is_i16 = (flags & MBF_I16x16) > 0
        is_t8 = (flags & MBF_T8x8) > 0
        is_intra = (flags & MBF_INTRA) > 0
        is_i4 = is_intra & ~is_i16 & ~is_pcm & ~is_t8
        is_i8 = is_intra & is_t8 & ~is_pcm

        # ---- I4x4: 16 quad-order substeps, static tile slicing ----------
        for k in range(16):
            bx, by = int(BLK4_X[k]), int(BLK4_Y[k])
            r0, c0 = by * 4, bx * 4
            m = i4m[:, by, bx]
            mode = m & 15
            aA, aB, aC = (m >> 4) & 1, (m >> 5) & 1, (m >> 6) & 1
            if by == 0:
                t4 = Bs[:, 15, c0:c0 + 4]
                tr = As[:, 15, 0:4] if bx == 3 else Bs[:, 15, c0 + 4:c0 + 8]
            else:
                t4 = X[:, r0 - 1, c0:c0 + 4]
                if bx == 3:
                    tr = jnp.broadcast_to(t4[:, 3:4], (L, 4))
                else:
                    tr = X[:, r0 - 1, c0 + 4:c0 + 8]
            t = jnp.concatenate(
                [t4, jnp.where((aC > 0)[:, None], tr, t4[:, 3:4])], 1)
            l = (A[:, r0:r0 + 4, 15] if bx == 0 else
                 X[:, r0:r0 + 4, c0 - 1])
            if bx == 0 and by == 0:
                tl = Cs[:, 15, 15]
            elif by == 0:
                tl = Bs[:, 15, c0 - 1]
            elif bx == 0:
                tl = A[:, r0 - 1, 15]
            else:
                tl = X[:, r0 - 1, c0 - 1]
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], 1)
            dirp = _dir_matmul(nb, _W4, mode, 9, 16)
            sA, sB = l.sum(1), t[:, :4].sum(1)
            dc = jnp.where((aA & aB) > 0, (sA + sB + 4) >> 3,
                           jnp.where(aA > 0, (sA + 2) >> 2,
                                     jnp.where(aB > 0, (sB + 2) >> 2, 128)))
            pred = jnp.where((mode == 2)[:, None], dc[:, None], dirp)
            res = ry[:, r0:r0 + 4, c0:c0 + 4].reshape(L, 16)
            recon = jnp.clip(pred + res, 0, 255).reshape(L, 4, 4)
            act = (val & is_i4)[:, None, None]
            X = X.at[:, r0:r0 + 4, c0:c0 + 4].set(
                jnp.where(act, recon, X[:, r0:r0 + 4, c0:c0 + 4]))

        # ---- Intra_8x8: 4 quad-order substeps ---------------------------
        for b in range(4) if has_t8 else ():
            bx8, by8 = b & 1, b >> 1
            r0, c0 = by8 * 8, bx8 * 8
            mm = i8m[:, by8, bx8]
            mode = mm & 15
            aA, aB = (mm >> 4) & 1, (mm >> 5) & 1
            aC, aD = (mm >> 6) & 1, (mm >> 7) & 1
            if by8 == 0:
                t8v = Bs[:, 15, c0:c0 + 8]
                tr = (As[:, 15, 0:8] if bx8 == 1
                      else Bs[:, 15, 8:16])
            else:
                t8v = X[:, 7, c0:c0 + 8]
                if bx8 == 1:
                    tr = jnp.broadcast_to(t8v[:, 7:8], (L, 8))
                else:
                    tr = X[:, 7, 8:16]
            t = jnp.concatenate(
                [t8v, jnp.where((aC > 0)[:, None], tr, t8v[:, 7:8])], 1)
            l = (A[:, r0:r0 + 8, 15] if bx8 == 0 else X[:, r0:r0 + 8, 7])
            if bx8 == 0 and by8 == 0:
                tl = Cs[:, 15, 15]
            elif by8 == 0:
                tl = Bs[:, 15, 7]
            elif bx8 == 0:
                tl = A[:, 7, 15]
            else:
                tl = X[:, 7, 7]
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], 1)
            # §8.3.2.2.1 reference lowpass via matmul + boundary patches
            nb1 = jnp.concatenate([nb, ones], 1).astype(jnp.float32)
            nbf = (jnp.dot(nb1, jnp.asarray(_WF8).T,
                           preferred_element_type=jnp.float32)
                   .astype(I32) >> 2)
            l0, t0, t1, l1 = nb[:, 7], nb[:, 9], nb[:, 10], nb[:, 6]
            tl0 = nb[:, 8]
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
            nbf = nbf.at[:, 9].set(t0f).at[:, 7].set(l0f).at[:, 8].set(tlf)
            nbf = jnp.where((aB > 0)[:, None],
                            nbf,
                            jnp.concatenate([nbf[:, :9], nb[:, 9:]], 1))
            nbf = jnp.where((aA > 0)[:, None],
                            nbf,
                            jnp.concatenate([nb[:, :8], nbf[:, 8:]], 1))
            dirp = _dir_matmul(nbf, _W8, mode, 9, 64)
            st = jnp.where(aB > 0, nbf[:, 9:17].sum(1), 0)
            sl = jnp.where(aA > 0, nbf[:, :8].sum(1), 0)
            dc = jnp.where((aA & aB) > 0, (st + sl + 8) >> 4,
                           jnp.where(aA > 0, (sl + 4) >> 3,
                                     jnp.where(aB > 0, (st + 4) >> 3, 128)))
            pred = jnp.where((mode == 2)[:, None], dc[:, None], dirp)
            res = ry[:, r0:r0 + 8, c0:c0 + 8].reshape(L, 64)
            recon = jnp.clip(pred + res, 0, 255).reshape(L, 8, 8)
            act = (val & is_i8)[:, None, None]
            X = X.at[:, r0:r0 + 8, c0:c0 + 8].set(
                jnp.where(act, recon, X[:, r0:r0 + 8, c0:c0 + 8]))

        # ---- I16x16 ----------------------------------------------------
        m = i16m
        mode = m & 3
        aA, aB = (m >> 4) & 1, (m >> 5) & 1
        t = jnp.where((aB > 0)[:, None], Bs[:, 15, :], 0)
        l = jnp.where((aA > 0)[:, None], A[:, :, 15], 0)
        tl = Cs[:, 15, 15]
        nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], 1)
        dirp = _dir_matmul(nb, _W16, jnp.clip(mode, 0, 1), 2, 256)
        st, sl = t.sum(1), l.sum(1)
        dc = jnp.where((aA & aB) > 0, (st + sl + 16) >> 5,
                       jnp.where(aA > 0, (sl + 8) >> 4,
                                 jnp.where(aB > 0, (st + 8) >> 4, 128)))
        hs = _plane_sums(nb, _I16_HP, _I16_HM, 8)
        vs = _plane_sums(nb, _I16_VP, _I16_VM, 8)
        a = 16 * (nb[:, 0] + nb[:, 32])
        b_ = (5 * hs + 32) >> 6
        c_ = (5 * vs + 32) >> 6
        plane = jnp.clip(
            (a[:, None] + b_[:, None] * (xx16.reshape(-1) - 7)[None, :]
             + c_[:, None] * (yy16.reshape(-1) - 7)[None, :] + 16) >> 5,
            0, 255)
        pred = jnp.where((mode == 2)[:, None], dc[:, None],
                         jnp.where((mode == 3)[:, None], plane, dirp))
        recon = jnp.clip(pred + ry.reshape(L, 256), 0, 255).reshape(L, 16,
                                                                    16)
        act = (val & is_i16)[:, None, None]
        X = jnp.where(act, recon, X)
        if has_pcm:
            X = jnp.where((val & is_pcm)[:, None, None], pcy, X)

        # ---- chroma ----------------------------------------------------
        m = chm
        mode = m & 3
        aA, aB = (m >> 4) & 1, (m >> 5) & 1
        out_c = []
        for Ac, Bc, Cc, img, res_c, pcm_c in (
                (Ab, Bb, Cb_, Xcb, rcb, pccb),
                (Ar, Br, Cr_, Xcr, rcr, pccr)):
            Bcs, Ccs = shift_my(Bc), shift_my(Cc)
            t = jnp.where((aB > 0)[:, None], Bcs[:, 7, :], 0)
            l = jnp.where((aA > 0)[:, None], Ac[:, :, 7], 0)
            tl = Ccs[:, 7, 7]
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], 1)
            dirp = _dir_matmul(nb, _WCH, jnp.clip(mode - 1, 0, 1), 2, 64)
            ts0, ts1 = t[:, :4].sum(1), t[:, 4:].sum(1)
            ls0, ls1 = l[:, :4].sum(1), l[:, 4:].sum(1)
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
                                      jnp.where(onlyB, (ts1 + 2) >> 2,
                                                128)))
            right = (xx8.reshape(-1) >= 4)[None, :]
            bottom = (yy8.reshape(-1) >= 4)[None, :]
            dcmap = jnp.where(
                bottom, jnp.where(right, q11[:, None], q10[:, None]),
                jnp.where(right, q01[:, None], q00[:, None]))
            hs = _plane_sums(nb, _CH_HP, _CH_HM, 4)
            vs = _plane_sums(nb, _CH_VP, _CH_VM, 4)
            a = 16 * (nb[:, 0] + nb[:, 16])
            b_ = (34 * hs + 32) >> 6
            c_ = (34 * vs + 32) >> 6
            plane = jnp.clip(
                (a[:, None] + b_[:, None] * (xx8.reshape(-1) - 3)[None, :]
                 + c_[:, None] * (yy8.reshape(-1) - 3)[None, :] + 16) >> 5,
                0, 255)
            pred = jnp.where((mode == 0)[:, None], dcmap,
                             jnp.where((mode == 3)[:, None], plane, dirp))
            recon = jnp.clip(pred + res_c.reshape(L, 64), 0,
                             255).reshape(L, 8, 8)
            img = jnp.where((val & is_intra & ~is_pcm)[:, None, None],
                            recon, img)
            if has_pcm:
                img = jnp.where((val & is_pcm)[:, None, None], pcm_c, img)
            out_c.append(img)
        Xcb, Xcr = out_c

        new_carry = (X, A, B, Xcb, Ab, Bb, Xcr, Ar, Br)
        return new_carry, (X, Xcb, Xcr)

    z_y = jnp.zeros((mbH, 16, 16), I32)
    z_c = jnp.zeros((mbH, 8, 8), I32)
    carry0 = (z_y, z_y, z_y, z_c, z_c, z_c, z_c, z_c, z_c)
    xs = (Xy_t, Xcb_t, Xcr_t, ry_t, rcb_t, rcr_t, py_t, pcb_t, pcr_t,
          i4m_t, i8m_t, i16m_t, chm_t, fl_t, val_t)
    _, (ey, ecb, ecr) = lax.scan(step, carry0, xs)
    y = _unshear_tiles(ey, mbW, mbH, 16, shift=0)
    cb = _unshear_tiles(ecb, mbW, mbH, 8, shift=0)
    cr = _unshear_tiles(ecr, mbW, mbH, 8, shift=0)
    return y, cb, cr


def intra_round_plane(flags, mbW, mbH, caps=(2, 4, 8)):
    """Host-side dependency-depth plane for intra_rounds().

    An intra macroblock only waits on *intra* causal neighbours (left,
    top, top-left, top-right) — inter neighbours are reconstructed by the
    dense MC+residual pass before any intra work.  Depth 1 = no intra
    neighbour; depth d = 1 + max(depth of intra neighbours).  P/B frames
    with sparse intra collapse the ~(mbW+2*mbH) wavefront to 2-4 rounds.

    Returns (lvl int32 [mbH, mbW], R) with R the smallest bucket from
    `caps` covering max depth (bucketing keeps the jit program count
    bounded), or None when the frame is too intra-dense (caller uses the
    sheared wavefront scan instead)."""
    M = (flags & MBF_INTRA) > 0
    if M.mean() > 0.4:          # dense: chains won't fit any bucket
        return None
    lvl = M.astype(np.int32)
    for _ in range(caps[-1] + 1):
        left = np.pad(lvl, ((0, 0), (1, 0)))[:, :-1]
        top = np.pad(lvl, ((1, 0), (0, 0)))[:-1, :]
        tl = np.pad(lvl, ((1, 0), (1, 0)))[:-1, :-1]
        tr = np.pad(lvl, ((1, 0), (0, 1)))[:-1, 1:]
        new = np.where(M, 1 + np.maximum.reduce([left, top, tl, tr]), 0)
        if np.array_equal(new, lvl):
            break
        lvl = new
    else:
        return None
    R = next((b for b in caps if int(lvl.max()) <= b), None)
    if R is None:
        return None
    return lvl.astype(np.int32), R


def intra_rounds(y, cb, cr, res_y, res_cb, res_cr, p, lvl, mbW, mbH,
                 rounds, has_t8=True, has_pcm=True):
    """Masked level-rounds intra reconstruction for intra-SPARSE frames.

    The TPU-native replacement for the level-compressed gather scan
    (whose dynamic-index gathers serialize on TPU, ~276 ms/frame): each
    round reconstructs EVERY intra macroblock of that dependency depth
    simultaneously as full-frame tensor work, with all neighbour reads
    as STATIC slices of zero-padded shifted tile stacks — no gathers, no
    scatters, no scan.  2-4 rounds replace the ~254-wave sheared scan on
    typical P/B frames; intra-dense frames (IDR) keep
    intra_scan_sheared.  Arithmetic is copied 1:1 from the sheared scan
    (bit-exact against ops/oracle.py); reference mode kernels:
    edge264_intra.c:291-765."""
    N = mbH * mbW

    def tile(img, ts):
        return (img.reshape(mbH, ts, mbW, ts).transpose(0, 2, 1, 3)
                .reshape(N, ts, ts))

    def untile(X, ts):
        return (X.reshape(mbH, mbW, ts, ts).transpose(0, 2, 1, 3)
                .reshape(mbH * ts, mbW * ts))

    Xf = tile(y, 16)
    Xcbf = tile(cb, 8)
    Xcrf = tile(cr, 8)
    ryf = tile(res_y, 16)
    rcbf = tile(res_cb, 8)
    rcrf = tile(res_cr, 8)
    if has_pcm:
        pyf = tile(p["pcm_y"], 16)
        pcbf = tile(p["pcm_c"][0], 8)
        pcrf = tile(p["pcm_c"][1], 8)
    i4m = tile(p["i4_modes"], 4)                       # [N, 4, 4]
    if has_t8:
        i8m = tile(p["i8_modes"], 2)                   # [N, 2, 2]
    i16m = p["i16_modes"].reshape(N)
    chm = p["ch_modes"].reshape(N)
    flags = p["mb_flags"].reshape(N)
    if lvl is None:
        # recompute the depth plane on device (R static fixpoint
        # iterations over the tiny [mbH, mbW] plane) — cheaper than a
        # second H2D transfer per step on the tunnel.  The host has
        # already verified max depth <= rounds (intra_round_plane).
        Mp = (p["mb_flags"].reshape(mbH, mbW) & MBF_INTRA) > 0
        lv = Mp.astype(I32)
        for _ in range(rounds):
            left = jnp.pad(lv, ((0, 0), (1, 0)))[:, :-1]
            top = jnp.pad(lv, ((1, 0), (0, 0)))[:-1, :]
            tl_ = jnp.pad(lv, ((1, 0), (1, 0)))[:-1, :-1]
            tr_ = jnp.pad(lv, ((1, 0), (0, 1)))[:-1, 1:]
            lv = jnp.where(Mp, 1 + jnp.maximum(jnp.maximum(left, top),
                                               jnp.maximum(tl_, tr_)), 0)
        lvl = lv
    lvl_f = lvl.reshape(N)

    is_pcm = (flags & MBF_IPCM) > 0
    is_i16 = (flags & MBF_I16x16) > 0
    is_t8f = (flags & MBF_T8x8) > 0
    is_intra = (flags & MBF_INTRA) > 0
    is_i4 = is_intra & ~is_i16 & ~is_pcm & ~is_t8f
    is_i8 = is_intra & is_t8f & ~is_pcm

    ones = jnp.ones((N, 1), I32)
    xx16 = jnp.tile(jnp.arange(16, dtype=I32), (16,)).reshape(16, 16)
    yy16 = xx16.T
    xx8 = jnp.tile(jnp.arange(8, dtype=I32), (8,)).reshape(8, 8)
    yy8 = xx8.T

    def nbr_rows(Xf_, ts):
        """Zero-padded neighbour snapshots from the round-start frame:
        (top mb bottom row, left mb right col, top-right mb bottom row,
        top-left mb corner pixel), each [N, ts] / [N]."""
        X = Xf_.reshape(mbH, mbW, ts, ts)
        bot = X[:, :, ts - 1, :]
        rgt = X[:, :, :, ts - 1]
        T = jnp.pad(bot, ((1, 0), (0, 0), (0, 0)))[:-1]
        Lc = jnp.pad(rgt, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        TR = jnp.pad(bot, ((1, 0), (0, 1), (0, 0)))[:-1, 1:]
        TL = jnp.pad(X[:, :, ts - 1, ts - 1], ((1, 0), (1, 0)))[:-1, :-1]
        return (T.reshape(N, ts), Lc.reshape(N, ts), TR.reshape(N, ts),
                TL.reshape(N))

    for r in range(1, rounds + 1):
        act_mb = lvl_f == r
        T, Lc, TR, TLp = nbr_rows(Xf, 16)

        # ---- I4x4: 16 quad-order substeps -------------------------------
        for k in range(16):
            bx, by = int(BLK4_X[k]), int(BLK4_Y[k])
            r0, c0 = by * 4, bx * 4
            m = i4m[:, by, bx]
            mode = m & 15
            aA, aB, aC = (m >> 4) & 1, (m >> 5) & 1, (m >> 6) & 1
            if by == 0:
                t4 = T[:, c0:c0 + 4]
                tr = TR[:, 0:4] if bx == 3 else T[:, c0 + 4:c0 + 8]
            else:
                t4 = Xf[:, r0 - 1, c0:c0 + 4]
                if bx == 3:
                    tr = jnp.broadcast_to(t4[:, 3:4], (N, 4))
                else:
                    tr = Xf[:, r0 - 1, c0 + 4:c0 + 8]
            t = jnp.concatenate(
                [t4, jnp.where((aC > 0)[:, None], tr, t4[:, 3:4])], 1)
            l = Lc[:, r0:r0 + 4] if bx == 0 else Xf[:, r0:r0 + 4, c0 - 1]
            if bx == 0 and by == 0:
                tl = TLp
            elif by == 0:
                tl = T[:, c0 - 1]
            elif bx == 0:
                tl = Lc[:, r0 - 1]
            else:
                tl = Xf[:, r0 - 1, c0 - 1]
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], 1)
            dirp = _dir_matmul(nb, _W4, mode, 9, 16)
            sA, sB = l.sum(1), t[:, :4].sum(1)
            dc = jnp.where((aA & aB) > 0, (sA + sB + 4) >> 3,
                           jnp.where(aA > 0, (sA + 2) >> 2,
                                     jnp.where(aB > 0, (sB + 2) >> 2, 128)))
            pred = jnp.where((mode == 2)[:, None], dc[:, None], dirp)
            res = ryf[:, r0:r0 + 4, c0:c0 + 4].reshape(N, 16)
            recon = jnp.clip(pred + res, 0, 255).reshape(N, 4, 4)
            act = (act_mb & is_i4)[:, None, None]
            Xf = Xf.at[:, r0:r0 + 4, c0:c0 + 4].set(
                jnp.where(act, recon, Xf[:, r0:r0 + 4, c0:c0 + 4]))

        # ---- Intra_8x8: 4 quad-order substeps ---------------------------
        for b in range(4) if has_t8 else ():
            bx8, by8 = b & 1, b >> 1
            r0, c0 = by8 * 8, bx8 * 8
            mm = i8m[:, by8, bx8]
            mode = mm & 15
            aA, aB = (mm >> 4) & 1, (mm >> 5) & 1
            aC, aD = (mm >> 6) & 1, (mm >> 7) & 1
            if by8 == 0:
                t8v = T[:, c0:c0 + 8]
                tr = TR[:, 0:8] if bx8 == 1 else T[:, 8:16]
            else:
                t8v = Xf[:, 7, c0:c0 + 8]
                if bx8 == 1:
                    tr = jnp.broadcast_to(t8v[:, 7:8], (N, 8))
                else:
                    tr = Xf[:, 7, 8:16]
            t = jnp.concatenate(
                [t8v, jnp.where((aC > 0)[:, None], tr, t8v[:, 7:8])], 1)
            l = Lc[:, r0:r0 + 8] if bx8 == 0 else Xf[:, r0:r0 + 8, 7]
            if bx8 == 0 and by8 == 0:
                tl = TLp
            elif by8 == 0:
                tl = T[:, c0 - 1]
            elif bx8 == 0:
                tl = Lc[:, 7]
            else:
                tl = Xf[:, 7, 7]
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], 1)
            nb1 = jnp.concatenate([nb, ones], 1).astype(jnp.float32)
            nbf = (jnp.dot(nb1, jnp.asarray(_WF8).T,
                           preferred_element_type=jnp.float32)
                   .astype(I32) >> 2)
            l0, t0, t1, l1 = nb[:, 7], nb[:, 9], nb[:, 10], nb[:, 6]
            tl0 = nb[:, 8]
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
            nbf = nbf.at[:, 9].set(t0f).at[:, 7].set(l0f).at[:, 8].set(tlf)
            nbf = jnp.where((aB > 0)[:, None],
                            nbf,
                            jnp.concatenate([nbf[:, :9], nb[:, 9:]], 1))
            nbf = jnp.where((aA > 0)[:, None],
                            nbf,
                            jnp.concatenate([nb[:, :8], nbf[:, 8:]], 1))
            dirp = _dir_matmul(nbf, _W8, mode, 9, 64)
            st = jnp.where(aB > 0, nbf[:, 9:17].sum(1), 0)
            sl = jnp.where(aA > 0, nbf[:, :8].sum(1), 0)
            dc = jnp.where((aA & aB) > 0, (st + sl + 8) >> 4,
                           jnp.where(aA > 0, (sl + 4) >> 3,
                                     jnp.where(aB > 0, (st + 4) >> 3, 128)))
            pred = jnp.where((mode == 2)[:, None], dc[:, None], dirp)
            res = ryf[:, r0:r0 + 8, c0:c0 + 8].reshape(N, 64)
            recon = jnp.clip(pred + res, 0, 255).reshape(N, 8, 8)
            act = (act_mb & is_i8)[:, None, None]
            Xf = Xf.at[:, r0:r0 + 8, c0:c0 + 8].set(
                jnp.where(act, recon, Xf[:, r0:r0 + 8, c0:c0 + 8]))

        # ---- I16x16 -----------------------------------------------------
        m = i16m
        mode = m & 3
        aA, aB = (m >> 4) & 1, (m >> 5) & 1
        t = jnp.where((aB > 0)[:, None], T, 0)
        l = jnp.where((aA > 0)[:, None], Lc, 0)
        nb = jnp.concatenate([l[:, ::-1], TLp[:, None], t], 1)
        dirp = _dir_matmul(nb, _W16, jnp.clip(mode, 0, 1), 2, 256)
        st, sl = t.sum(1), l.sum(1)
        dc = jnp.where((aA & aB) > 0, (st + sl + 16) >> 5,
                       jnp.where(aA > 0, (sl + 8) >> 4,
                                 jnp.where(aB > 0, (st + 8) >> 4, 128)))
        hs = _plane_sums(nb, _I16_HP, _I16_HM, 8)
        vs = _plane_sums(nb, _I16_VP, _I16_VM, 8)
        a = 16 * (nb[:, 0] + nb[:, 32])
        b_ = (5 * hs + 32) >> 6
        c_ = (5 * vs + 32) >> 6
        plane = jnp.clip(
            (a[:, None] + b_[:, None] * (xx16.reshape(-1) - 7)[None, :]
             + c_[:, None] * (yy16.reshape(-1) - 7)[None, :] + 16) >> 5,
            0, 255)
        pred = jnp.where((mode == 2)[:, None], dc[:, None],
                         jnp.where((mode == 3)[:, None], plane, dirp))
        recon = jnp.clip(pred + ryf.reshape(N, 256), 0,
                         255).reshape(N, 16, 16)
        act = (act_mb & is_i16)[:, None, None]
        Xf = jnp.where(act, recon, Xf)
        if has_pcm:
            Xf = jnp.where((act_mb & is_pcm)[:, None, None], pyf, Xf)

        # ---- chroma -----------------------------------------------------
        m = chm
        mode = m & 3
        aA, aB = (m >> 4) & 1, (m >> 5) & 1
        out_c = []
        for img, res_c, pcm_c in ((Xcbf, rcbf, pcbf if has_pcm else None),
                                  (Xcrf, rcrf, pcrf if has_pcm else None)):
            Tc, Lcc, _TRc, TLc = nbr_rows(img, 8)
            t = jnp.where((aB > 0)[:, None], Tc, 0)
            l = jnp.where((aA > 0)[:, None], Lcc, 0)
            nb = jnp.concatenate([l[:, ::-1], TLc[:, None], t], 1)
            dirp = _dir_matmul(nb, _WCH, jnp.clip(mode - 1, 0, 1), 2, 64)
            ts0, ts1 = t[:, :4].sum(1), t[:, 4:].sum(1)
            ls0, ls1 = l[:, :4].sum(1), l[:, 4:].sum(1)
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
                                      jnp.where(onlyB, (ts1 + 2) >> 2,
                                                128)))
            right = (xx8.reshape(-1) >= 4)[None, :]
            bottom = (yy8.reshape(-1) >= 4)[None, :]
            dcmap = jnp.where(
                bottom, jnp.where(right, q11[:, None], q10[:, None]),
                jnp.where(right, q01[:, None], q00[:, None]))
            hs = _plane_sums(nb, _CH_HP, _CH_HM, 4)
            vs = _plane_sums(nb, _CH_VP, _CH_VM, 4)
            a = 16 * (nb[:, 0] + nb[:, 16])
            b_ = (34 * hs + 32) >> 6
            c_ = (34 * vs + 32) >> 6
            plane = jnp.clip(
                (a[:, None] + b_[:, None] * (xx8.reshape(-1) - 3)[None, :]
                 + c_[:, None] * (yy8.reshape(-1) - 3)[None, :] + 16) >> 5,
                0, 255)
            pred = jnp.where((mode == 0)[:, None], dcmap,
                             jnp.where((mode == 3)[:, None], plane, dirp))
            recon = jnp.clip(pred + res_c.reshape(N, 64), 0,
                             255).reshape(N, 8, 8)
            img = jnp.where((act_mb & is_intra & ~is_pcm)[:, None, None],
                            recon, img)
            if has_pcm:
                img = jnp.where((act_mb & is_pcm)[:, None, None],
                                pcm_c, img)
            out_c.append(img)
        Xcbf, Xcrf = out_c

    return untile(Xf, 16), untile(Xcbf, 8), untile(Xcrf, 8)


def intra_scan(y, cb, cr, res_y, res_cb, res_cr, p, tables):
    """Reconstruct all intra macroblocks in wavefront order.  y/cb/cr are
    the working images (int32) holding inter/initial content."""
    mxs_t, mys_t, valid_t = tables
    i4idx = jnp.asarray(I4_IDX)
    i16idx = jnp.asarray(I16_DIR_IDX)
    chidx = jnp.asarray(CH_DIR_IDX)
    blk4x = jnp.asarray(BLK4_X)
    blk4y = jnp.asarray(BLK4_Y)
    flags_pl = p["mb_flags"]
    i4m_pl = p["i4_modes"]
    i16m_pl = p["i16_modes"]
    chm_pl = p["ch_modes"]
    xx16 = jnp.tile(jnp.arange(16, dtype=I32), (16,)).reshape(16, 16)
    yy16 = xx16.T
    xx8 = jnp.tile(jnp.arange(8, dtype=I32), (8,)).reshape(8, 8)
    yy8 = xx8.T
    r4 = jnp.arange(4, dtype=I32)
    r8 = jnp.arange(8, dtype=I32)
    r16 = jnp.arange(16, dtype=I32)

    def step(carry, xs):
        y, cb, cr = carry
        mxs, mys, val = xs
        flags = flags_pl[mys, mxs]
        is_pcm = (flags & MBF_IPCM) > 0
        is_i16 = (flags & MBF_I16x16) > 0
        is_t8 = (flags & MBF_T8x8) > 0
        is_intra = (flags & MBF_INTRA) > 0
        is_i4 = is_intra & ~is_i16 & ~is_pcm & ~is_t8

        # ---- I4x4 luma: 16 quad-order substeps --------------------------
        def sub(k, y):
            bx, by = blk4x[k], blk4y[k]
            px0 = mxs * 16 + bx * 4
            py0 = mys * 16 + by * 4
            m = i4m_pl[mys * 4 + by, mxs * 4 + bx]
            mode = m & 15
            aA, aB = (m >> 4) & 1, (m >> 5) & 1
            aC = (m >> 6) & 1
            t = _gather2(y, (py0 - 1)[:, None], px0[:, None] + r8[None, :])
            t = jnp.concatenate(
                [t[:, :4],
                 jnp.where((aC > 0)[:, None], t[:, 4:], t[:, 3:4])], axis=1)
            l = _gather2(y, py0[:, None] + r4[None, :], (px0 - 1)[:, None])
            tl = _gather2(y, py0 - 1, px0 - 1)
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], axis=1)
            dirp = _tap3(nb, i4idx[mode])
            sA, sB = l.sum(1), t[:, :4].sum(1)
            dc = jnp.where((aA & aB) > 0, (sA + sB + 4) >> 3,
                           jnp.where(aA > 0, (sA + 2) >> 2,
                                     jnp.where(aB > 0, (sB + 2) >> 2, 128)))
            pred = jnp.where((mode == 2)[:, None], dc[:, None], dirp)
            rows = py0[:, None] + (jnp.arange(16, dtype=I32) // 4)[None, :]
            cols = px0[:, None] + (jnp.arange(16, dtype=I32) % 4)[None, :]
            res = _gather2(res_y, rows, cols)
            recon = jnp.clip(pred + res, 0, 255)
            return _scatter2(y, rows, cols, recon, val & is_i4)

        y = lax.fori_loop(0, 16, sub, y)

        # ---- Intra_8x8 luma: 4 quad-order substeps ----------------------
        is_i8 = is_intra & is_t8 & ~is_pcm
        i8m_pl = p["i8_modes"]
        i8idx = jnp.asarray(I8_IDX)
        fidx = jnp.asarray(I8_FILT_IDX)
        r16b = jnp.arange(16, dtype=I32)
        xx8b = jnp.tile(jnp.arange(8, dtype=I32), (8,)).reshape(8, 8)
        yy8b = xx8b.T

        def sub8(b, y):
            bx8, by8 = b & 1, b >> 1
            px0 = mxs * 16 + bx8 * 8
            py0 = mys * 16 + by8 * 8
            mm = i8m_pl[mys * 2 + by8, mxs * 2 + bx8]
            mode = mm & 15
            aA, aB = (mm >> 4) & 1, (mm >> 5) & 1
            aC, aD = (mm >> 6) & 1, (mm >> 7) & 1
            t = _gather2(y, (py0 - 1)[:, None], px0[:, None] + r16b[None, :])
            t = jnp.concatenate(
                [t[:, :8],
                 jnp.where((aC > 0)[:, None], t[:, 8:], t[:, 7:8])], axis=1)
            l = _gather2(y, py0[:, None] + r8[None, :], (px0 - 1)[:, None])
            tl = _gather2(y, py0 - 1, px0 - 1)
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], axis=1)
            # §8.3.2.2.1 reference lowpass: 3-tap gather + boundary patches
            a0 = jnp.take_along_axis(nb, fidx[None, :, 0].repeat(nb.shape[0],
                                                                0), 1)
            a1 = jnp.take_along_axis(nb, fidx[None, :, 1].repeat(nb.shape[0],
                                                                0), 1)
            a2 = jnp.take_along_axis(nb, fidx[None, :, 2].repeat(nb.shape[0],
                                                                0), 1)
            nbf = (a0 + 2 * a1 + a2 + 2) >> 2
            l0, t0, t1, l1 = nb[:, 7], nb[:, 9], nb[:, 10], nb[:, 6]
            tl0 = nb[:, 8]
            t0f = jnp.where(aD > 0, (tl0 + 2 * t0 + t1 + 2) >> 2,
                            (3 * t0 + t1 + 2) >> 2)
            l0f = jnp.where(aD > 0, (tl0 + 2 * l0 + l1 + 2) >> 2,
                            (3 * l0 + l1 + 2) >> 2)
            tlf = jnp.where(
                aD == 0, tl0,
                jnp.where((aA & aB) > 0, (t0 + 2 * tl0 + l0 + 2) >> 2,
                          jnp.where(aB > 0, (3 * tl0 + t0 + 2) >> 2,
                                    jnp.where(aA > 0, (3 * tl0 + l0 + 2) >> 2,
                                              tl0))))
            nbf = nbf.at[:, 9].set(t0f).at[:, 7].set(l0f).at[:, 8].set(tlf)
            # unfiltered sides when the corresponding edge is unavailable
            nbf = jnp.where((aB > 0)[:, None],
                            jnp.concatenate([nbf[:, :9], nbf[:, 9:]], 1),
                            jnp.concatenate([nbf[:, :9], nb[:, 9:]], 1))
            nbf = jnp.where((aA > 0)[:, None],
                            nbf,
                            jnp.concatenate([nb[:, :8], nbf[:, 8:]], 1))
            dirp = _tap3(nbf, i8idx[mode])
            st = jnp.where((aB > 0), nbf[:, 9:17].sum(1), 0)
            sl = jnp.where((aA > 0), nbf[:, :8].sum(1), 0)
            dc = jnp.where((aA & aB) > 0, (st + sl + 8) >> 4,
                           jnp.where(aA > 0, (sl + 4) >> 3,
                                     jnp.where(aB > 0, (st + 4) >> 3, 128)))
            pred = jnp.where((mode == 2)[:, None], dc[:, None], dirp)
            rows = py0[:, None] + yy8b.reshape(-1)[None, :]
            cols = px0[:, None] + xx8b.reshape(-1)[None, :]
            res = _gather2(res_y, rows, cols)
            recon = jnp.clip(pred + res, 0, 255)
            return _scatter2(y, rows, cols, recon, val & is_i8)

        y = lax.fori_loop(0, 4, sub8, y)

        # ---- I16x16 luma ------------------------------------------------
        px0, py0 = mxs * 16, mys * 16
        m = i16m_pl[mys, mxs]
        mode = m & 3
        aA, aB = (m >> 4) & 1, (m >> 5) & 1
        t = _gather2(y, (py0 - 1)[:, None], px0[:, None] + r16[None, :])
        l = _gather2(y, py0[:, None] + r16[None, :], (px0 - 1)[:, None])
        tl = _gather2(y, py0 - 1, px0 - 1)
        t = jnp.where((aB > 0)[:, None], t, 0)
        l = jnp.where((aA > 0)[:, None], l, 0)
        nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], axis=1)
        dirp = _tap3(nb, i16idx[jnp.clip(mode, 0, 1)])
        st, sl = t.sum(1), l.sum(1)
        dc = jnp.where((aA & aB) > 0, (st + sl + 16) >> 5,
                       jnp.where(aA > 0, (sl + 8) >> 4,
                                 jnp.where(aB > 0, (st + 8) >> 4, 128)))
        hs = _plane_sums(nb, _I16_HP, _I16_HM, 8)
        vs = _plane_sums(nb, _I16_VP, _I16_VM, 8)
        a = 16 * (nb[:, 0] + nb[:, 32])
        b = (5 * hs + 32) >> 6
        c = (5 * vs + 32) >> 6
        plane = jnp.clip(
            (a[:, None] + b[:, None] * (xx16.reshape(-1) - 7)[None, :]
             + c[:, None] * (yy16.reshape(-1) - 7)[None, :] + 16) >> 5, 0, 255)
        pred = jnp.where((mode == 2)[:, None], dc[:, None],
                         jnp.where((mode == 3)[:, None], plane, dirp))
        rows = py0[:, None] + yy16.reshape(-1)[None, :]
        cols = px0[:, None] + xx16.reshape(-1)[None, :]
        res = _gather2(res_y, rows, cols)
        recon = jnp.clip(pred + res, 0, 255)
        y = _scatter2(y, rows, cols, recon, val & is_i16)

        # ---- I_PCM ------------------------------------------------------
        pcm = _gather2(p["pcm_y"], rows, cols)
        y = _scatter2(y, rows, cols, pcm, val & is_pcm)

        # ---- chroma (all intra mbs; PCM overwrites) ---------------------
        cx0, cy0 = mxs * 8, mys * 8
        crows = cy0[:, None] + yy8.reshape(-1)[None, :]
        ccols = cx0[:, None] + xx8.reshape(-1)[None, :]
        m = chm_pl[mys, mxs]
        mode = m & 3
        aA, aB = (m >> 4) & 1, (m >> 5) & 1
        out_c = []
        for img, res_c, pcm_c in ((cb, res_cb, p["pcm_c"][0]),
                                  (cr, res_cr, p["pcm_c"][1])):
            t = _gather2(img, (cy0 - 1)[:, None], cx0[:, None] + r8[None, :])
            l = _gather2(img, cy0[:, None] + r8[None, :], (cx0 - 1)[:, None])
            tl = _gather2(img, cy0 - 1, cx0 - 1)
            t = jnp.where((aB > 0)[:, None], t, 0)
            l = jnp.where((aA > 0)[:, None], l, 0)
            nb = jnp.concatenate([l[:, ::-1], tl[:, None], t], axis=1)
            dirp = _tap3(nb, chidx[jnp.clip(mode - 1, 0, 1)])
            ts0, ts1 = t[:, :4].sum(1), t[:, 4:].sum(1)
            ls0, ls1 = l[:, :4].sum(1), l[:, 4:].sum(1)
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
            right = (xx8.reshape(-1) >= 4)[None, :]
            bottom = (yy8.reshape(-1) >= 4)[None, :]
            dcmap = jnp.where(
                bottom, jnp.where(right, q11[:, None], q10[:, None]),
                jnp.where(right, q01[:, None], q00[:, None]))
            hs = _plane_sums(nb, _CH_HP, _CH_HM, 4)
            vs = _plane_sums(nb, _CH_VP, _CH_VM, 4)
            a = 16 * (nb[:, 0] + nb[:, 16])
            b = (34 * hs + 32) >> 6
            c = (34 * vs + 32) >> 6
            plane = jnp.clip(
                (a[:, None] + b[:, None] * (xx8.reshape(-1) - 3)[None, :]
                 + c[:, None] * (yy8.reshape(-1) - 3)[None, :] + 16) >> 5,
                0, 255)
            pred = jnp.where((mode == 0)[:, None], dcmap,
                             jnp.where((mode == 3)[:, None], plane, dirp))
            res = _gather2(res_c, crows, ccols)
            recon = jnp.clip(pred + res, 0, 255)
            img = _scatter2(img, crows, ccols, recon,
                            val & is_intra & ~is_pcm)
            pcmv = _gather2(pcm_c, crows, ccols)
            img = _scatter2(img, crows, ccols, pcmv, val & is_pcm)
            out_c.append(img)
        return (y, out_c[0], out_c[1]), None

    (y, cb, cr), _ = lax.scan(step, (y, cb, cr), (mxs_t, mys_t, valid_t))
    return y, cb, cr


# ---------------------------------------------------------------------------
# Deblocking: batched bS + wave scan filtering

def _far(a, b):
    return (jnp.abs(a[..., 0] - b[..., 0]) >= 4) | \
           (jnp.abs(a[..., 1] - b[..., 1]) >= 4)


def deblock_bs(p):
    """Boundary strengths for every 4x4 block's left edge (bs_v) and top
    edge (bs_h), fully batched (§8.7.2.1).  All per-component arrays are
    kept as separate [BH,BW] planes: trailing size-2 axes would waste 64x
    of every vector op under the TPU's (8,128) tiling."""
    flags = p["mb_flags"]
    intra_blk = _mb_to_blk4((flags & MBF_INTRA) > 0)
    nz = p["nz_y"] > 0
    # transform_size_8x8 mbs: the 8x8 block's flag covers all 4 cells
    BHn, BWn = nz.shape
    nz8 = nz.reshape(BHn // 2, 2, BWn // 2, 2).any(axis=(1, 3))
    nz8 = jnp.repeat(jnp.repeat(nz8, 2, 0), 2, 1)
    t8_blk = _mb_to_blk4((flags & MBF_T8x8) > 0)
    nz = jnp.where(t8_blk, nz8, nz)
    rs0, rs1 = p["refslot"][..., 0], p["refslot"][..., 1]
    m0x, m0y = p["mvs"][..., 0, 0], p["mvs"][..., 0, 1]
    m1x, m1y = p["mvs"][..., 1, 0], p["mvs"][..., 1, 1]
    u0, u1 = rs0 >= 0, rs1 >= 0
    cnt = u0.astype(I32) + u1.astype(I32)
    r0 = jnp.where(u0, rs0, 99)
    r1 = jnp.where(u1, rs1, 99)
    lo = jnp.minimum(r0, r1)
    hi = jnp.maximum(r0, r1)
    sx = jnp.where(u0, m0x, m1x)
    sy = jnp.where(u0, m0y, m1y)

    BH, BW = nz.shape
    gbx = jax.lax.broadcasted_iota(I32, (BH, BW), 1)
    gby = jax.lax.broadcasted_iota(I32, (BH, BW), 0)

    def far(ax, ay, bx, by):
        return (jnp.abs(ax - bx) >= 4) | (jnp.abs(ay - by) >= 4)

    def one_dir(axis):
        sh = functools.partial(jnp.roll, shift=1, axis=axis)
        mb_edge = (gbx % 4 == 0) if axis == 1 else (gby % 4 == 0)
        intra_e = intra_blk | sh(intra_blk)
        nz_e = nz | sh(nz)
        refs_diff = (sh(cnt) != cnt) | (sh(lo) != lo) | (sh(hi) != hi)
        p0x, p0y, p1x, p1y = sh(m0x), sh(m0y), sh(m1x), sh(m1y)
        f_single = far(sh(sx), sh(sy), sx, sy)
        c0 = sh(rs0) == rs0
        q0x = jnp.where(c0, m0x, m1x)
        q0y = jnp.where(c0, m0y, m1y)
        q1x = jnp.where(c0, m1x, m0x)
        q1y = jnp.where(c0, m1y, m0y)
        f_bi_distinct = far(p0x, p0y, q0x, q0y) | far(p1x, p1y, q1x, q1y)
        pair_a = ~far(p0x, p0y, m0x, m0y) & ~far(p1x, p1y, m1x, m1y)
        pair_b = ~far(p0x, p0y, m1x, m1y) & ~far(p1x, p1y, m0x, m0y)
        f_bi = jnp.where(sh(rs0) != sh(rs1), f_bi_distinct,
                         ~(pair_a | pair_b))
        f_mv = jnp.where(sh(cnt) == 1, f_single, f_bi)
        bs_mv = jnp.where(refs_diff | f_mv, 1, 0)
        return jnp.where(intra_e, jnp.where(mb_edge, 4, 3),
                         jnp.where(nz_e, 2, bs_mv)).astype(I32)

    return one_dir(1), one_dir(0)


def _filter_luma_lines(S, alpha, beta, bs, tc0, active, axis=-1):
    """§8.7.2.3/.4 on S = [p3..p0, q0..q3] per line, sample index along
    `axis` ([L, n, 8] for axis=-1, [L, 8, n] for axis=1 -- the latter
    avoids two relayout transposes per horizontal edge).
    alpha/beta [L], bs/tc0 [L, n], active [L, n].  Returns the 6 middle
    samples' new values (p2 p1 p0 q0 q1 q2) along the same axis."""
    take = lambda k: lax.index_in_dim(S, k, S.ndim + axis if axis < 0
                                      else axis, keepdims=False)
    p3, p2, p1, p0 = take(0), take(1), take(2), take(3)
    q0, q1, q2, q3 = take(4), take(5), take(6), take(7)
    al, be = alpha[:, None], beta[:, None]
    filt = active & (bs > 0) & (jnp.abs(p0 - q0) < al) & \
        (jnp.abs(p1 - p0) < be) & (jnp.abs(q1 - q0) < be)
    ap = jnp.abs(p2 - p0) < be
    aq = jnp.abs(q2 - q0) < be
    # strong (bS=4)
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
    # soft (bS<4)
    tc = tc0 + ap + aq
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    wp0 = jnp.clip(p0 + delta, 0, 255)
    wq0 = jnp.clip(q0 - delta, 0, 255)
    avg = (p0 + q0 + 1) >> 1
    wp1 = jnp.where(ap, p1 + jnp.clip((p2 + avg - 2 * p1) >> 1, -tc0, tc0), p1)
    wq1 = jnp.where(aq, q1 + jnp.clip((q2 + avg - 2 * q1) >> 1, -tc0, tc0), q1)
    s4 = bs == 4
    np0 = jnp.where(s4, sp0, wp0)
    np1 = jnp.where(s4, sp1, wp1)
    np2 = jnp.where(s4, sp2, p2)
    nq0 = jnp.where(s4, sq0, wq0)
    nq1 = jnp.where(s4, sq1, wq1)
    nq2 = jnp.where(s4, sq2, q2)
    out = jnp.stack([np2, np1, np0, nq0, nq1, nq2], axis=axis)
    if axis == -1:
        return jnp.where(filt[..., None], out, S[..., 1:7])
    return jnp.where(filt[:, None, :], out, S[:, 1:7, :])


def _filter_chroma_lines(S, alpha, beta, bs, tc0, active, axis=-1):
    """Chroma: S = [p1 p0 q0 q1] along `axis`; returns the 2 middle
    samples."""
    take = lambda k: lax.index_in_dim(S, k, S.ndim + axis if axis < 0
                                      else axis, keepdims=False)
    p1, p0, q0, q1 = take(0), take(1), take(2), take(3)
    al, be = alpha[:, None], beta[:, None]
    filt = active & (bs > 0) & (jnp.abs(p0 - q0) < al) & \
        (jnp.abs(p1 - p0) < be) & (jnp.abs(q1 - q0) < be)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    tc = tc0 + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    wp0 = jnp.clip(p0 + delta, 0, 255)
    wq0 = jnp.clip(q0 - delta, 0, 255)
    s4 = bs == 4
    out = jnp.stack([jnp.where(s4, sp0, wp0), jnp.where(s4, sq0, wq0)],
                    axis)
    if axis == -1:
        return jnp.where(filt[..., None], out, S[..., 1:3])
    return jnp.where(filt[:, None, :], out, S[:, 1:3, :])


# ---------------------------------------------------------------------------
# Sheared (skewed-layout) deblocking scan.
#
# The wavefront w = mb_x + 2*mb_y is materialized as the LEADING axis of a
# sheared tile tensor [NW, mbH, ts, ts]: the macroblocks of one wave are a
# single leading-axis slice, so the scan body runs entirely on small
# statically-sliced tiles — no scatter/gather over the frame (XLA scatter
# serializes on TPU; this layout replaced it and cut the wave step cost
# ~30x).  The step at wave w filters mb tiles X (wave w) against a rolling
# carry window A (wave w-1, left neighbours) and B (wave w-2, top
# neighbours); V-edge-0 writes back into A's last 3 columns and H-edge-0
# into B's last 3 rows, and B is emitted as final (its last writer is this
# step).


def _shear_tiles(img, mbW, mbH, ts, extra=2):
    """Dense [ts*mbH, ts*mbW] -> sheared [NW+extra, mbH, ts, ts]; the tile
    of mb (mx,my) lands at wave index mx + 2*my.

    Formulated as ONE gather (advanced indexing over the mb-x axis): the
    per-row pad/stack version emitted O(mbH) HLO ops, which at 1080p
    (mbH=68, many planes) pushed XLA compile times into minutes."""
    NW = mbW + 2 * mbH - 2
    T = NW + extra
    tiles = img.reshape(mbH, ts, mbW, ts).transpose(0, 2, 1, 3)
    w = jnp.arange(T)[:, None]                   # [T, 1]
    my = jnp.arange(mbH)[None, :]                # [1, mbH]
    mx = w - 2 * my                              # [T, mbH]
    valid = (mx >= 0) & (mx < mbW)
    out = tiles[my, jnp.clip(mx, 0, mbW - 1)]    # [T, mbH, ts, ts]
    return jnp.where(valid[..., None, None], out, 0)


def _unshear_tiles(t, mbW, mbH, ts, shift=2):
    """Inverse of _shear_tiles for tiles emitted with a wave delay."""
    my = jnp.arange(mbH)[:, None]                # [mbH, 1]
    mx = jnp.arange(mbW)[None, :]                # [1, mbW]
    w = mx + 2 * my + shift                      # [mbH, mbW]
    d = t[w, my]                                 # [mbH, mbW, ts, ts]
    return d.transpose(0, 2, 1, 3).reshape(mbH * ts, mbW * ts)


def _shear_plane(pl, mbW, mbH, extra=2):
    """[mbH, mbW, ...] per-mb data -> [NW+extra, mbH, ...] (one gather)."""
    T = mbW + 2 * mbH - 2 + extra
    w = jnp.arange(T)[:, None]
    my = jnp.arange(mbH)[None, :]
    mx = w - 2 * my
    valid = (mx >= 0) & (mx < mbW)
    out = pl[my, jnp.clip(mx, 0, mbW - 1)]       # [T, mbH, ...]
    vshape = valid.shape + (1,) * (out.ndim - 2)
    return jnp.where(valid.reshape(vshape), out, 0)


def deblock_scan(y, cb, cr, p, bs_v, bs_h, mbW, mbH):
    """Apply the deblocking filter in wavefront order over sheared tiles
    (per-mb V edges then H edges, §8.7; reference edge264_deblock.c)."""
    alpha_t = jnp.asarray(_ALPHA)
    beta_t = jnp.asarray(_BETA)
    tc0_t = jnp.asarray(_TC0)
    NW = mbW + 2 * mbH - 2
    T = NW + 2

    valid = np.zeros((T, mbH), bool)
    for s in range(T):
        my = np.arange(mbH)
        mx = s - 2 * my
        valid[s] = (0 <= mx) & (mx < mbW)
    val_t = jnp.asarray(valid)

    Xy_t = _shear_tiles(y, mbW, mbH, 16)
    Xcb_t = _shear_tiles(cb, mbW, mbH, 8)
    Xcr_t = _shear_tiles(cr, mbW, mbH, 8)
    bsv_t = _shear_tiles(bs_v, mbW, mbH, 4)      # [T,mbH,seg,e]
    bsh_t = _shear_tiles(bs_h, mbW, mbH, 4)      # [T,mbH,e,seg]
    qp_t = _shear_plane(p["qp"], mbW, mbH)       # [T,mbH,4]
    qpl_t = jnp.concatenate([jnp.zeros_like(qp_t[:1]), qp_t[:-1]], 0)
    qpt_shift = jnp.concatenate([jnp.zeros_like(qp_t[:2]), qp_t[:-2]], 0)
    qpt_t = jnp.concatenate(
        [jnp.zeros_like(qpt_shift[:, :1]), qpt_shift[:, :-1]], 1)
    db_t = _shear_plane(p["deblock"], mbW, mbH)
    ab_t = _shear_plane(p["deblock_ab"], mbW, mbH)
    t8_t = _shear_plane((p["mb_flags"] & MBF_T8x8) > 0, mbW, mbH)

    ones16 = jnp.ones((1, 16), bool)
    ones8 = jnp.ones((1, 8), bool)

    def tc0_sel(bs, ia):
        """tc0 lookup without 2D gather: 3 per-lane gathers + select."""
        t3 = tc0_t[:, ia]                        # [3, L]
        z = jnp.zeros_like(bs)
        return jnp.where(bs == 0, z,
                         jnp.where(bs == 1, t3[0][:, None],
                                   jnp.where(bs == 2, t3[1][:, None],
                                             t3[2][:, None])))

    def step(carry, xs):
        A_y, A_cb, A_cr, B_y, B_cb, B_cr = carry
        (Xy, Xcb, Xcr, bsv, bsh, qpo, qpl, qpt, db, ab, t8, val) = xs
        offA, offB = ab[:, 0], ab[:, 1]
        Bts_y = jnp.concatenate([jnp.zeros_like(B_y[:1]), B_y[:-1]], 0)
        Bts_cb = jnp.concatenate([jnp.zeros_like(B_cb[:1]), B_cb[:-1]], 0)
        Bts_cr = jnp.concatenate([jnp.zeros_like(B_cr[:1]), B_cr[:-1]], 0)

        def edge_params(qpp, qpq, comp_bs, act, nseg):
            ia = jnp.clip(((qpp + qpq + 1) >> 1) + offA, 0, 51)
            ib = jnp.clip(((qpp + qpq + 1) >> 1) + offB, 0, 51)
            alpha, beta = alpha_t[ia], beta_t[ib]
            bs = jnp.repeat(comp_bs, nseg // 4, axis=1)
            tc0 = tc0_sel(bs, ia)
            actm = act[:, None] & (ones16 if nseg == 16 else ones8)
            return alpha, beta, bs, tc0, actm

        # ---- luma V edges ----------------------------------------------
        W = jnp.concatenate([A_y[:, :, 12:16], Xy], axis=2)
        for e in range(4):
            if e == 0:
                act = val & ((db & DBF_LEFT) > 0)
                qpp = qpl[:, 0]
            else:
                act = val & ((db & DBF_INNER) > 0)
                if e % 2:
                    act = act & ~t8
                qpp = qpo[:, 0]
            alpha, beta, bs, tc0, actm = edge_params(
                qpp, qpo[:, 0], bsv[:, :, e], act, 16)
            S = W[:, :, 4 * e:4 * e + 8]
            new = _filter_luma_lines(S, alpha, beta, bs, tc0, actm)
            W = W.at[:, :, 4 * e + 1:4 * e + 7].set(new)
        A_y = A_y.at[:, :, 13:16].set(W[:, :, 1:4])
        Xy = W[:, :, 4:20]

        # ---- chroma V edges --------------------------------------------
        new_c = []
        for comp, (A_c, X_c) in enumerate(((A_cb, Xcb), (A_cr, Xcr)), 1):
            Wc = jnp.concatenate([A_c[:, :, 6:8], X_c], axis=2)
            for e in (0, 2):
                if e == 0:
                    act = val & ((db & DBF_LEFT) > 0)
                    qpp = qpl[:, comp]
                else:
                    act = val & ((db & DBF_INNER) > 0)
                    qpp = qpo[:, comp]
                alpha, beta, bs, tc0, actm = edge_params(
                    qpp, qpo[:, comp], bsv[:, :, e], act, 8)
                S = Wc[:, :, 2 * e:2 * e + 4]
                new = _filter_chroma_lines(S, alpha, beta, bs, tc0, actm)
                Wc = Wc.at[:, :, 2 * e + 1:2 * e + 3].set(new)
            A_c = A_c.at[:, :, 6:8].set(Wc[:, :, 0:2])
            new_c.append((A_c, Wc[:, :, 2:10]))
        (A_cb, Xcb), (A_cr, Xcr) = new_c

        # ---- luma H edges ----------------------------------------------
        V = jnp.concatenate([Bts_y[:, 12:16, :], Xy], axis=1)
        for e in range(4):
            if e == 0:
                act = val & ((db & DBF_TOP) > 0)
                qpp = qpt[:, 0]
            else:
                act = val & ((db & DBF_INNER) > 0)
                if e % 2:
                    act = act & ~t8
                qpp = qpo[:, 0]
            alpha, beta, bs, tc0, actm = edge_params(
                qpp, qpo[:, 0], bsh[:, e, :], act, 16)
            S = V[:, 4 * e:4 * e + 8, :]
            new = _filter_luma_lines(S, alpha, beta, bs, tc0, actm, axis=1)
            V = V.at[:, 4 * e + 1:4 * e + 7, :].set(new)
        Bts_y = Bts_y.at[:, 13:16, :].set(V[:, 1:4, :])
        Xy = V[:, 4:20, :]

        # ---- chroma H edges --------------------------------------------
        new_c = []
        for comp, (Bts_c, X_c) in enumerate(((Bts_cb, Xcb),
                                             (Bts_cr, Xcr)), 1):
            Vc = jnp.concatenate([Bts_c[:, 6:8, :], X_c], axis=1)
            for e in (0, 2):
                if e == 0:
                    act = val & ((db & DBF_TOP) > 0)
                    qpp = qpt[:, comp]
                else:
                    act = val & ((db & DBF_INNER) > 0)
                    qpp = qpo[:, comp]
                alpha, beta, bs, tc0, actm = edge_params(
                    qpp, qpo[:, comp], bsh[:, e, :], act, 8)
                S = Vc[:, 2 * e:2 * e + 4, :]
                new = _filter_chroma_lines(S, alpha, beta, bs, tc0, actm,
                                           axis=1)
                Vc = Vc.at[:, 2 * e + 1:2 * e + 3, :].set(new)
            Bts_c = Bts_c.at[:, 6:8, :].set(Vc[:, 0:2, :])
            new_c.append((Bts_c, Vc[:, 2:10, :]))
        (Bts_cb, Xcb), (Bts_cr, Xcr) = new_c

        B_out_y = jnp.concatenate([Bts_y[1:], B_y[-1:]], 0)
        B_out_cb = jnp.concatenate([Bts_cb[1:], B_cb[-1:]], 0)
        B_out_cr = jnp.concatenate([Bts_cr[1:], B_cr[-1:]], 0)
        return (Xy, Xcb, Xcr, A_y, A_cb, A_cr), \
            (B_out_y, B_out_cb, B_out_cr)

    z_y = jnp.zeros((mbH, 16, 16), I32)
    z_c = jnp.zeros((mbH, 8, 8), I32)
    carry0 = (z_y, z_c, z_c, z_y, z_c, z_c)
    xs = (Xy_t, Xcb_t, Xcr_t, bsv_t, bsh_t, qp_t, qpl_t, qpt_t,
          db_t, ab_t, t8_t, val_t)
    _, (ey, ecb, ecr) = lax.scan(step, carry0, xs)
    y = _unshear_tiles(ey, mbW, mbH, 16)
    cb = _unshear_tiles(ecb, mbW, mbH, 8)
    cr = _unshear_tiles(ecr, mbW, mbH, 8)
    return y, cb, cr


def _deblock_scan_gather(y, cb, cr, p, bs_v, bs_h, tables):
    """Gather/scatter formulation (superseded by the sheared scan; kept as
    the readable reference of the edge schedule)."""
    mxs_t, mys_t, valid_t = tables
    alpha_t = jnp.asarray(_ALPHA)
    beta_t = jnp.asarray(_BETA)
    tc0_t = jnp.asarray(_TC0)
    qp_pl = p["qp"]
    db_pl = p["deblock"]
    ab_pl = p["deblock_ab"]
    flags_pl = p["mb_flags"]
    r8 = jnp.arange(8, dtype=I32)
    r16 = jnp.arange(16, dtype=I32)
    seg16 = jnp.arange(16, dtype=I32) // 4
    seg8 = jnp.arange(8, dtype=I32) >> 1

    def step(carry, xs):
        y, cb, cr = carry
        mxs, mys, val = xs
        db = db_pl[mys, mxs]
        offA = ab_pl[mys, mxs, 0]
        offB = ab_pl[mys, mxs, 1]
        t8 = (flags_pl[mys, mxs] & MBF_T8x8) > 0

        def luma_edge(y, e, vertical):
            if e == 0:
                act = val & ((db & (DBF_LEFT if vertical else DBF_TOP)) > 0)
                pmx = mxs - (1 if vertical else 0)
                pmy = mys - (0 if vertical else 1)
            else:
                act = val & ((db & DBF_INNER) > 0)
                if e % 2:
                    act = act & ~t8
                pmx, pmy = mxs, mys
            qpp = qp_pl[pmy, pmx, 0]
            qpq = qp_pl[mys, mxs, 0]
            ia = jnp.clip(((qpp + qpq + 1) >> 1) + offA, 0, 51)
            ib = jnp.clip(((qpp + qpq + 1) >> 1) + offB, 0, 51)
            alpha, beta = alpha_t[ia], beta_t[ib]
            if vertical:
                bs = bs_v[mys[:, None] * 4 + seg16[None, :],
                          (mxs * 4 + e)[:, None]]
            else:
                bs = bs_h[(mys * 4 + e)[:, None],
                          mxs[:, None] * 4 + seg16[None, :]]
            tc0 = jnp.where(bs > 0,
                            tc0_t[jnp.clip(bs - 1, 0, 2), ia[:, None]], 0)
            if vertical:
                rows = (mys * 16)[:, None, None] + r16[None, :, None]
                cols = (mxs * 16 + e * 4)[:, None, None] \
                    + (jnp.arange(8, dtype=I32) - 4)[None, None, :]
            else:
                rows = (mys * 16 + e * 4)[:, None, None] \
                    + (jnp.arange(8, dtype=I32) - 4)[None, None, :]
                cols = (mxs * 16)[:, None, None] + r16[None, :, None]
            S = _gather2(y, *jnp.broadcast_arrays(rows, cols))
            new = _filter_luma_lines(S, alpha, beta, bs, tc0,
                                     act[:, None] & jnp.ones_like(bs, bool))
            wrb, wcb = jnp.broadcast_arrays(
                rows[..., 1:7] if not vertical else rows,
                cols[..., 1:7] if vertical else cols)
            return _scatter2(y, wrb, wcb, new, act)

        def chroma_edge(img, comp, e, vertical):
            if e == 0:
                act = val & ((db & (DBF_LEFT if vertical else DBF_TOP)) > 0)
                pmx = mxs - (1 if vertical else 0)
                pmy = mys - (0 if vertical else 1)
            else:
                act = val & ((db & DBF_INNER) > 0)
                pmx, pmy = mxs, mys
            qpp = qp_pl[pmy, pmx, comp]
            qpq = qp_pl[mys, mxs, comp]
            ia = jnp.clip(((qpp + qpq + 1) >> 1) + offA, 0, 51)
            ib = jnp.clip(((qpp + qpq + 1) >> 1) + offB, 0, 51)
            alpha, beta = alpha_t[ia], beta_t[ib]
            if vertical:
                bs = bs_v[mys[:, None] * 4 + seg8[None, :],
                          (mxs * 4 + e)[:, None]]
            else:
                bs = bs_h[(mys * 4 + e)[:, None],
                          mxs[:, None] * 4 + seg8[None, :]]
            tc0 = jnp.where(bs > 0,
                            tc0_t[jnp.clip(bs - 1, 0, 2), ia[:, None]], 0)
            if vertical:
                rows = (mys * 8)[:, None, None] + r8[None, :, None]
                cols = (mxs * 8 + e * 2)[:, None, None] \
                    + (jnp.arange(4, dtype=I32) - 2)[None, None, :]
            else:
                rows = (mys * 8 + e * 2)[:, None, None] \
                    + (jnp.arange(4, dtype=I32) - 2)[None, None, :]
                cols = (mxs * 8)[:, None, None] + r8[None, :, None]
            S = _gather2(img, *jnp.broadcast_arrays(rows, cols))
            new = _filter_chroma_lines(S, alpha, beta, bs, tc0,
                                       act[:, None] & jnp.ones_like(bs, bool))
            wrb, wcb = jnp.broadcast_arrays(
                rows[..., 1:3] if not vertical else rows,
                cols[..., 1:3] if vertical else cols)
            return _scatter2(img, wrb, wcb, new, act)

        for e in range(4):
            y = luma_edge(y, e, True)
        for e in (0, 2):
            cb = chroma_edge(cb, 1, e, True)
            cr = chroma_edge(cr, 2, e, True)
        for e in range(4):
            y = luma_edge(y, e, False)
        for e in (0, 2):
            cb = chroma_edge(cb, 1, e, False)
            cr = chroma_edge(cr, 2, e, False)
        return (y, cb, cr), None

    (y, cb, cr), _ = lax.scan(step, (y, cb, cr), (mxs_t, mys_t, valid_t))
    return y, cb, cr


# ---------------------------------------------------------------------------
# Whole-frame decode + backend

PLANE_KEYS = ["mb_flags", "qp", "i4_modes", "i16_modes", "i8_modes",
              "ch_modes",
              "coef_y", "coef_y8", "coef_y_dc", "coef_c_dc", "coef_cb",
              "coef_cr", "pcm_y", "pcm_c", "nz_y", "refslot", "mvs",
              "deblock", "deblock_ab", "wp", "wp8", "mb_errors",
              "slice_id"]


def blend_recovered(y, cb, cr, p):
    """Post-deblock blend of erroneous I mbs toward neighbour-edge DC,
    weighted by the graded error probability (recover_slice I path,
    edge264_headers.c:316-396).  Divergence from the reference: neighbour
    pixels are read PRE-blend so all mbs batch in one pass (the reference
    blends in raster order reading already-blended neighbours)."""
    bl = (p["mb_flags"] & MBF_BLEND) > 0          # [mbH, mbW]
    sid = p["slice_id"]
    w = jnp.clip(p["mb_errors"] * 128 // 100, 0, 128)
    shl = lambda a, fill: jnp.concatenate(
        [jnp.full_like(a[:, :1], fill), a[:, :-1]], 1)
    shu = lambda a, fill: jnp.concatenate(
        [jnp.full_like(a[:1], fill), a[:-1]], 0)
    # a neighbour supplies DC only if it was recovered by the same slice
    # (reference: i==0 / i<pic_width exclusions, :326-329)
    availA = bl & shl(bl, False) & (sid == shl(sid, -1))
    availB = bl & shu(bl, False) & (sid == shu(sid, -1))

    def one(img, ts):
        H, W = img.shape
        mh, mw = H // ts, W // ts
        cols = jnp.clip(jnp.arange(mw) * ts - 1, 0, W - 1)
        lsum = img[:, cols].reshape(mh, ts, mw).sum(1)      # [mh, mw]
        rows = jnp.clip(jnp.arange(mh) * ts - 1, 0, H - 1)
        tsum = img[rows].reshape(mh, mw, ts).sum(2)         # [mh, mw]
        none_sum = jnp.full_like(lsum, ts * 128)
        l = jnp.where(availA, lsum, jnp.where(availB, tsum, none_sum))
        t = jnp.where(availB, tsum,
                      jnp.where(availA, lsum, none_sum))
        # rounded mean of the 2*ts edge pixels
        sh_bits = ts.bit_length()                           # 16->5, 8->4
        dc = (l + t + ts) >> sh_bits                        # [mh, mw]
        wm = jnp.repeat(jnp.repeat(w, ts, 0), ts, 1)
        dcm = jnp.repeat(jnp.repeat(dc, ts, 0), ts, 1)
        blm = jnp.repeat(jnp.repeat(bl, ts, 0), ts, 1)
        mixed = jnp.where(wm >= 128, dcm,
                          (img * (128 - wm) + dcm * wm) >> 7)
        return jnp.where(blm, mixed, img)

    return one(y, 16), one(cb, 8), one(cr, 8)


def _decode_frame_impl(p, sm4, sm8, mbW, mbH, itab, mc=None,
                       has_t8=True, has_pcm=True):
    """Shared device pixel path: residuals [-> MC] -> intra -> deblock.
    mc: optional (stackL, stackC, slot_map, has_b) for inter frames."""
    norm4 = jnp.asarray(_o.NORM_ADJUST_4x4.reshape(6, 16))
    norm8 = jnp.asarray(_o.NORM_ADJUST_8x8.reshape(6, 64))
    res_y, res_cb, res_cr = residual_frame(p, sm4, sm8, norm4, norm8,
                                           has_t8)
    if mc is not None:
        stackL, stackC, slot_map, has_b = mc
        pred_y, pred_cb, pred_cr, mask_y, mask_c = mc_frame(
            p, stackL, stackC, slot_map, has_b)
        y = jnp.where(mask_y, jnp.clip(pred_y + res_y, 0, 255), 0)
        cb = jnp.where(mask_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
        cr = jnp.where(mask_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    else:
        y = jnp.zeros((16 * mbH, 16 * mbW), I32)
        cb = jnp.zeros((8 * mbH, 8 * mbW), I32)
        cr = jnp.zeros((8 * mbH, 8 * mbW), I32)
    if itab is not None:
        y, cb, cr = intra_scan(y, cb, cr, res_y, res_cb, res_cr, p, itab)
    else:
        y, cb, cr = intra_scan_sheared(y, cb, cr, res_y, res_cb, res_cr,
                                       p, mbW, mbH, has_t8, has_pcm)
    bs_v, bs_h = deblock_bs(p)
    y, cb, cr = deblock_scan(y, cb, cr, p, bs_v, bs_h, mbW, mbH)
    return y.astype(jnp.uint8), cb.astype(jnp.uint8), cr.astype(jnp.uint8)


# The device path is split into TWO jitted programs (reconstruct, then
# deblock): XLA compile time is superlinear in program size, and the two
# sheared wavefront scans in one graph pushed warmup compiles into the
# tens of minutes on the TPU AOT helper.  The split costs only one
# intermediate int32 frame in HBM.

def _dense_arena_impl(arena, sm4, sm8, mc_in=None, *, layout, mbW, mbH,
                      has_b=True):
    """Residual + (optional) MC: the dense stages."""
    p = _unpack_planes(arena, layout)
    present = {k for k, _, _, off, _m in layout if off != -1}
    has_t8 = "coef_y8" in present
    norm4 = jnp.asarray(_o.NORM_ADJUST_4x4.reshape(6, 16))
    norm8 = jnp.asarray(_o.NORM_ADJUST_8x8.reshape(6, 64))
    res_y, res_cb, res_cr = residual_frame(p, sm4, sm8, norm4, norm8,
                                           has_t8)
    if mc_in is not None:
        stackL, stackC, slot_map = mc_in
        from . import pallas_mc
        if use_pallas() and pallas_mc.fits_pallas(stackL):
            one = lambda a: a[None]                       # noqa: E731
            pred = pallas_mc.mc_frame_batch(
                {k: one(v) for k, v in p.items()}, one(stackL),
                one(stackC), one(slot_map), has_b, mbW, mbH)
            pred_y, pred_cb, pred_cr, mask_y, mask_c = (
                v[0] for v in pred)
        else:
            pred_y, pred_cb, pred_cr, mask_y, mask_c = mc_frame(
                p, stackL, stackC, slot_map, has_b)
        y = jnp.where(mask_y, jnp.clip(pred_y + res_y, 0, 255), 0)
        cb = jnp.where(mask_c, jnp.clip(pred_cb + res_cb, 0, 255), 0)
        cr = jnp.where(mask_c, jnp.clip(pred_cr + res_cr, 0, 255), 0)
    else:
        y = jnp.zeros((16 * mbH, 16 * mbW), I32)
        cb = jnp.zeros((8 * mbH, 8 * mbW), I32)
        cr = jnp.zeros((8 * mbH, 8 * mbW), I32)
    return y, cb, cr, res_y, res_cb, res_cr


def _intra_arena_impl(arena, y, cb, cr, res_y, res_cb, res_cr,
                      itab=None, *, layout, mbW, mbH):
    """Intra reconstruction wavefront."""
    p = _unpack_planes(arena, layout)
    present = {k for k, _, _, off, _m in layout if off != -1}
    if itab is not None:
        return intra_scan(y, cb, cr, res_y, res_cb, res_cr, p, itab)
    # The Mosaic intra kernel is RETIRED from the decode paths: it
    # intermittently faulted the chip on real 1080p content (interpret
    # mode is bit-exact; suspected Mosaic compiler issue in the
    # scratch-ref wavefront — ops/pallas_intra.py docstring and
    # tools/bisect_pallas_intra.py hold the investigation record), and
    # intra_rounds removed the sparse-step need for it.
    return intra_scan_sheared(y, cb, cr, res_y, res_cb, res_cr, p,
                              mbW, mbH, "coef_y8" in present,
                              "pcm_y" in present)


@functools.partial(jax.jit,
                   static_argnames=("layout", "mbW", "mbH", "has_b"))
def _recon_arena(arena, sm4, sm8, itab=None, mc_in=None, *, layout,
                 mbW, mbH, has_b=True):
    # dense + intra fused into ONE program: queueing a successor right
    # behind the dense program without a host sync crashes the axon TPU
    # worker (transport bug, bisected empirically); fusing removes the
    # adjacency and saves a dispatch.  The optimization barrier keeps XLA
    # from fusing the dense stage into the intra scan body — without it
    # the combined compile blows up superlinearly (36 min at 1080p vs
    # ~3 min for the parts).
    y, cb, cr, res_y, res_cb, res_cr = lax.optimization_barrier(
        _dense_arena_impl(arena, sm4, sm8, mc_in, layout=layout, mbW=mbW,
                          mbH=mbH, has_b=has_b))
    return _intra_arena_impl(arena, y, cb, cr, res_y, res_cb, res_cr,
                             itab, layout=layout, mbW=mbW, mbH=mbH)


_dense_arena = functools.partial(
    jax.jit,
    static_argnames=("layout", "mbW", "mbH", "has_b"))(_dense_arena_impl)
_intra_arena = functools.partial(
    jax.jit, static_argnames=("layout", "mbW", "mbH"))(_intra_arena_impl)


@functools.partial(jax.jit, static_argnames=("layout", "mbW", "mbH"))
def _deblock_arena(arena, y, cb, cr, *, layout, mbW, mbH):
    p = _unpack_planes(arena, layout)
    bs_v, bs_h = deblock_bs(p)
    # barrier: keep XLA from fusing the bS derivation into the Mosaic
    # call's operand chain (superlinear compile blowup at 1080p)
    bs_v, bs_h = lax.optimization_barrier((bs_v, bs_h))
    if use_pallas():
        from .pallas_deblock import deblock_pallas
        y, cb, cr = deblock_pallas(y, cb, cr, p, bs_v, bs_h, mbW, mbH)
    else:
        y, cb, cr = deblock_scan(y, cb, cr, p, bs_v, bs_h, mbW, mbH)
    present = {k for k, _, _, off, _m in layout if off != -1}
    if "mb_errors" in present:
        y, cb, cr = blend_recovered(y, cb, cr, p)
    return y.astype(jnp.uint8), cb.astype(jnp.uint8), cr.astype(jnp.uint8)


def decode_frame_arena(arena, sm4, sm8, itab=None, *, layout, mbW, mbH):
    """Arena-transfer intra-frame path (see pack_planes)."""
    y, cb, cr = _recon_arena(arena, sm4, sm8, itab, layout=layout,
                             mbW=mbW, mbH=mbH)
    return _deblock_arena(arena, y, cb, cr, layout=layout, mbW=mbW,
                          mbH=mbH)


def decode_frame_inter_arena(arena, sm4, sm8, stackL, stackC,
                             slot_map, itab=None, *, layout, mbW, mbH,
                             has_b=True):
    """Arena-transfer inter-frame path."""
    y, cb, cr = _recon_arena(arena, sm4, sm8, itab,
                             (stackL, stackC, slot_map), layout=layout,
                             mbW=mbW, mbH=mbH, has_b=has_b)
    return _deblock_arena(arena, y, cb, cr, layout=layout, mbW=mbW,
                          mbH=mbH)


@functools.partial(jax.jit, static_argnames=("mbW", "mbH"))
def decode_frame_jit(p, sm4, sm8, mbW, mbH, itab=None):
    """Full device pixel path for one frame: residuals -> intra wavefront
    -> deblock wavefront.  Returns (y, cb, cr) uint8 (mb-aligned).

    itab: optional level-compressed intra scan tables (mxs, mys, valid)
    from intra_level_tables(); defaults to the sheared wavefront scan."""
    p = _cast_planes(p)
    return _decode_frame_impl(p, sm4, sm8, mbW, mbH, itab)


def planes_to_jax(planes):
    """numpy syntax-plane views -> jnp dict in their native narrow dtypes;
    the device casts to int32 on entry (minimizes host->HBM traffic)."""
    p = {}
    for k in PLANE_KEYS:
        a = np.asarray(getattr(planes, k))
        if k == "coef_c_dc":
            a = a.reshape(a.shape[0], a.shape[1], 2, 4)
        p[k] = jnp.asarray(a)
    return p


# gatherable planes: key -> (native dirty tag Planes::DP_*, row elems).
# The native entropy pass records every coded coefficient block in the
# per-frame dirty list (its lazy-clear bookkeeping), which doubles as
# the free coded-row index for sparse shipping.
GAT_TAGS = {"coef_y": (0, 16), "coef_y8": (1, 64), "coef_y_dc": (2, 16),
            "coef_c_dc": (3, 8), "coef_cb": (4, 16), "coef_cr": (5, 16)}


# base+exception planes: per-4x4-cell data that is USUALLY uniform
# across its macroblock (single-partition inter mbs, skips, intra).
# Ships as a dense per-MB base (1/16 the cells) + exception rows for
# split mbs, gathered like the coefficient planes.  key -> per-cell
# element count.
BASE_EXC = {"mvs": 4, "refslot": 2}


def split_mb_idx(planes):
    """Per-plane sorted mb indices whose 4x4-cell field is NOT uniform
    within the mb (numpy scan; ~2 ms/frame at 1080p)."""
    H, W = planes.mb_h, planes.mb_w
    mv = np.asarray(planes.mvs).reshape(H, 4, W, 4, 4)
    uni_mv = (mv == mv[:, :1, :, :1]).all(axis=(1, 3, 4))
    rs = np.asarray(planes.refslot).reshape(H, 4, W, 4, 2)
    uni_rs = (rs == rs[:, :1, :, :1]).all(axis=(1, 3, 4))
    return {"mvs": np.flatnonzero(~uni_mv.reshape(-1)),
            "refslot": np.flatnonzero(~uni_rs.reshape(-1))}


def gat_masks(planes):
    """Per-plane SORTED UNIQUE coded-row indices from the native dirty
    list (int64 arrays — integer row gathers beat boolean masks by ~10x
    on the pack path), or None when the list is unreliable (dirty_all
    after a recovery)."""
    if getattr(planes, "dirty_all", True):
        return None
    d = planes.dirty
    tags = (d >> np.uint64(48)).astype(np.int32)
    offs = (d & np.uint64((1 << 48) - 1)).astype(np.int64)
    masks = {}
    for k, (tag, row_elems) in GAT_TAGS.items():
        masks[k] = np.unique(offs[tags == tag] // row_elems)
    return masks


COEF_PLANES = frozenset({"coef_y", "coef_y8", "coef_y_dc", "coef_c_dc",
                         "coef_cb", "coef_cr"})


def coef_fits_int8(planes) -> bool:
    """True when every residual level is in [-128, 127] (typical for all
    but very-high-bitrate content), so the coefficient planes can ship
    as int8 — they are ~3/4 of the packed arena's bytes.  Motion vectors
    stay int16: MVP accumulation routinely exceeds +/-127 quarter-pel
    even for modest per-mb mvds, so sharing their fate would disable the
    compaction on ordinary inter content."""
    for k in COEF_PLANES:
        a = np.asarray(getattr(planes, k))
        if int(a.max()) > 127 or int(a.min()) < -128:
            return False
    return True


def pack_planes(planes, keep=frozenset(), coef8=False):
    """Pack all syntax planes into ONE host buffer -> (arena uint8 jnp
    array, static layout).  A single large H2D transfer replaces ~20
    per-plane transfers whose fixed dispatch cost dominated; planes a
    frame provably doesn't use (no T8x8 mb -> coef_y8/i8_modes, no PCM mb
    -> pcm planes) are dropped from the transfer and recreated as device
    zeros (or their compute statically skipped).  `keep` pins planes into
    the layout regardless (callers use it to keep layouts — and thus jit
    program counts — stable across a stream).  coef8=True ships the
    residual-level planes as int8 (caller must have checked
    coef_fits_int8): the levels are ~3/4 of the arena, so this cuts the
    H2D volume by ~37%; _unpack_planes widens by the layout dtype, so
    device programs are unchanged apart from the layout signature."""
    layout, size = plan_layout(planes, keep=keep, coef8=coef8)
    arena = _arena_buf(size)
    pack_into(planes, layout, arena)
    return jnp.asarray(arena), layout


def plan_layout(planes, keep=frozenset(), coef8=False, gat=None):
    """First pass of pack_planes: the static layout plus the arena byte
    size, WITHOUT copying any plane.  Lets a caller pack many frames of
    the same layout into one batched buffer (pack_into) for a single
    H2D transfer.

    Entries are (key, dtype, shape, off, meta):
      off >= 0   dense plane at byte offset off (meta None)
      off == -1  skipped — device reads zeros (meta None)
      off == -2  GATHERED: only nonzero rows ship; meta =
                 (bm_off, tab_off, rows, row_elems, U) — a U-row
                 little-endian bitmap at bm_off plus a [rows, row_elems]
                 table at tab_off, expanded on device by
                 bitmap -> exclusive cumsum -> row gather.
    `gat` maps a GAT_TAGS key to its row bucket (or None for dense);
    the host transfer cost is dominated by per-byte compression, so the
    sparse coefficient planes (~3/4 of the dense arena) shipping as
    ~1-5% of their rows is the difference between ~5.6 and ~2 MB/frame.
    """
    flags = np.asarray(planes.mb_flags)
    skip = {"nz_c"}         # never read by any device op (deblock chroma
                            # bS reuses the luma edge bS per §8.7.2.1)
    if not (flags & MBF_T8x8).any():
        skip |= {"coef_y8", "i8_modes"}
    if not (flags & MBF_IPCM).any():
        skip |= {"pcm_y", "pcm_c"}
    if not (flags & MBF_BLEND).any():
        skip |= {"mb_errors", "slice_id"}
    if not (np.asarray(planes.wp).any() or np.asarray(planes.wp8).any()):
        # all-zero weight planes reproduce the default combine exactly
        # (_mc_combine mode==0), so unweighted frames skip the ~0.6
        # MB/frame of weight planes
        skip |= {"wp", "wp8"}
    skip -= set(keep)
    layout = []
    off = 0
    for k in PLANE_KEYS:
        a = getattr(planes, k)
        shape = tuple(a.shape)
        if k == "coef_c_dc":
            shape = (shape[0], shape[1], 2, 4)
        dt = np.dtype(np.int8) if (coef8 and k in COEF_PLANES) \
            else np.dtype(a.dtype)
        if k in skip:
            layout.append((k, str(dt), shape, -1, None))
            continue
        rows = (gat or {}).get(k)
        if rows is not None and k in GAT_TAGS:
            _tag, row_elems = GAT_TAGS[k]
            U = int(np.prod(shape)) // row_elems
            off += (-off) % 8
            bm_off = off
            off += (U + 7) // 8
            off += (-off) % 8
            tab_off = off
            off += rows * row_elems * dt.itemsize
            layout.append((k, str(dt), shape, -2,
                           (bm_off, tab_off, rows, row_elems, U)))
            continue
        if rows is not None and k in BASE_EXC:
            be = BASE_EXC[k]
            U = int(np.prod(shape)) // (16 * be)      # mb count
            off += (-off) % 8
            base_off = off
            off += U * be * dt.itemsize
            off += (-off) % 8
            bm_off = off
            off += (U + 7) // 8
            off += (-off) % 8
            tab_off = off
            off += rows * 16 * be * dt.itemsize
            layout.append((k, str(dt), shape, -3,
                           (base_off, bm_off, tab_off, rows, be, U)))
            continue
        off += (-off) % 8
        layout.append((k, str(dt), shape, off, None))
        off += int(np.prod(shape)) * dt.itemsize
    return tuple(layout), off


def pack_into(planes, layout, out, masks=None):
    """Copy each live plane ONCE into `out` (a 1-D uint8 view sized by
    plan_layout; tobytes + join would copy every byte twice — ~2
    ms/frame at 1080p on a 4-core host where entropy runs at ~11
    ms/frame).  Gathered entries need `masks[key]` (bool [U] coded-row
    mask, see gat_masks)."""
    prev_end = 0
    for k, dt, shape, off, meta in layout:
        if off == -1:
            continue
        a = np.asarray(getattr(planes, k))
        if k == "coef_c_dc":
            a = a.reshape(shape)
        if off == -2:
            bm_off, tab_off, rows, row_elems, U = meta
            idx = masks[k]                     # sorted unique row indices
            if bm_off > prev_end:
                out[prev_end:bm_off] = 0
            mask = np.zeros(U, bool)
            mask[idx] = True
            bm = np.packbits(mask, bitorder="little")
            out[bm_off:bm_off + bm.nbytes] = bm
            out[bm_off + bm.nbytes:tab_off] = 0
            sel = a.reshape(U, row_elems)[idx]
            if sel.dtype != np.dtype(dt):
                sel = sel.astype(dt)
            assert sel.shape[0] <= rows, (k, sel.shape, rows)
            n = sel.nbytes
            out[tab_off:tab_off + n] = \
                np.ascontiguousarray(sel).reshape(-1).view(np.uint8)
            prev_end = tab_off + rows * row_elems * np.dtype(dt).itemsize
            out[tab_off + n:prev_end] = 0
            continue
        if off == -3:
            base_off, bm_off, tab_off, rows, be, U = meta
            idx = masks[k]                  # sorted split-mb indices
            H, W = shape[0] // 4, shape[1] // 4
            a6 = a.reshape(H, 4, W, 4, be)
            base = np.ascontiguousarray(a6[:, 0, :, 0])
            if base.dtype != np.dtype(dt):
                base = base.astype(dt)
            if base_off > prev_end:
                out[prev_end:base_off] = 0
            out[base_off:base_off + base.nbytes] = \
                base.reshape(-1).view(np.uint8)
            mask = np.zeros(U, bool)
            mask[idx] = True
            bm = np.packbits(mask, bitorder="little")
            out[base_off + base.nbytes:bm_off] = 0
            out[bm_off:bm_off + bm.nbytes] = bm
            out[bm_off + bm.nbytes:tab_off] = 0
            sel = a6[idx // W, :, idx % W]        # [N, 4, 4, be]
            if sel.dtype != np.dtype(dt):
                sel = sel.astype(dt)
            assert sel.shape[0] <= rows, (k, sel.shape, rows)
            n = sel.nbytes
            out[tab_off:tab_off + n] = \
                np.ascontiguousarray(sel).reshape(-1).view(np.uint8)
            prev_end = tab_off + rows * 16 * be * np.dtype(dt).itemsize
            out[tab_off + n:prev_end] = 0
            continue
        if a.dtype != np.dtype(dt):
            a = a.astype(dt)
        if off > prev_end:
            out[prev_end:off] = 0            # alignment padding
        n = a.nbytes
        out[off:off + n] = a.reshape(-1).view(np.uint8)
        prev_end = off + n


# Host staging buffers for pack_planes, pooled per size: a fresh np.empty
# per frame pays first-touch page faults that are pathologically slow on
# this host (a cold 16 MB memcpy measures ~100x its warm cost).  Reuse is
# safe on device backends (jnp.asarray snapshots host memory into the
# H2D transfer); the CPU backend may alias host buffers, so it always
# gets a fresh one.  Two buffers alternate per size as slack for any
# in-flight transfer staging.  THREAD-LOCAL: decode_annexb_parallel runs
# whole decoders on worker threads, which must not share staging buffers.
import threading as _threading

_ARENA_POOL = _threading.local()


def _arena_buf(n, rows=None):
    import jax
    shape = n if rows is None else (rows, n)
    if (jax.default_backend() == "cpu"
            or os.environ.get("E264T_NO_ARENA_POOL")):
        return np.empty(shape, np.uint8)
    pool = getattr(_ARENA_POOL, "pool", None)
    if pool is None:
        pool = _ARENA_POOL.pool = {}
    bufs, idx = pool.get(shape) or ([np.empty(shape, np.uint8),
                                     np.empty(shape, np.uint8)], 0)
    pool[shape] = (bufs, idx ^ 1)
    return bufs[idx]


def pack_planes_batch(planes_list, ref_planes, keep=frozenset(),
                      coef8=False, extra=None, gat_state=None):
    """Pack K frames' planes into ONE [K, L] host buffer (a single H2D
    transfer for a whole lockstep step; per-put tunnel cost is high).
    `ref_planes` sizes the shared layout; entries of planes_list that are
    None (dead lanes) pack as all-zero rows.  Callers must have folded
    every lane's conditional planes into `keep` so the layout fits all
    lanes.  `extra` ([K, E] uint8) is appended per row — the lockstep
    driver rides its per-step metadata (scaling matrices, slot maps,
    ring slots) in the same transfer, since every separate device_put
    pays the tunnel's ~25 ms fixed cost.

    `gat_state` (a caller-owned dict, one per stream/group) enables
    SPARSE shipping of the coefficient planes: coded-row masks come free
    from the native dirty lists, and each plane ships as bitmap + the
    coded rows when that's under half its dense size.  Buckets grow
    sticky (powers of two) so the layout — and therefore the jit
    program set — stays bounded per stream.

    Returns (buf [K, L+pad+E] uint8 numpy, layout, extra_off)."""
    native = (not os.environ.get("E264T_NO_NATIVE_PACK")
              and all(pl is None or hasattr(pl, "pack_probe")
                      for pl in planes_list))
    gat = None
    masks_list = [None] * len(planes_list)
    if gat_state is not None and not os.environ.get("E264T_NO_GATHER"):
        counts = {k: 0 for k in GAT_TAGS}
        all_masks = []
        ok = True
        counts.update({k: 0 for k in BASE_EXC})
        do_bx = True
        if native:
            # one C-side probe per lane (GIL released): coded-row counts
            # from the dirty lists + split-mb scan + int8 verdict
            for pl in planes_list:
                if pl is None:
                    continue
                pr = pl.pack_probe(True)
                if pr is None:
                    ok = False
                    continue
                if coef8 and not pr.coef8_ok:
                    coef8 = False
                    gat_state["coef8_off"] = True
                if pr.dirty_all:
                    ok = False
                    continue
                for k, (tag, _re) in GAT_TAGS.items():
                    counts[k] = max(counts[k], pr.gat_counts[tag])
                counts["mvs"] = max(counts["mvs"], pr.exc_counts[0])
                counts["refslot"] = max(counts["refslot"],
                                        pr.exc_counts[1])
        else:
            # numpy fallback; the split-mb scan costs ~2 ms/frame, so
            # probe only every 8th step while content keeps choosing
            # dense
            tick = gat_state.get("_bx_tick", 0)
            gat_state["_bx_tick"] = tick + 1
            do_bx = gat_state.get("_bx_on", True) or tick % 8 == 0
            for pl in planes_list:
                if pl is None:
                    all_masks.append(None)
                    continue
                if coef8 and not coef_fits_int8(pl):
                    coef8 = False
                    gat_state["coef8_off"] = True
                m = gat_masks(pl)
                if m is None:          # recovery made the dirty list
                    ok = False         # unreliable: dense fallback
                    break
                if do_bx:
                    m.update(split_mb_idx(pl))
                all_masks.append(m)
                for k, mm in m.items():
                    counts[k] = max(counts[k], len(mm))
        if ok:
            gat = {}
            itemsize = 1 if coef8 else 2
            for k, (_tag, row_elems) in GAT_TAGS.items():
                a = getattr(ref_planes, k)
                U = int(np.prod(a.shape)) // row_elems
                b = max(gat_state.get(k, 0), 128)
                while b < counts[k]:
                    b *= 2
                if (U + 7) // 8 + b * row_elems * itemsize \
                        <= U * row_elems * itemsize // 2:
                    gat[k] = b
                    gat_state[k] = b       # sticky growth only when used
                else:
                    gat[k] = None          # dense step (e.g. IDR)
            for k, be in BASE_EXC.items():
                if not do_bx:
                    gat[k] = None          # dense between probes
                    continue
                a = np.asarray(getattr(ref_planes, k))
                isz = a.dtype.itemsize
                U = int(np.prod(a.shape)) // (16 * be)   # mbs
                b = max(gat_state.get(k, 0), 128)
                while b < counts[k]:
                    b *= 2
                sparse = (U * be * isz + (U + 7) // 8
                          + b * 16 * be * isz)
                if sparse <= U * 16 * be * isz // 2:
                    gat[k] = b
                    gat_state[k] = b
                else:
                    gat[k] = None
            gat_state["_bx_on"] = any(
                gat.get(k) is not None for k in BASE_EXC)
            masks_list = all_masks
    layout, size = plan_layout(ref_planes, keep=keep, coef8=coef8,
                               gat=gat)
    extra_off = size + (-size) % 8
    total = extra_off + (extra.shape[1] if extra is not None else 0)
    buf = _arena_buf(total, rows=len(planes_list))
    ents = _native_entries(layout) if native else None
    for k, pl in enumerate(planes_list):
        if pl is None:
            buf[k, :extra_off] = 0
        elif native:
            rc = pl.pack_row(ents[0], ents[1], buf[k], size)
            if rc != 0:
                raise RuntimeError(f"e264t_pack_row failed rc={rc}")
            buf[k, size:extra_off] = 0
        else:
            pack_into(pl, layout, buf[k], masks=masks_list[k])
            buf[k, size:extra_off] = 0
    if extra is not None:
        buf[:, extra_off:] = extra
    return buf, layout, extra_off


@functools.lru_cache(maxsize=64)
def _native_entries(layout):
    """Layout tuple -> (PackEntry array, n) for e264t_pack_row (shared
    by every lane of a step; layouts are sticky so this caches well)."""
    from ..native import PackEntry
    items = []
    for k, dt, shape, off, meta in layout:
        if off == -1:
            continue
        e = PackEntry()
        e.key = PLANE_KEYS.index(k)
        e.dst_item = np.dtype(dt).itemsize
        if off >= 0:
            e.kind, e.off = 0, off
        elif off == -2:
            bm_off, tab_off, rows, row_elems, U = meta
            e.kind = 2
            e.bm_off, e.tab_off = bm_off, tab_off
            e.rows, e.row_elems, e.U = rows, row_elems, U
        else:                                   # -3 base+exception
            base_off, bm_off, tab_off, rows, be, U = meta
            e.kind, e.be = 3, be
            e.base_off, e.bm_off, e.tab_off = base_off, bm_off, tab_off
            e.rows, e.U = rows, U
        items.append(e)
    arr = (PackEntry * len(items))(*items)
    return arr, len(items)


_JDT = {"uint8": jnp.uint8, "int8": jnp.int8, "int16": jnp.int16,
        "uint16": jnp.uint16, "int32": jnp.int32}


def use_pallas() -> bool:
    """True when the default backend is a real TPU (Mosaic wavefront
    kernels); the XLA sheared scans remain the CPU/interpret path.
    Override with E264T_NO_PALLAS=1 / E264T_FORCE_PALLAS=1."""
    if os.environ.get("E264T_NO_PALLAS"):
        return False
    if os.environ.get("E264T_FORCE_PALLAS"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _unpack_planes(arena, layout):
    """Device-side arena -> int32 plane dict (slices + bitcasts fuse into
    the consumers; dropped planes come back as zeros; gathered planes
    expand via bitmap -> exclusive cumsum -> one row gather, ~0.8
    ms/frame at 1080p vs ~20 ms/frame of transfer for the dense rows,
    tools/profile_gather.py)."""
    p = {}
    for k, dt, shape, off, meta in layout:
        if off == -1:
            p[k] = jnp.zeros(shape, I32)
            continue
        dtype = np.dtype(dt)
        if off == -2:
            bm_off, tab_off, rows, row_elems, U = meta
            bm = lax.slice(arena, (bm_off,), (bm_off + (U + 7) // 8,))
            bits = (bm[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            coded = bits.reshape(-1)[:U].astype(I32)
            seg = lax.slice(arena, (tab_off,),
                            (tab_off + rows * row_elems * dtype.itemsize,))
            if dtype.itemsize > 1:
                seg = lax.bitcast_convert_type(
                    seg.reshape(rows * row_elems, dtype.itemsize),
                    _JDT[dt])
            elif dt == "int8":
                seg = lax.bitcast_convert_type(seg, jnp.int8)
            tab = jnp.concatenate(
                [seg.reshape(rows, row_elems),
                 jnp.zeros((1, row_elems), seg.dtype)], axis=0)
            idx = jnp.where(coded > 0, jnp.cumsum(coded) - 1, rows)
            p[k] = jnp.take(tab, idx, axis=0).astype(I32).reshape(shape)
            continue
        if off == -3:
            base_off, bm_off, tab_off, rows, be, U = meta
            H, W = shape[0] // 4, shape[1] // 4

            def seg_at(o, n_elems):
                s = lax.slice(arena, (o,), (o + n_elems * dtype.itemsize,))
                if dtype.itemsize > 1:
                    s = lax.bitcast_convert_type(
                        s.reshape(n_elems, dtype.itemsize), _JDT[dt])
                elif dt == "int8":
                    s = lax.bitcast_convert_type(s, jnp.int8)
                return s

            base = seg_at(base_off, U * be).reshape(H, W, be)
            dense0 = jnp.repeat(jnp.repeat(base, 4, 0), 4, 1)
            bm = lax.slice(arena, (bm_off,), (bm_off + (U + 7) // 8,))
            bits = (bm[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            coded = bits.reshape(-1)[:U].astype(I32)
            tab = jnp.concatenate(
                [seg_at(tab_off, rows * 16 * be).reshape(rows, 16 * be),
                 jnp.zeros((1, 16 * be), _JDT[dt])], axis=0)
            idx = jnp.where(coded > 0, jnp.cumsum(coded) - 1, rows)
            exc = (jnp.take(tab, idx, axis=0)
                   .reshape(H, W, 4, 4, be).transpose(0, 2, 1, 3, 4)
                   .reshape(4 * H, 4 * W, be))
            m4 = jnp.repeat(jnp.repeat(coded.reshape(H, W) > 0, 4, 0),
                            4, 1)[..., None]
            p[k] = jnp.where(m4, exc, dense0).astype(I32).reshape(shape)
            continue
        n = int(np.prod(shape))
        seg = lax.slice(arena, (off,), (off + n * dtype.itemsize,))
        if dtype.itemsize > 1:
            seg = lax.bitcast_convert_type(
                seg.reshape(n, dtype.itemsize), _JDT[dt])
        elif dt == "int8":
            seg = lax.bitcast_convert_type(seg, jnp.int8)
        p[k] = seg.astype(I32).reshape(shape)
    return p


def _cast_planes(p):
    return {k: v.astype(jnp.int32) for k, v in p.items()}


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _ring_set(ringL, ringC, idx, l4, ch):
    """Write one frame's MC phase planes into its ring slot in place
    (donation keeps the ring resident; idx is traced, so one program
    serves every slot)."""
    return ringL.at[idx].set(l4), ringC.at[idx].set(ch)


class JaxBackend:
    """Device pixel backend (XLA; CPU or TPU).  The DPB's quarter-pel
    reference phase planes live in a persistent device RING [S, ...]
    written in place via donation — no per-frame restacking — and the
    ring size S is pinned per geometry so the MC program compiles ONCE
    (program-count discipline: XLA compile time dominates cold starts).

    Reference analog: the DPB sample buffers edge264_internal.h:343-386,
    HBM-resident as planned in SURVEY.md §2 (DPB row)."""

    RING_START = 8            # grows by doubling (recompiles, rare);
                              # 8 covers typical max_num_ref_frames
                              # without a growth recompile

    def __init__(self, device=None):
        self.device = device
        self.sm4 = jnp.asarray(np.full((6, 16), 16, np.int32))
        self.sm8 = jnp.asarray(np.full((6, 64), 16, np.int32))
        self.ringL = None         # [S, 4, ph, pw_b] uint8 (G,B,H,J)
        self.ringC = None         # [S, phc, 2*pwc_pad] uint8 interleaved
        self.ring_map = {}        # DPB slot -> ring index
        self.ring_free = []
        self._keep = set()        # sticky plane keep-set (layout stability)
        self._geom = None

    def _ring_reserve(self, slot, mbW, mbH):
        ph, pw_b, phc, pwc_pad = mc_band_dims(mbW, mbH)
        geom = (mbW, mbH)
        if self._geom != geom:
            self._geom = geom
            self.ring_map.clear()
            S = self.RING_START
            self.ringL = jnp.zeros((S, 4, ph, pw_b), jnp.uint8)
            self.ringC = jnp.zeros((S, phc, 2 * pwc_pad), jnp.uint8)
            self.ring_free = list(range(S))
        if not self.ring_free:
            S = self.ringL.shape[0]
            self.ringL = jnp.concatenate(
                [self.ringL, jnp.zeros_like(self.ringL)])
            self.ringC = jnp.concatenate(
                [self.ringC, jnp.zeros_like(self.ringC)])
            self.ring_free = list(range(S, 2 * S))
        i = self.ring_free.pop()
        self.ring_map[slot] = i
        return i

    def reconstruct(self, planes, slot, store, is_ref=True):
        # sticky layout: once a plane class appears in the stream it stays
        # in the arena (zero-filled when unused) so the program set is
        # bounded per stream, not per frame
        flags = np.asarray(planes.mb_flags)
        if (flags & MBF_T8x8).any():
            self._keep |= {"coef_y8", "i8_modes"}
        if (flags & MBF_IPCM).any():
            self._keep |= {"pcm_y", "pcm_c"}
        if np.asarray(planes.wp).any() or np.asarray(planes.wp8).any():
            self._keep |= {"wp", "wp8"}
        arena, layout = pack_planes(planes, keep=self._keep)
        # the Pallas wavefront kernel covers intra on TPU with one fixed
        # program; the level-compressed gather scan stays a CPU-path
        # option (its bucketed shapes would multiply program counts)
        itab = None
        if not use_pallas():
            itab = intra_level_tables(np.asarray(planes.mb_flags),
                                      planes.mb_w, planes.mb_h)
            if itab is not None and itab[0].shape[1] > 128:
                itab = None
            if itab is not None:
                itab = tuple(jnp.asarray(t) for t in itab)
        self.sm4 = jnp.asarray(np.asarray(planes.sm4).astype(np.int32))
        ws8 = np.full((6, 64), 16, np.int32)
        ws8[0] = planes.sm8[0]
        ws8[1] = planes.sm8[1]
        self.sm8 = jnp.asarray(ws8)
        have_refs = bool(self.ring_map)
        if have_refs:
            smap = np.zeros(32, np.int32)
            for s, i in self.ring_map.items():
                smap[s] = i
            y, cb, cr = decode_frame_inter_arena(
                arena, self.sm4, self.sm8, self.ringL, self.ringC,
                jnp.asarray(smap), itab, layout=layout,
                mbW=planes.mb_w, mbH=planes.mb_h, has_b=True)
        else:
            y, cb, cr = decode_frame_arena(arena, self.sm4, self.sm8,
                                           itab, layout=layout,
                                           mbW=planes.mb_w,
                                           mbH=planes.mb_h)
        if is_ref:
            # only reference frames enter the ring: ringing the reorder
            # backlog ballooned S through multiple growth recompiles of
            # the MC program and 17x frame-size HBM per slot
            i = self._ring_reserve(slot, planes.mb_w, planes.mb_h)
            l4, ch = make_ref_planes(y, cb, cr)
            self.ringL, self.ringC = _ring_set(self.ringL, self.ringC,
                                               jnp.int32(i), l4, ch)
        if os.environ.get("E264T_SYNC_EVERY_FRAME"):
            _ = int(np.asarray(y[0, 0]))     # hard sync point (debug)
        # device arrays are returned as-is: dispatch stays asynchronous and
        # the host parses the next slice while the chip reconstructs
        return (y, cb, cr)

    def unpin(self, slot):
        i = self.ring_map.pop(slot, None)
        if i is not None:
            self.ring_free.append(i)


# ---------------------------------------------------------------------------
# Inter prediction (§8.4.2.2) — TPU formulation:
#
# When a frame enters the DPB we precompute its three half-pel planes
# (B = horizontal, H = vertical, J = center) with separable 6-tap convs on
# an edge-replicated padded copy.  Every one of the 16 quarter-pel
# positions is then the rounded average of TWO samples drawn from the 4
# planes {G,B,H,J} at {0,+1} offsets (Table 8-12 rewritten as a gather
# table), so per-frame MC is two loads + one average per 4x4 cell — no
# per-block filtering, no divergent control flow.  Edge clamping of the
# *base* coordinate inside the padded region reproduces the reference's
# clamped-load semantics (edge264_inter.c:362-415) exactly.
#
# Ring layout (shared by the Pallas MC kernel and the XLA gather
# fallback): luma [4, ph, pw_b] uint8 with planes {0:G, 1:B, 2:H, 3:J};
# chroma INTERLEAVED [phc, pwc_b2] uint8 with Cb at even columns and Cr
# at odd columns (one aligned vector load then serves both components).
# Widths are rounded up to multiples of 128 (and at least 256) with
# edge-replicated columns, so position clamps against the padded width
# remain bit-exact and the Pallas kernel's aligned (16,256) window loads
# stay in bounds.

PADL, PADC = 20, 12     # replicate padding (>= max window + block reach)


def mc_band_dims(mbW, mbH):
    """(ph, pw_b, phc, pwc_pad) of the MC ring planes for a geometry.
    pwc_pad is the per-component chroma width (interleaved width is
    2*pwc_pad)."""
    ph = 16 * mbH + 2 * PADL
    pw = 16 * mbW + 2 * PADL
    phc = 8 * mbH + 2 * PADC
    pwc = 8 * mbW + 2 * PADC
    pw_b = max(-(-pw // 128) * 128, 256)
    pwc_pad = max(-(-(2 * pwc) // 128) * 128, 256) // 2
    return ph, pw_b, phc, pwc_pad

# frac (fx,fy) -> (plane1, ox1, oy1, plane2, ox2, oy2); planes 0=G 1=B 2=H 3=J
_MC_TAB = np.array([
    # fy=0          fx = 0..3
    [(0, 0, 0, 0, 0, 0), (0, 0, 0, 1, 0, 0), (1, 0, 0, 1, 0, 0),
     (0, 1, 0, 1, 0, 0)],
    # fy=1
    [(0, 0, 0, 2, 0, 0), (1, 0, 0, 2, 0, 0), (1, 0, 0, 3, 0, 0),
     (1, 0, 0, 2, 1, 0)],
    # fy=2
    [(2, 0, 0, 2, 0, 0), (2, 0, 0, 3, 0, 0), (3, 0, 0, 3, 0, 0),
     (3, 0, 0, 2, 1, 0)],
    # fy=3
    [(0, 0, 1, 2, 0, 0), (2, 0, 0, 1, 0, 1), (3, 0, 0, 1, 0, 1),
     (2, 1, 0, 1, 0, 1)],
], np.int32)            # [fy][fx][6]


def _six_j(a, axis):
    """6-tap along axis (valid positions)."""
    n = a.shape[axis]

    def s(i):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(i, n - 5 + i)
        return a[tuple(idx)]

    return s(0) - 5 * s(1) + 20 * s(2) + 20 * s(3) - 5 * s(4) + s(5)


@jax.jit
def make_ref_planes(y, cb, cr):
    """uint8 frame -> (luma4 [4, ph, pw_b] uint8 half-pel planes
    {G,B,H,J}, chroma interleaved [phc, 2*pwc_pad] uint8).  Any quarter-
    pel sample is the rounded average of two samples from the luma
    planes (per _MC_TAB), so per-frame MC is two loads + avg per cell —
    4x less HBM than materializing all 16 quarter phases, and the whole
    band fits VMEM for the Pallas MC kernel."""
    H, W = y.shape
    mbW, mbH = W // 16, H // 16
    ph, pw_b, phc, pwc_pad = mc_band_dims(mbW, mbH)
    pw = W + 2 * PADL
    g = jnp.pad(y.astype(jnp.int32), PADL, mode="edge")
    gx = jnp.pad(g, ((0, 0), (2, 3)), mode="edge")      # taps for horiz
    braw = _six_j(gx, 1)                                # [ph, pw]
    b = jnp.clip((braw + 16) >> 5, 0, 255)
    gy = jnp.pad(g, ((2, 3), (0, 0)), mode="edge")
    hraw = _six_j(gy, 0)
    h = jnp.clip((hraw + 16) >> 5, 0, 255)
    bx = jnp.pad(braw, ((2, 3), (0, 0)), mode="edge")
    j = jnp.clip((_six_j(bx, 0) + 512) >> 10, 0, 255)
    luma4 = jnp.stack([g, b, h, j])
    luma4 = jnp.pad(luma4, ((0, 0), (0, 0), (0, pw_b - pw)), mode="edge")
    cpads = [jnp.pad(c, ((PADC, PADC), (PADC, PADC + pwc_pad - (W // 2)
                                        - 2 * PADC)), mode="edge")
             for c in (cb, cr)]
    ci = jnp.stack(cpads, axis=-1).reshape(phc, 2 * pwc_pad)
    return luma4.astype(jnp.uint8), ci


_MC_TAB_FLAT = _MC_TAB.reshape(16, 6)


def _mc_luma_list(stackL, sidx, mvx, mvy, gx4, gy4):
    """Luma MC for one list over all 4x4 cells.  stackL [S,4,ph,pw_b]
    uint8 half-pel planes; sidx/mvx/mvy [BH,BW] int32; gx4/gy4 [BH,BW]
    cell top-left full-pel coords.  Returns [16H,16W]."""
    S, _, ph, pw_b = stackL.shape
    flat = stackL.reshape(S * 4, ph, pw_b)
    px = gx4 + (mvx >> 2)
    py = gy4 + (mvy >> 2)
    phase = (mvy & 3) * 4 + (mvx & 3)
    px = jnp.clip(px + PADL, 0, pw_b - 6)
    py = jnp.clip(py + PADL, 0, ph - 6)
    BH, BW = px.shape
    tab = jnp.asarray(_MC_TAB_FLAT)
    sel = tab[phase]                          # [BH,BW,6]
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                    collapsed_slice_dims=(0,),
                                    start_index_map=(0, 1, 2))
    acc = None
    for pc, oxc, oyc in ((0, 1, 2), (3, 4, 5)):
        starts = jnp.stack([sidx * 4 + sel[..., pc],
                            py + sel[..., oyc],
                            px + sel[..., oxc]], -1).reshape(-1, 3)
        v = lax.gather(flat, starts, dn, slice_sizes=(1, 4, 4),
                       mode=lax.GatherScatterMode.CLIP).astype(jnp.int32)
        acc = v if acc is None else acc + v + 1
    v = (acc >> 1).reshape(BH, BW, 4, 4)
    return v.transpose(0, 2, 1, 3).reshape(BH * 4, BW * 4)


def _mc_chroma_list(stackC, sidx, mvx, mvy, gx2, gy2):
    """Chroma MC (bilinear eighth-pel) for one list over all 2x2 chroma
    cells.  stackC [S, phc, 2*pwc_pad] uint8 Cb/Cr-interleaved.
    Returns ([8H,8W] cb, [8H,8W] cr)."""
    phc, pwc2 = stackC.shape[1], stackC.shape[2]
    pwc = pwc2 // 2
    px = gx2 + (mvx >> 3)
    py = gy2 + (mvy >> 3)
    dx = (mvx & 7)[..., None, None]
    dy = (mvy & 7)[..., None, None]
    px = jnp.clip(px + PADC, 0, pwc - 4)
    py = jnp.clip(py + PADC, 0, phc - 4)
    BH, BW = px.shape
    # one 2x(3x3 both-component) interleaved slice-gather per 2x2 cell
    starts = jnp.stack([sidx, py, 2 * px], -1).reshape(-1, 3)
    dn = lax.GatherDimensionNumbers(offset_dims=(1, 2),
                                    collapsed_slice_dims=(0,),
                                    start_index_map=(0, 1, 2))
    w = lax.gather(stackC, starts, dn, slice_sizes=(1, 3, 6),
                   mode=lax.GatherScatterMode.CLIP)
    w = w.reshape(BH, BW, 3, 3, 2).astype(jnp.int32)
    w = w.transpose(0, 1, 4, 2, 3)                       # [BH,BW,2,3,3]
    dx = dx[..., None]
    dy = dy[..., None]
    A = w[..., 0:2, 0:2]
    B = w[..., 0:2, 1:3]
    Cc = w[..., 1:3, 0:2]
    D = w[..., 1:3, 1:3]
    v = ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B
         + (8 - dx) * dy * Cc + dx * dy * D + 32) >> 6   # [BH,BW,2,2,2]
    outs = []
    for comp in (0, 1):
        outs.append(v[:, :, comp].transpose(0, 2, 1, 3)
                    .reshape(BH * 2, BW * 2))
    return outs


def _expand_cell(a, n):
    """[BH,BW] per-4x4-cell -> per-pixel [n*BH, n*BW]."""
    return jnp.repeat(jnp.repeat(a, n, axis=0), n, axis=1)


def _mc_meta(p, slot_map, l):
    """(used, sidx, mvx, mvy) per 4x4 cell for list `l` (all [BH,BW])."""
    refslot = p["refslot"]                    # [BH,BW,2]
    mvs = p["mvs"]                            # [BH,BW,2,2]
    used = refslot[..., l] >= 0
    sidx = slot_map[jnp.clip(refslot[..., l], 0, 31)]
    return used, sidx, mvs[..., l, 0], mvs[..., l, 1]


def mc_frame(p, stackL, stackC, slot_map, has_b=True):
    """Motion-compensated prediction planes for all inter cells of a frame.
    slot_map [32] int32: DPB slot -> index into the ref stacks.  has_b
    False (static) skips the list-1 gathers entirely (P frames).
    Returns (pred_y, pred_cb, pred_cr, inter_mask_pix)."""
    BH, BW = p["refslot"].shape[0], p["refslot"].shape[1]
    gx4 = jax.lax.broadcasted_iota(I32, (BH, BW), 1) * 4
    gy4 = jax.lax.broadcasted_iota(I32, (BH, BW), 0) * 4
    gx2 = jax.lax.broadcasted_iota(I32, (BH, BW), 1) * 2
    gy2 = jax.lax.broadcasted_iota(I32, (BH, BW), 0) * 2

    preds = []
    for l in (0, 1) if has_b else (0,):
        used, sidx, mvx, mvy = _mc_meta(p, slot_map, l)
        py_ = _mc_luma_list(stackL, sidx, mvx, mvy, gx4, gy4)
        pcb, pcr = _mc_chroma_list(stackC, sidx, mvx, mvy, gx2, gy2)
        preds.append((used, py_, pcb, pcr))
    return _mc_combine(p, preds, has_b)


def _mc_combine(p, preds, has_b=True):
    """Weighted-prediction combine (§8.4.2.3) of the per-list prediction
    planes.  preds: [(used [BH,BW] bool, y [H,W] i32, cb, cr i32)]."""
    if not has_b:
        f = jnp.zeros_like(preds[0][0])
        preds = [preds[0], (f, preds[0][1], preds[0][2], preds[0][3])]

    wp = p["wp"]                              # [H,W,24]
    mode = _mb_to_blk4(wp[..., 0])
    lwd = _mb_to_blk4(wp[..., 1])
    cwd = _mb_to_blk4(wp[..., 2])
    # per-cell weights from the per-8x8 plane
    w8 = p["wp8"]                             # [2H,2W,2,3,2]
    w8c = jnp.repeat(jnp.repeat(w8, 2, 0), 2, 1)   # [BH,BW,2,3,2]

    u0, y0_, cb0, cr0 = preds[0]
    u1, y1_, cb1, cr1 = preds[1]
    u0y, u1y = _expand_cell(u0, 4), _expand_cell(u1, 4)
    u0c, u1c = _expand_cell(u0, 2), _expand_cell(u1, 2)
    modey, modec = _expand_cell(mode, 4), _expand_cell(mode, 2)
    lwdy, cwdc = _expand_cell(lwd, 4), _expand_cell(cwd, 2)

    def weight_single(pred, w, o, logwd):
        num = pred * w + jnp.where(logwd >= 1, 1 << jnp.maximum(logwd - 1, 0),
                                   0)
        v = jnp.where(logwd >= 1, num >> jnp.maximum(logwd, 0), pred * w) + o
        return jnp.clip(v, 0, 255)

    def weight_bi(p0, p1, w0, w1, o0, o1, logwd):
        v = ((p0 * w0 + p1 * w1 + (1 << logwd)) >> (logwd + 1)) \
            + ((o0 + o1 + 1) >> 1)
        return jnp.clip(v, 0, 255)

    def combine(pix0, pix1, u0x, u1x, modex, wdx, wsel, n):
        # wsel: comp index 0 (luma) or 1/2 (chroma) into w8c[..., comp, :]
        w_0 = _expand_cell(w8c[..., 0, wsel, 0], n)
        o_0 = _expand_cell(w8c[..., 0, wsel, 1], n)
        w_1 = _expand_cell(w8c[..., 1, wsel, 0], n)
        o_1 = _expand_cell(w8c[..., 1, wsel, 1], n)
        bi = u0x & u1x
        single = u0x ^ u1x
        ps = jnp.where(u0x, pix0, pix1)
        ws = jnp.where(u0x, w_0, w_1)
        os_ = jnp.where(u0x, o_0, o_1)
        s_w = jnp.where(modex == 1, weight_single(ps, ws, os_, wdx), ps)
        b_d = (pix0 + pix1 + 1) >> 1
        b_w = weight_bi(pix0, pix1, w_0, w_1, o_0, o_1, wdx)
        b = jnp.where(modex == 0, b_d, b_w)
        return jnp.where(bi, b, jnp.where(single, s_w, 0)), (u0x | u1x)

    pred_y, mask_y = combine(y0_, y1_, u0y, u1y, modey, lwdy, 0, 4)
    pred_cb, _ = combine(cb0, cb1, u0c, u1c, modec, cwdc, 1, 2)
    pred_cr, mask_c = combine(cr0, cr1, u0c, u1c, modec, cwdc, 2, 2)
    # cells of an INTER mb with no valid reference on either list
    # (corrupt stream, e.g. a list modification to a nonexistent pic):
    # predict mid-gray, the concealment default (matches ops/oracle.py)
    inter = _mb_to_blk4((p["mb_flags"] & MBF_INTER) > 0)
    orph_y = _expand_cell(inter, 4) & ~mask_y
    orph_c = _expand_cell(inter, 2) & ~mask_c
    pred_y = jnp.where(orph_y, 128, pred_y)
    pred_cb = jnp.where(orph_c, 128, pred_cb)
    pred_cr = jnp.where(orph_c, 128, pred_cr)
    return (pred_y, pred_cb, pred_cr, mask_y | orph_y, mask_c | orph_c)


@functools.partial(jax.jit, static_argnames=("mbW", "mbH", "has_b"))
def decode_frame_inter_jit(p, sm4, sm8, stackL, stackC, slot_map, mbW, mbH,
                           itab=None, has_b=True):
    """Full device pixel path for a frame with inter macroblocks."""
    p = _cast_planes(p)
    return _decode_frame_impl(p, sm4, sm8, mbW, mbH, itab,
                              mc=(stackL, stackC, slot_map, has_b))

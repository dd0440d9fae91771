"""Intra prediction as gather tables.

Every directional H.264 intra mode is a 3-tap filter (a + 2b + c + 2) >> 2
over the neighbour sample vector — 2-tap (a+b+1)>>1 is the a==c special
case and plain copies are a==b==c.  Neighbours live in one vector `nb`
laid out so that the spec's p[-1,-1] substitutions fall out of the index
arithmetic:

    nb4  (I4x4):  [l3 l2 l1 l0 | tl | t0 .. t7]            (13)
    nb8  (I8x8):  [l7 .. l0 | tl | t0 .. t15]              (25)
    nb16 (I16):   [l15 .. l0 | tl | t0 .. t15]             (33)
    nbc  (chroma):[l7 .. l0 | tl | t0 .. t7]               (17)

index(l[i]) = L-1-i, index(tl) = L, index(t[j]) = L+1+j, so l[-1] and
t[-1] both resolve to tl — exactly the spec's edge rules.

The index tables are *probed from the numpy oracle* (ops/oracle.py): each
(mode, pixel) coefficient vector is recovered by evaluating the oracle on
one-hot neighbour vectors, guaranteeing the device kernels agree with the
bit-exactness authority by construction.  This is the TPU rebirth of the
reference's mode-enum tables (edge264_slice.c:573-594).
"""

from __future__ import annotations

import numpy as np

from . import oracle


def _probe_mode(eval_fn, nvec, npix):
    """Recover (i0, i1, i2) index triples of a linear 3-tap predictor by
    probing with scaled one-hot neighbour vectors."""
    weights = np.zeros((npix, nvec), np.int32)
    for k in range(nvec):
        nb = np.zeros(nvec, np.int64)
        nb[k] = 4
        pred = eval_fn(nb)            # (4*w + 2) >> 2 == w for w in 0,1,2,4
        weights[:, k] = pred.reshape(-1)
    idx = np.zeros((npix, 3), np.int32)
    for p in range(npix):
        w = weights[p].copy()
        assert w.sum() == 4, (p, w)
        i1 = int(np.argmax(w))       # center tap carries weight 2
        w[i1] -= 2
        rest = [k for k in range(nvec) for _ in range(int(w[k]))]
        assert len(rest) == 2, (p, weights[p])
        idx[p] = (rest[0], i1, rest[1])
    return idx


def _nb4_split(nb):
    l = nb[3::-1]        # l0..l3 at positions 3,2,1,0
    tl = nb[4]
    t = nb[5:]
    return t, l, tl


def _nb8_split(nb):
    l = nb[7::-1]
    tl = nb[8]
    t = nb[9:]
    return t, l, tl


def build_i4_idx():
    """IDX[mode][16][3] for I4x4 modes 0,1,3,4,5,6,7,8 (DC=2 excluded)."""
    out = np.zeros((9, 16, 3), np.int32)
    for mode in (0, 1, 3, 4, 5, 6, 7, 8):
        def ev(nb, mode=mode):
            t, l, tl = _nb4_split(nb)
            return oracle.intra4x4_pred(mode, t, l, tl, True, True)
        out[mode] = _probe_mode(ev, 13, 16)
    return out


def build_i8_idx():
    """IDX[mode][64][3] for I8x8 modes (on filtered samples)."""
    out = np.zeros((9, 64, 3), np.int32)
    for mode in (0, 1, 3, 4, 5, 6, 7, 8):
        def ev(nb, mode=mode):
            t, l, tl = _nb8_split(nb)
            return oracle.intra8x8_pred(mode, t, l, tl, True, True)
        out[mode] = _probe_mode(ev, 25, 64)
    return out


def build_i8_filter_idx():
    """The §8.3.2.2.1 reference-sample lowpass is itself a per-position
    3-tap over nb8; probe it too.  Returns IDX[25][3] plus a mask of which
    outputs depend on availability (handled by 4 variants).

    Variants by (aD, has A or B as in filter rules) are folded by the
    caller; here we emit idx for the all-available case and the caller
    regenerates the few boundary positions for the other cases."""
    def ev(nb):
        t, l, tl = _nb8_split(nb)
        tf, lf, tlf = oracle.intra8x8_filter(t, l, tl, True, True, True, True)
        # repack in nb order
        return np.concatenate([lf[::-1], [tlf], tf])
    return _probe_mode(ev, 25, 25)


def build_i16_dir_idx():
    """IDX[2][256][3] for I16 modes 0 (V) and 1 (H)."""
    out = np.zeros((2, 256, 3), np.int32)
    for mode in (0, 1):
        def ev(nb, mode=mode):
            l = nb[15::-1]
            tl = nb[16]
            t = nb[17:]
            return oracle.intra16x16_pred(mode, t, l, tl, True, True)
        out[mode] = _probe_mode(ev, 33, 256)
    return out


def build_chroma_dir_idx():
    """IDX[2][64][3] for chroma modes 1 (H) and 2 (V)."""
    out = np.zeros((2, 64, 3), np.int32)
    for mode in (1, 2):
        def ev(nb, mode=mode):
            l = nb[7::-1]
            tl = nb[8]
            t = nb[9:]
            return oracle.intra_chroma_pred(mode, t, l, tl, True, True)
        out[mode - 1] = _probe_mode(ev, 17, 64)
    return out


I4_IDX = build_i4_idx()               # [9,16,3] (mode 2 rows unused)
I16_DIR_IDX = build_i16_dir_idx()     # [2,256,3]
CH_DIR_IDX = build_chroma_dir_idx()   # [2,64,3]
I8_IDX = build_i8_idx()               # [9,64,3] on filtered samples
I8_FILT_IDX = build_i8_filter_idx()   # [25,3] all-available lowpass

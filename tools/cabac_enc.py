"""CABAC encoder for avcgen test streams (ISO/IEC 14496-10 §9.3.4).

Mirrors the decoder's context numbering (native/src/mb_cabac.cpp) element
for element so generated streams exercise every context family.  The
constant tables are loaded through tools/gen_cabac_tables (standard spec
data)."""

from __future__ import annotations

from tools import gen_cabac_tables as _gt

_INIT = _gt.parse_init_tables()
_RANGE_LPS, _TRANS_MPS, _TRANS_LPS = _gt.parse_bitstream_tables()

ZIGZAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# residual category ctx bases (mirrors CAT[] in mb_cabac.cpp)
CAT = {
    0: (85, 105, 166, 227, 9),
    1: (89, 119, 180, 237, 9),
    2: (93, 134, 195, 247, 9),
    3: (97, 149, 210, 257, 8),
    4: (101, 151, 212, 266, 9),
    5: (1012, 402, 417, 426, 9),
}

# Table 9-43 significant/last maps for 8x8 blocks (frame coding)
SIG_INC_8x8 = [
    0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
    4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
    7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
    12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12, 0,
]
LAST_INC_8x8 = [
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4,
    5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8, 8, 8,
]


class CabacWriter:
    """Arithmetic encoder (§9.3.4.2--9.3.4.6) writing into a BitWriter."""

    def __init__(self, bitwriter, qp, init_table):
        self.w = bitwriter
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True
        self.state = []
        for m, n in _INIT[init_table]:
            pre = min(max(((m * qp) >> 4) + n, 1), 126)
            if pre <= 63:
                self.state.append(((63 - pre) << 1) | 0)
            else:
                self.state.append(((pre - 64) << 1) | 1)

    def restart(self):
        """Engine re-init after I_PCM (§9.3.1: contexts are preserved)."""
        self.low = 0
        self.range = 510
        self.outstanding = 0
        self.first = True

    def _put(self, b):
        if self.first:          # first bit is not written (9.3.4.6.3 note)
            self.first = False
        else:
            self.w.u1(b)
        while self.outstanding:
            self.w.u1(b ^ 1)
            self.outstanding -= 1

    def _renorm(self):
        while self.range < 256:
            if self.low >= 512:
                self._put(1)
                self.low -= 512
            elif self.low < 256:
                self._put(0)
            else:
                self.outstanding += 1
                self.low -= 256
            self.low <<= 1
            self.range <<= 1

    def encode(self, ctx, binval):
        s = self.state[ctx]
        p, v = s >> 1, s & 1
        rlps = _RANGE_LPS[4 * p + ((self.range >> 6) & 3)]
        self.range -= rlps
        if binval != v:
            self.low += self.range
            self.range = rlps
            self.state[ctx] = (_TRANS_LPS[p] << 1) | ((v ^ 1) if p == 0 else v)
        else:
            self.state[ctx] = (_TRANS_MPS[p] << 1) | v
        self._renorm()

    def bypass(self, binval):
        self.low <<= 1
        if binval:
            self.low += self.range
        if self.low >= 1024:
            self._put(1)
            self.low -= 1024
        elif self.low < 512:
            self._put(0)
        else:
            self.outstanding += 1
            self.low -= 512

    def bypass_n(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bypass(val >> i & 1)

    def terminate(self, binval):
        self.range -= 2
        if binval:
            self.low += self.range
            self.range = 2
            self._renorm()
            # EncodeFlush (9.3.4.6.5)
            self._put(self.low >> 9 & 1)
            self.w.u((self.low >> 7 & 3) | 1, 2)
        else:
            self._renorm()

    # -- composite binarizations (mirror mb_cabac.cpp) ---------------------

    def ue_tu(self, ctxs, val, cmax):
        """Truncated unary with per-bin ctx list (last repeated)."""
        for i in range(val):
            self.encode(ctxs[min(i, len(ctxs) - 1)], 1)
        if val < cmax:
            self.encode(ctxs[min(val, len(ctxs) - 1)], 0)

    def mvd(self, base, inc, val):
        a = abs(val)
        if a == 0:
            self.encode(base + inc, 0)
            return
        self.encode(base + inc, 1)
        prefix = min(a, 9)
        for v in range(1, prefix):
            self.encode(base + 3 + min(v - 1, 3), 1)
        if prefix < 9:
            self.encode(base + 3 + min(prefix - 1, 3), 0)
        else:                   # UEG3 suffix
            rem = a - 9
            k = 3
            while rem >= (1 << k):
                self.bypass(1)
                rem -= 1 << k
                k += 1
            self.bypass(0)
            self.bypass_n(rem, k)
        self.bypass(1 if val < 0 else 0)

    def residual_block(self, cat, coeffs, scan, start, end):
        """Encode one block's significance map + levels.  `coeffs` indexed
        by scan position (list over scan indices start..end)."""
        cbf_unused = None
        base_sig, base_last = CAT[cat][1], CAT[cat][2]
        base_abs, cap = CAT[cat][3], CAT[cat][4]
        sig_map = SIG_INC_8x8 if cat == 5 else None
        last_map = LAST_INC_8x8 if cat == 5 else None
        positions = [i for i in range(start, end + 1) if coeffs[i] != 0]
        assert positions, "cbf=1 requires a nonzero coefficient"
        last = positions[-1]
        i = start
        while i < end:
            sig = 1 if coeffs[i] != 0 else 0
            self.encode(base_sig + (sig_map[i] if sig_map else i), sig)
            if sig:
                lastf = 1 if i == last else 0
                self.encode(base_last + (last_map[i] if last_map else i),
                            lastf)
                if lastf:
                    break
            i += 1
        # levels in reverse scan order
        idx0, idx1 = 1, 5
        trans0 = [0, 2, 3, 4, 4]
        for i in reversed(positions):
            a = abs(coeffs[i])
            if a == 1:
                self.encode(base_abs + idx0, 0)
                self.bypass(1 if coeffs[i] < 0 else 0)
                idx0 = trans0[idx0]
                continue
            self.encode(base_abs + idx0, 1)
            prefix = min(a, 15)
            for v in range(2, prefix):
                self.encode(base_abs + idx1, 1)
            if prefix < 15:
                self.encode(base_abs + idx1, 0)
            else:               # UEG0 suffix
                rem = a - 15
                k = 0
                while rem >= (1 << k):
                    self.bypass(1)
                    rem -= 1 << k
                    k += 1
                self.bypass(0)
                self.bypass_n(rem, k)
            self.bypass(1 if coeffs[i] < 0 else 0)
            idx0 = 0
            idx1 = min(idx1 + 1, cap)

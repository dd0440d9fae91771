#!/usr/bin/env python3
"""avcgen — minimal H.264 Annex-B test-stream generator (an encoder for
decoder testing, written from the ISO/IEC 14496-10 syntax).

Produces Baseline/Main-subset streams the reference decoder accepts:
SPS/PPS, IDR/I slices with CAVLC entropy coding, I_PCM / I_4x4 / I_16x16
macroblocks with arbitrary (generator-chosen) coefficient levels, per-mb QP
deltas.  Grows alongside the decoder: P/B slices, CABAC, High profile get
added with those milestones.

The point is not visual quality: coefficient levels are drawn directly (no
forward DCT), which exercises the entropy layer and pixel kernels far more
uniformly than any natural video would.
"""

from __future__ import annotations

import random

from tools.cavlc_tables import COEFF_TOKEN, TOTAL_ZEROS, RUN_BEFORE

ZIGZAG4 = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
BLK4_X = [0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3]
BLK4_Y = [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3]
BLK_ORD = [[0, 1, 4, 5], [2, 3, 6, 7], [8, 9, 12, 13], [10, 11, 14, 15]]
# coded_block_pattern -> codeNum (inverse of Table 9-4), intra
ME_CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
                16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
                8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]
INV_ME_CBP_INTRA = {cbp: i for i, cbp in enumerate(ME_CBP_INTRA)}


class BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, val, n):
        assert 0 <= val < (1 << n), (val, n)
        for i in range(n - 1, -1, -1):
            self.bits.append(val >> i & 1)

    def u1(self, val):
        self.bits.append(val & 1)

    def ue(self, val):
        val += 1
        n = val.bit_length()
        self.u(0, n - 1)
        self.u(val, n)

    def se(self, val):
        self.ue(2 * val - 1 if val > 0 else -2 * val)

    def code(self, lenval):   # (len, value) pair from the canonical tables
        ln, v = lenval
        self.u(v, ln)

    def align_zero(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def rbsp_trailing(self):
        self.bits.append(1)
        self.align_zero()

    def bytes_unescaped(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = b << 1 | self.bits[i + j]
            out.append(b)
        return bytes(out)


def escape(rbsp: bytes) -> bytes:
    """Insert emulation-prevention 03 bytes (§7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal(nal_ref_idc: int, nal_type: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x01" + bytes([nal_ref_idc << 5 | nal_type]) + escape(rbsp)


# ---------------------------------------------------------------------------
def make_aud(primary_pic_type=0) -> bytes:
    """Access-unit delimiter (NAL 9, §7.3.2.4)."""
    w = BitWriter()
    w.u(primary_pic_type, 3)
    w.rbsp_trailing()
    return nal(0, 9, w.bytes_unescaped())


def make_filler(n=4) -> bytes:
    """Filler data NAL (type 12): n 0xFF bytes + trailing (§7.3.2.7)."""
    return nal(0, 12, b"\xff" * n + b"\x80")


def make_sps(mb_w, mb_h, *, profile=66, level=40, log2_max_frame_num=4,
             poc_type=0, log2_max_poc_lsb=4, max_ref_frames=2, gaps=0,
             crop=(0, 0, 0, 0), scaling4=None, scaling8=None,
             timing=None, poc1_offsets=None, qpprime_bypass=0) -> bytes:
    """timing: optional VUI (num_units_in_tick, time_scale) pair — frame
    rate = time_scale / (2 * num_units_in_tick) for progressive (E-1).
    poc1_offsets: poc_type=1 (offset_for_non_ref_pic, [cycle offsets])."""
    w = BitWriter()
    w.u(profile, 8)
    w.u(0, 8)               # constraint flags
    w.u(level, 8)
    w.ue(0)                 # sps id
    if profile not in (66, 77, 88):
        w.ue(1)             # chroma_format_idc 4:2:0
        w.ue(0)             # bit_depth_luma_minus8
        w.ue(0)             # bit_depth_chroma_minus8
        w.u1(qpprime_bypass)  # qpprime_y_zero_transform_bypass
        if scaling4 or scaling8:
            w.u1(1)         # seq_scaling_matrix_present
            for i in range(6):
                _write_scaling_list(w, scaling4[i] if scaling4 else None, 16)
            for i in range(2):
                _write_scaling_list(w, scaling8[i] if scaling8 else None, 64)
        else:
            w.u1(0)
    w.ue(log2_max_frame_num - 4)
    w.ue(poc_type)
    if poc_type == 0:
        w.ue(log2_max_poc_lsb - 4)
    elif poc_type == 1:
        nonref, cycle = poc1_offsets or (0, [])
        w.u1(1)             # delta_pic_order_always_zero
        w.se(nonref)        # offset_for_non_ref_pic
        w.se(0)             # offset_for_top_to_bottom
        w.ue(len(cycle))    # num_ref_frames_in_pic_order_cnt_cycle
        for off in cycle:
            w.se(off)
    w.ue(max_ref_frames)
    w.u1(gaps)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u1(1)                 # frame_mbs_only
    w.u1(1)                 # direct_8x8_inference
    l, r, t, b = crop
    if any(crop):
        w.u1(1)
        w.ue(l); w.ue(r); w.ue(t); w.ue(b)
    else:
        w.u1(0)
    if timing is not None:
        w.u1(1)             # vui present
        w.u1(0)             # aspect_ratio_info_present
        w.u1(0)             # overscan_info_present
        w.u1(0)             # video_signal_type_present
        w.u1(0)             # chroma_loc_info_present
        w.u1(1)             # timing_info_present
        w.u(timing[0], 32)  # num_units_in_tick
        w.u(timing[1], 32)  # time_scale
        w.u1(1)             # fixed_frame_rate
        w.u1(0)             # nal_hrd_parameters_present
        w.u1(0)             # vcl_hrd_parameters_present
        w.u1(0)             # pic_struct_present
        w.u1(0)             # bitstream_restriction
    else:
        w.u1(0)             # vui absent
    w.rbsp_trailing()
    return nal(3, 7, w.bytes_unescaped())


def make_pps(*, pps_id=0, cabac=False, init_qp=26, chroma_qp_off=0,
             deblock_control=False, second_chroma_qp_off=None,
             nrefs=1, nrefs1=1, wp=False, wbi=0,
             transform_8x8=False) -> bytes:
    w = BitWriter()
    w.ue(pps_id)
    w.ue(0)                 # sps id
    w.u1(1 if cabac else 0)
    w.u1(0)                 # bottom_field_pic_order_in_frame_present
    w.ue(0)                 # num_slice_groups-1
    w.ue(max(nrefs, 1) - 1); w.ue(max(nrefs1, 1) - 1)  # num_ref_idx_default_active
    w.u1(1 if wp else 0)    # weighted_pred_flag (explicit P weights)
    w.u(wbi, 2)             # weighted_bipred_idc
    w.se(init_qp - 26)
    w.se(0)                 # pic_init_qs
    w.se(chroma_qp_off)
    w.u1(1 if deblock_control else 0)
    w.u1(0)                 # constrained_intra_pred
    w.u1(0)                 # redundant_pic_cnt_present
    if second_chroma_qp_off is not None or transform_8x8:
        w.u1(1 if transform_8x8 else 0)
        w.u1(0)             # pic_scaling_matrix_present
        w.se(second_chroma_qp_off or 0)
    w.rbsp_trailing()
    return nal(3, 8, w.bytes_unescaped())


ZIGZAG8 = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
           12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
           35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
           58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _write_scaling_list(w, values, n):
    """values: raster-order list of n weights, or None for 'not present'."""
    if values is None:
        w.u1(0)
        return
    w.u1(1)
    scan = ZIGZAG4 if n == 16 else ZIGZAG8
    last = 8
    for j in range(n):
        target = values[scan[j]]
        delta = ((target - last + 128) % 256) - 128
        w.se(delta)
        last = target



def _safe_qpd(cur, delta):
    """Clamp a random mb_qp_delta so the running QP stays in [4, 35]:
    keeps generated streams conformance-like.  §8.5.12.2 only guarantees
    16-bit transform intermediates for residuals a REAL encoder produces;
    our random coefficient levels at QP >= 36 (where 8x8 dequant switches
    to the left-shift path) can overflow the reference's 16-bit SIMD
    lanes, whose wraparound then diverges from any wider-precision
    implementation (found by sweep: high-profile CABAC streams whose
    accumulated qp_delta drifted to 43)."""
    t = min(max(cur + delta, 4), 35)
    return t - cur


# ---------------------------------------------------------------------------
def encode_residual_cavlc(w: BitWriter, coeffs, nC, max_coeff):
    """Encode one residual block (§9.2).  `coeffs` are the levels in scan
    order (length max_coeff)."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    total_coeff = len(nz)
    # trailing ones: run of |1| levels at the high-frequency end, max 3
    t1 = 0
    for i in range(total_coeff - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    cls = 3 if nC < 0 else 0 if nC < 2 else 1 if nC < 4 else 2
    if nC >= 8:
        if total_coeff == 0:
            w.u(3, 6)
        else:
            w.u(total_coeff * 4 + t1 - 4, 6)
    else:
        w.code(COEFF_TOKEN[cls][(total_coeff, t1)])
    if total_coeff == 0:
        return 0
    # trailing one signs (high frequency first)
    for i in range(total_coeff - 1, total_coeff - 1 - t1, -1):
        w.u1(1 if nz[i][1] < 0 else 0)
    # remaining levels, high frequency first
    suffix_length = 1 if total_coeff > 10 and t1 < 3 else 0
    first_nont1 = True
    for i in range(total_coeff - 1 - t1, -1, -1):
        level = nz[i][1]
        code = 2 * level - 2 if level > 0 else -2 * level - 1
        if first_nont1 and t1 < 3:
            code -= 2
        first_nont1 = False
        if suffix_length == 0:
            if code < 14:
                w.u(1, code + 1)                    # prefix zeros + 1
            elif code < 30:
                w.u(0, 14); w.u1(1); w.u(code - 14, 4)
            else:
                assert code < 30 + 4096
                w.u(0, 15); w.u1(1); w.u(code - 30, 12)
        else:
            if (code >> suffix_length) < 15:
                w.u(0, code >> suffix_length); w.u1(1)
                w.u(code & ((1 << suffix_length) - 1), suffix_length)
            else:
                esc = code - (15 << suffix_length)
                assert esc < 4096, "level too large for simple escape"
                w.u(0, 15); w.u1(1); w.u(esc, 12)
        if suffix_length == 0:
            suffix_length = 1
        if abs(level) > (3 << (suffix_length - 1)) and suffix_length < 6:
            suffix_length += 1
    # total_zeros
    highest = nz[-1][0]
    total_zeros = highest + 1 - total_coeff
    if total_coeff < max_coeff:
        if max_coeff == 4:
            tz_idx = total_coeff - 1
        elif max_coeff == 8:
            tz_idx = total_coeff + 3
        else:
            tz_idx = total_coeff + 11
        w.code(TOTAL_ZEROS[tz_idx][total_zeros])
    # run_before, high frequency first
    zeros_left = total_zeros
    for i in range(total_coeff - 1, 0, -1):
        if zeros_left == 0:
            break
        run = nz[i][0] - nz[i - 1][0] - 1
        zl = min(zeros_left, 7)
        if zl < 7:
            w.code(RUN_BEFORE[zl][run])
        else:
            if run < 7:
                w.code(RUN_BEFORE[7][run])
            else:
                w.u(0, run - 4)     # 000...  (run-4 zeros)
                w.u1(1)
        zeros_left -= run
    return total_coeff


# ---------------------------------------------------------------------------
class MbSpec:
    """One macroblock to encode: kind in {'pcm','i4','i16'}."""

    def __init__(self, kind, **kw):
        self.kind = kind
        self.__dict__.update(kw)


class IntraEncoder:
    """Encodes one I slice worth of MbSpecs, tracking neighbour state
    (modes, total_coeffs) exactly as a decoder would."""

    def __init__(self, mb_w, mb_h, slice_qp, pps_t8=False):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.pps_t8 = pps_t8
        self.qp = slice_qp
        self.modes = {}       # (gby, gbx) -> intra4x4 mode
        self.nz_y = {}        # (gby, gbx) -> total_coeff
        self.nz_c = {}        # (comp, gy, gx) -> total_coeff
        self.mb_kind = {}     # (my, mx) -> kind
        self.parsed = set()

    # --- availability (same-slice assumed: whole frame is one slice) -----
    def mb_avail(self, mx, my):
        return 0 <= mx < self.mb_w and 0 <= my < self.mb_h and \
            (mx, my) in self.parsed

    def blkA_avail(self, mx, my, i):
        return True if BLK4_X[i] > 0 else self.mb_avail(mx - 1, my)

    def blkB_avail(self, mx, my, i):
        return True if BLK4_Y[i] > 0 else self.mb_avail(mx, my - 1)

    def blkC_avail(self, mx, my, i):
        bx, by = BLK4_X[i], BLK4_Y[i]
        if by == 0:
            return self.mb_avail(mx, my - 1) if bx < 3 else \
                self.mb_avail(mx + 1, my - 1)
        if bx == 3:
            return False
        return BLK_ORD[by - 1][bx + 1] < i

    def blkD_avail(self, mx, my, i):
        bx, by = BLK4_X[i], BLK4_Y[i]
        if bx == 0 and by == 0:
            return self.mb_avail(mx - 1, my - 1)
        if by == 0:
            return self.mb_avail(mx, my - 1)
        if bx == 0:
            return self.mb_avail(mx - 1, my)
        return True

    def neighbor_mode(self, gby, gbx, mb_known_nxn):
        """Intra4x4PredMode of a block, DC(2) if not intra-NxN."""
        m = self.modes.get((gby, gbx))
        return m if m is not None else 2

    def nC_luma(self, mx, my, i):
        gbx, gby = mx * 4 + BLK4_X[i], my * 4 + BLK4_Y[i]
        sum_, have = 0, 0
        if self.blkA_avail(mx, my, i):
            sum_ += self.nz_y.get((gby, gbx - 1), 0); have |= 1
        if self.blkB_avail(mx, my, i):
            sum_ += self.nz_y.get((gby - 1, gbx), 0); have |= 2
        return (sum_ + 1) >> 1 if have == 3 else sum_

    def nC_chroma(self, comp, mx, my, cx, cy):
        gx, gy = mx * 2 + cx, my * 2 + cy
        sum_, have = 0, 0
        aA = True if cx > 0 else self.mb_avail(mx - 1, my)
        aB = True if cy > 0 else self.mb_avail(mx, my - 1)
        if aA:
            sum_ += self.nz_c.get((comp, gy, gx - 1), 0); have |= 1
        if aB:
            sum_ += self.nz_c.get((comp, gy - 1, gx), 0); have |= 2
        return (sum_ + 1) >> 1 if have == 3 else sum_

    # --- encode one mb ---------------------------------------------------
    def encode_mb(self, w: BitWriter, mx, my, spec: MbSpec):
        if spec.kind == 'i8':
            encode_i8_mb_cavlc(w, self, mx, my, spec)
            return
        if spec.kind == 'pcm':
            w.ue(25)
            w.align_zero()
            for v in spec.samples_y:       # 256 bytes
                w.u(v, 8)
            for v in spec.samples_cb:      # 64
                w.u(v, 8)
            for v in spec.samples_cr:      # 64
                w.u(v, 8)
            for i in range(16):
                self.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = 16
            for c in range(2):
                for cy in range(2):
                    for cx in range(2):
                        self.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = 16
            self.mb_kind[(mx, my)] = 'pcm'
            self.parsed.add((mx, my))
            return

        if spec.kind == 'i4':
            w.ue(0)
            if self.pps_t8:
                w.u1(0)        # transform_size_8x8_flag
            # modes: spec.modes[i] may be None = "use predicted"
            for i in range(16):
                gbx, gby = mx * 4 + BLK4_X[i], my * 4 + BLK4_Y[i]
                aA = self.blkA_avail(mx, my, i)
                aB = self.blkB_avail(mx, my, i)
                mA = self.neighbor_mode(gby, gbx - 1, None) if aA else -1
                mB = self.neighbor_mode(gby - 1, gbx, None) if aB else -1
                pred = 2 if (mA < 0 or mB < 0) else min(mA, mB)
                mode = spec.modes[i]
                if mode is None:
                    mode = pred
                if mode == pred:
                    w.u1(1)
                else:
                    w.u1(0)
                    w.u(mode - (1 if mode > pred else 0), 3)
                self.modes[(gby, gbx)] = mode
            w.ue(spec.chroma_mode)
            cbp = spec.cbp
            w.ue(INV_ME_CBP_INTRA[cbp])
            is16 = False
        else:   # i16
            pm = spec.pred_mode
            cbp_chroma = spec.cbp >> 4
            cbp_luma15 = 1 if (spec.cbp & 15) else 0
            w.ue(1 + pm + cbp_chroma * 4 + cbp_luma15 * 12)
            w.ue(spec.chroma_mode)
            cbp = spec.cbp
            is16 = True
            for i in range(16):
                self.modes.pop((my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i]), None)
        self.mb_kind[(mx, my)] = spec.kind
        self.parsed.add((mx, my))

        # qp delta + residuals
        if cbp or is16:
            spec.qp_delta = _safe_qpd(self.qp, spec.qp_delta)
            w.se(spec.qp_delta)
            self.qp = (self.qp + spec.qp_delta + 52) % 52
        if is16:
            nC = self.nC_luma(mx, my, 0)
            encode_residual_cavlc(w, spec.dc_coeffs, nC, 16)
        for i8 in range(4):
            if not (cbp >> i8 & 1):
                continue
            for k in range(4):
                i = i8 * 4 + k
                nC = self.nC_luma(mx, my, i)
                coeffs = spec.luma_coeffs[i]
                n = encode_residual_cavlc(
                    w, coeffs[1:] if is16 else coeffs, nC, 15 if is16 else 16)
                self.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = n
        if cbp >> 4:
            for c in range(2):
                encode_residual_cavlc(w, spec.chroma_dc[c], -1, 4)
        if cbp >> 4 == 2:
            for c in range(2):
                for cy in range(2):
                    for cx in range(2):
                        nC = self.nC_chroma(c, mx, my, cx, cy)
                        n = encode_residual_cavlc(
                            w, spec.chroma_ac[c][cy * 2 + cx][1:], nC, 15)
                        self.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = n


def write_pwt(w, weights, nrefs_l0, nrefs_l1=0):
    """pred_weight_table (§7.4.3.2).  weights: dict with luma_denom,
    chroma_denom, and l0/l1 = per-refIdx entries, each None (defaults) or
    (wY, oY, chroma) with chroma None or (wCb, oCb, wCr, oCr)."""
    w.ue(weights.get("luma_denom", 0))
    w.ue(weights.get("chroma_denom", 0))
    for l, n in (("l0", nrefs_l0), ("l1", nrefs_l1)):
        entries = weights.get(l) or []
        for i in range(n):
            e = entries[i] if i < len(entries) else None
            if e is None:
                w.u1(0)         # luma_weight_flag
                w.u1(0)         # chroma_weight_flag
                continue
            wY, oY, chroma = e
            w.u1(1); w.se(wY); w.se(oY)
            if chroma is None:
                w.u1(0)
            else:
                w.u1(1)
                w.se(chroma[0]); w.se(chroma[1])
                w.se(chroma[2]); w.se(chroma[3])


def write_drpm(w, mmco):
    """dec_ref_pic_marking with memory-management control ops (§7.4.3.3).
    mmco: list of (op, *args) tuples; args are the op's ue(v) fields in
    syntax order (op1: diff_minus1; op2: long_term_pic_num; op3:
    diff_minus1, lt_frame_idx; op4: max_lt_idx_plus1; op5: -; op6:
    lt_frame_idx)."""
    w.u1(1)                    # adaptive_ref_pic_marking_mode_flag
    for op in mmco:
        w.ue(op[0])
        for arg in op[1:]:
            w.ue(arg)
    w.ue(0)                    # end of ops


def write_rplm(w, reorder):
    """ref_pic_list_modification for one list (§7.4.3.1).  reorder: None
    (flag 0) or list of (idc, value) with idc 0/1 = abs_diff_pic_num
    _minus1, 2 = long_term_pic_num (4/5 MVC view diffs)."""
    if not reorder:
        w.u1(0)
        return
    w.u1(1)
    for idc, val in reorder:
        w.ue(idc)
        w.ue(val)
    w.ue(3)                    # end of modifications


def make_idr_slice(mb_w, mb_h, specs, *, slice_qp=26, init_qp=26,
                   frame_num=0, idr_pic_id=0, poc_lsb=0, idr=True,
                   nal_ref_idc=3, first_mb=0, pps_id=0,
                   log2_max_frame_num=4, log2_max_poc_lsb=4,
                   deblock_idc=None, deblock_ab=(0, 0),
                   no_output_of_prior=False, long_term=False,
                   mmco=None, poc_type=0) -> bytes:
    """specs: list of MbSpec in raster order starting at first_mb.
    deblock_idc (0/1/2) requires a PPS with deblock_control=True.
    long_term marks the IDR as a long-term reference (§8.2.5.1);
    mmco applies to non-IDR I slices only."""
    w = BitWriter()
    w.ue(first_mb)
    w.ue(7 if idr else 2)      # slice_type I (7 = "all slices are I")
    w.ue(pps_id)
    w.u(frame_num, log2_max_frame_num)
    if idr:
        w.ue(idr_pic_id)
    if poc_type == 0:
        w.u(poc_lsb, log2_max_poc_lsb)
    if nal_ref_idc:
        if idr:
            w.u1(1 if no_output_of_prior else 0)
            w.u1(1 if long_term else 0)
        elif mmco:
            write_drpm(w, mmco)
        else:
            w.u1(0)            # adaptive_ref_pic_marking_mode_flag
    w.se(slice_qp - init_qp)
    if deblock_idc is not None:
        w.ue(deblock_idc)
        if deblock_idc != 1:
            w.se(deblock_ab[0])
            w.se(deblock_ab[1])
    enc = IntraEncoder(mb_w, mb_h, slice_qp)
    for n, spec in enumerate(specs):
        addr = first_mb + n
        enc.encode_mb(w, addr % mb_w, addr // mb_w, spec)
    w.rbsp_trailing()
    return nal(nal_ref_idc, 5 if idr else 1, w.bytes_unescaped())


# ---------------------------------------------------------------------------
def random_intra_mb(rng: random.Random, kinds=('i4', 'i16', 'pcm'),
                    max_level=8, density=0.3) -> MbSpec:
    kind = rng.choice(kinds)
    if kind == 'pcm':
        return MbSpec('pcm',
                      samples_y=[rng.randrange(256) for _ in range(256)],
                      samples_cb=[rng.randrange(256) for _ in range(64)],
                      samples_cr=[rng.randrange(256) for _ in range(64)])

    def rand_coeffs(n, start=0):
        c = [0] * n
        for i in range(start, n):
            if rng.random() < density:
                v = rng.randrange(1, max_level + 1)
                c[i] = v if rng.random() < 0.5 else -v
        return c

    chroma_mode = 0   # refined by caller when availability is known
    qp_delta = rng.randrange(-3, 4)
    if kind == 'i16':
        cbp_luma = 15 if rng.random() < 0.7 else 0
        cbp_chroma = rng.choice([0, 1, 2])
        return MbSpec('i16', pred_mode=None, cbp=cbp_luma | cbp_chroma << 4,
                      chroma_mode=chroma_mode, qp_delta=qp_delta,
                      dc_coeffs=rand_coeffs(16),
                      luma_coeffs=[rand_coeffs(16, 1) for _ in range(16)],
                      chroma_dc=[rand_coeffs(4) for _ in range(2)],
                      chroma_ac=[[rand_coeffs(16, 1) for _ in range(4)]
                                 for _ in range(2)])
    cbp_luma = rng.randrange(16)
    cbp_chroma = rng.choice([0, 1, 2])
    return MbSpec('i4', modes=[None] * 16, cbp=cbp_luma | cbp_chroma << 4,
                  chroma_mode=chroma_mode, qp_delta=qp_delta,
                  luma_coeffs=[rand_coeffs(16) for _ in range(16)],
                  chroma_dc=[rand_coeffs(4) for _ in range(2)],
                  chroma_ac=[[rand_coeffs(16, 1) for _ in range(4)]
                             for _ in range(2)])


def resolve_random_modes(rng, enc: IntraEncoder, mx, my, spec: MbSpec):
    """Pick valid intra modes given availability (must be called in encode
    order, just before encode_mb)."""
    aA, aB = enc.mb_avail(mx - 1, my), enc.mb_avail(mx, my - 1)
    aD = enc.mb_avail(mx - 1, my - 1)
    if spec.kind == 'i16':
        allowed = [2]
        if aB: allowed.append(0)
        if aA: allowed.append(1)
        if aA and aB and aD: allowed.append(3)
        spec.pred_mode = rng.choice(allowed)
    elif spec.kind == 'i4':
        for i in range(16):
            bA = enc.blkA_avail(mx, my, i)
            bB = enc.blkB_avail(mx, my, i)
            bD = enc.blkD_avail(mx, my, i)
            allowed = [2]
            if bB: allowed += [0, 3, 7]       # V, DDL, VL (C handled by pad)
            if bA: allowed += [1, 8]          # H, HU
            if bA and bB and bD: allowed += [4, 5, 6]   # DDR, VR, HD
            spec.modes[i] = rng.choice(allowed)
    if spec.kind in ('i4', 'i16'):
        allowed = [0]
        if aA: allowed.append(1)
        if aB: allowed.append(2)
        if aA and aB and aD: allowed.append(3)
        spec.chroma_mode = rng.choice(allowed)


def gen_random_intra_stream(mb_w, mb_h, n_frames=1, seed=0, *, qp=26,
                            kinds=('i4', 'i16', 'pcm'), max_level=8,
                            density=0.3, slices_per_frame=1,
                            deblock=True, all_idr=False) -> bytes:
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h) + make_pps(deblock_control=not deblock)
    deblock_idc = None if deblock else 1
    for f in range(n_frames):
        n_mbs = mb_w * mb_h
        # slice bounds first: mode availability is per-slice
        bounds = [0]
        for s in range(1, slices_per_frame):
            bounds.append(rng.randrange(
                bounds[-1] + 1, n_mbs - (slices_per_frame - s) + 1))
        bounds.append(n_mbs)
        for s in range(slices_per_frame):
            specs = []
            probe = IntraEncoder(mb_w, mb_h, qp)   # availability mirror
            for addr in range(bounds[s], bounds[s + 1]):
                spec = random_intra_mb(rng, kinds, max_level, density)
                resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w,
                                     spec)
                probe.parsed.add((addr % mb_w, addr // mb_w))
                specs.append(spec)
            out += make_idr_slice(
                mb_w, mb_h, specs,
                slice_qp=qp, frame_num=0 if (f == 0 or all_idr) else f % 16,
                idr_pic_id=f, poc_lsb=(2 * f) % 16, idr=(f == 0 or all_idr),
                first_mb=bounds[s], deblock_idc=deblock_idc)
    return out


if __name__ == "__main__":
    import sys
    data = gen_random_intra_stream(4, 4, n_frames=2, seed=1)
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/test_intra.264"
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(data)} bytes)")


# ---------------------------------------------------------------------------
# Inter (P) slice generation: mirrors the decoder's MV prediction exactly so
# arbitrary motion fields can be encoded as mvds.

ME_CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
                14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
                17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41]
INV_ME_CBP_INTER = {cbp: i for i, cbp in enumerate(ME_CBP_INTER)}


class MvState:
    """Python mirror of the decoder's per-frame mv planes + MVP
    (native/src/mb_inter.cpp)."""

    def __init__(self, mb_w, mb_h):
        self.mb_w, self.mb_h = mb_w, mb_h
        BW, BH = mb_w * 4, mb_h * 4
        self.ref = [[-1] * BW for _ in range(BH)]     # list 0 refIdx
        self.mv = [[(0, 0)] * BW for _ in range(BH)]
        self.intra = set()        # (mx, my) intra mbs
        self.parsed = set()       # (mx, my) parsed mbs (this slice)
        self.cur = None           # current mb (mx, my)
        self.written = 0

    def start_mb(self, mx, my):
        self.cur = (mx, my)
        self.written = 0

    def fetch(self, gx, gy):
        BW = self.mb_w * 4
        if gx < 0 or gy < 0 or gx >= BW:
            return None
        nm = (gx >> 2, gy >> 2)
        if nm == self.cur:
            cell = (gy & 3) * 4 + (gx & 3)
            if not (self.written >> cell & 1):
                return None
        else:
            if nm not in self.parsed:
                return None
            if nm in self.intra:
                return (-1, 0, 0)
        return (self.ref[gy][gx], *self.mv[gy][gx])

    def mvp(self, refidx, x4, y4, w4, h4, shape):
        mx, my = self.cur
        gx, gy = mx * 4 + x4, my * 4 + y4
        A = self.fetch(gx - 1, gy)
        B = self.fetch(gx, gy - 1)
        C = self.fetch(gx + w4, gy - 1)
        if C is None:
            C = self.fetch(gx - 1, gy - 1)
        if B is None and C is None and A is not None:
            B = C = A
        if shape == 1 and B and B[0] == refidx:
            return B[1], B[2]
        if shape in (2, 3) and A and A[0] == refidx:
            return A[1], A[2]
        if shape == 4 and C and C[0] == refidx:
            return C[1], C[2]
        ms = [n for n in (A, B, C) if n and n[0] == refidx]
        if len(ms) == 1:
            return ms[0][1], ms[0][2]
        med = lambda a, b, c: sorted([a, b, c])[1]
        ax, ay = (A[1], A[2]) if A else (0, 0)
        bx, by = (B[1], B[2]) if B else (0, 0)
        cx, cy = (C[1], C[2]) if C else (0, 0)
        return med(ax, bx, cx), med(ay, by, cy)

    def store(self, refidx, x4, y4, w4, h4, mvx, mvy):
        mx, my = self.cur
        for dy in range(h4):
            for dx in range(w4):
                gx, gy = mx * 4 + x4 + dx, my * 4 + y4 + dy
                self.ref[gy][gx] = refidx
                self.mv[gy][gx] = (mvx, mvy)
                self.written |= 1 << ((y4 + dy) * 4 + x4 + dx)

    def skip_mv(self):
        """P_Skip inferred mv (§8.4.1.1)."""
        mx, my = self.cur
        A = self.fetch(mx * 4 - 1, my * 4)
        B = self.fetch(mx * 4, my * 4 - 1)
        if A is None or B is None or A == (0, 0, 0) or B == (0, 0, 0):
            return 0, 0
        return self.mvp(0, 0, 0, 4, 4, 0)

    def finish_mb(self, is_intra):
        self.parsed.add(self.cur)
        if is_intra:
            self.intra.add(self.cur)
            mx, my = self.cur
            for dy in range(4):
                for dx in range(4):
                    self.ref[my * 4 + dy][mx * 4 + dx] = -1
                    self.mv[my * 4 + dy][mx * 4 + dx] = (0, 0)


SUB_WH = {0: (2, 2), 1: (2, 1), 2: (1, 2), 3: (1, 1)}


def encode_p_mb(w, enc: IntraEncoder, mvs: MvState, mx, my, spec,
                nrefs, skip_state):
    """Encode one P-slice macroblock.  skip_state is a dict holding the
    pending skip run ('run') and whether it was flushed."""
    mvs.start_mb(mx, my)
    if spec.kind == 'skip':
        mvx, mvy = mvs.skip_mv()
        mvs.store(0, 0, 0, 4, 4, mvx, mvy)
        mvs.finish_mb(False)
        enc.parsed.add((mx, my))
        skip_state['run'] += 1
        return

    w.ue(skip_state['run'])
    skip_state['run'] = 0

    if spec.kind in ('i4', 'i16', 'pcm'):
        # intra mb in P slice: mb_type offset by 5
        if spec.kind == 'pcm':
            w.ue(30)
            w.align_zero()
            for v in spec.samples_y:
                w.u(v, 8)
            for v in spec.samples_cb:
                w.u(v, 8)
            for v in spec.samples_cr:
                w.u(v, 8)
            for i in range(16):
                enc.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = 16
            for c in range(2):
                for cy in range(2):
                    for cx in range(2):
                        enc.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = 16
            enc.parsed.add((mx, my))
        else:
            if spec.kind == 'i4':
                w.ue(5)
                enc2_encode_i4_body(w, enc, mx, my, spec)
            else:
                pm = spec.pred_mode
                cbp_chroma = spec.cbp >> 4
                cbp_luma15 = 1 if (spec.cbp & 15) else 0
                w.ue(5 + 1 + pm + cbp_chroma * 4 + cbp_luma15 * 12)
                enc2_encode_i16_body(w, enc, mx, my, spec)
        mvs.finish_mb(True)
        return

    # ---- inter types -----------------------------------------------------
    kind2type = {'p16': 0, 'p16x8': 1, 'p8x16': 2, 'p8': 3}
    mb_type = kind2type[spec.kind]
    w.ue(mb_type)
    parts = {0: [(0, 0, 4, 4, 0)],
             1: [(0, 0, 4, 2, 1), (0, 2, 4, 2, 2)],
             2: [(0, 0, 2, 4, 3), (2, 0, 2, 4, 4)]}.get(mb_type)
    if mb_type <= 2:
        for r in spec.refidx:
            if nrefs > 1:
                if nrefs == 2:
                    w.u1(r ^ 1)
                else:
                    w.ue(r)
        for (x4, y4, w4, h4, shape), r, (dx, dy) in zip(parts, spec.refidx,
                                                        spec.mvds):
            px, py = mvs.mvp(r, x4, y4, w4, h4, shape)
            w.se(dx)
            w.se(dy)
            mvs.store(r, x4, y4, w4, h4, px + dx, py + dy)
    else:
        for st in spec.sub_types:
            w.ue(st)
        for r in spec.refidx:
            if nrefs > 1:
                if nrefs == 2:
                    w.u1(r ^ 1)
                else:
                    w.ue(r)
        mvd_i = 0
        for i in range(4):
            bx, by = (i & 1) * 2, (i >> 1) * 2
            w4, h4 = SUB_WH[spec.sub_types[i]]
            for sy in range(0, 2, h4):
                for sx in range(0, 2, w4):
                    dx, dy = spec.mvds[mvd_i]
                    mvd_i += 1
                    r = spec.refidx[i]
                    px, py = mvs.mvp(r, bx + sx, by + sy, w4, h4, 0)
                    w.se(dx)
                    w.se(dy)
                    mvs.store(r, bx + sx, by + sy, w4, h4, px + dx, py + dy)
    mvs.finish_mb(False)
    enc.parsed.add((mx, my))

    # ---- residuals -------------------------------------------------------
    cbp = spec.cbp
    w.ue(INV_ME_CBP_INTER[cbp])
    if (cbp & 15) and enc.pps_t8 and (
            spec.kind != 'p8' or all(s == 0 for s in spec.sub_types)):
        w.u1(0)                # transform_size_8x8_flag
    if cbp:
        spec.qp_delta = _safe_qpd(enc.qp, spec.qp_delta)
        w.se(spec.qp_delta)
        enc.qp = (enc.qp + spec.qp_delta + 52) % 52
    for i8 in range(4):
        if not (cbp >> i8 & 1):
            continue
        for k in range(4):
            i = i8 * 4 + k
            nC = enc.nC_luma(mx, my, i)
            n = encode_residual_cavlc(w, spec.luma_coeffs[i], nC, 16)
            enc.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = n
    if cbp >> 4:
        for c in range(2):
            encode_residual_cavlc(w, spec.chroma_dc[c], -1, 4)
    if cbp >> 4 == 2:
        for c in range(2):
            for cy in range(2):
                for cx in range(2):
                    nC = enc.nC_chroma(c, mx, my, cx, cy)
                    n = encode_residual_cavlc(
                        w, spec.chroma_ac[c][cy * 2 + cx][1:], nC, 15)
                    enc.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = n


def enc2_encode_i4_body(w, enc, mx, my, spec):
    """I_4x4 mb body after mb_type (shared with IntraEncoder.encode_mb)."""
    if enc.pps_t8:
        w.u1(0)                # transform_size_8x8_flag
    for i in range(16):
        gbx, gby = mx * 4 + BLK4_X[i], my * 4 + BLK4_Y[i]
        aA = enc.blkA_avail(mx, my, i)
        aB = enc.blkB_avail(mx, my, i)
        mA = enc.neighbor_mode(gby, gbx - 1, None) if aA else -1
        mB = enc.neighbor_mode(gby - 1, gbx, None) if aB else -1
        pred = 2 if (mA < 0 or mB < 0) else min(mA, mB)
        mode = spec.modes[i]
        if mode is None:
            mode = pred
        if mode == pred:
            w.u1(1)
        else:
            w.u1(0)
            w.u(mode - (1 if mode > pred else 0), 3)
        enc.modes[(gby, gbx)] = mode
    w.ue(spec.chroma_mode)
    w.ue(INV_ME_CBP_INTRA[spec.cbp])
    enc.parsed.add((mx, my))
    _encode_intra_residuals(w, enc, mx, my, spec, False)


def enc2_encode_i16_body(w, enc, mx, my, spec):
    w.ue(spec.chroma_mode)
    for i in range(16):
        enc.modes.pop((my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i]), None)
    enc.parsed.add((mx, my))
    _encode_intra_residuals(w, enc, mx, my, spec, True)


def _encode_intra_residuals(w, enc, mx, my, spec, is16):
    cbp = spec.cbp
    if cbp or is16:
        spec.qp_delta = _safe_qpd(enc.qp, spec.qp_delta)
        w.se(spec.qp_delta)
        enc.qp = (enc.qp + spec.qp_delta + 52) % 52
    if is16:
        nC = enc.nC_luma(mx, my, 0)
        encode_residual_cavlc(w, spec.dc_coeffs, nC, 16)
    for i8 in range(4):
        if not (cbp >> i8 & 1):
            continue
        for k in range(4):
            i = i8 * 4 + k
            nC = enc.nC_luma(mx, my, i)
            coeffs = spec.luma_coeffs[i]
            n = encode_residual_cavlc(
                w, coeffs[1:] if is16 else coeffs, nC, 15 if is16 else 16)
            enc.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = n
    if cbp >> 4:
        for c in range(2):
            encode_residual_cavlc(w, spec.chroma_dc[c], -1, 4)
    if cbp >> 4 == 2:
        for c in range(2):
            for cy in range(2):
                for cx in range(2):
                    nC = enc.nC_chroma(c, mx, my, cx, cy)
                    n = encode_residual_cavlc(
                        w, spec.chroma_ac[c][cy * 2 + cx][1:], nC, 15)
                    enc.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = n


def make_p_slice(mb_w, mb_h, specs, *, slice_qp=26, init_qp=26, frame_num=0,
                 poc_lsb=0, nal_ref_idc=3, first_mb=0, nrefs=1,
                 pps_nrefs=None, deblock_idc=None, log2_max_frame_num=4,
                 log2_max_poc_lsb=4, reorder=None, mmco=None,
                 poc_type=0, weights=None) -> bytes:
    """reorder: ref_pic_list_modification ops for L0 (see write_rplm);
    mmco: memory-management control ops (see write_drpm); weights:
    explicit pred_weight_table (requires a PPS with wp=True)."""
    w = BitWriter()
    w.ue(first_mb)
    w.ue(5)                    # slice_type P (all slices in pic are P)
    w.ue(0)                    # pps id
    w.u(frame_num, log2_max_frame_num)
    if poc_type == 0:
        w.u(poc_lsb, log2_max_poc_lsb)
    if pps_nrefs is not None and nrefs != pps_nrefs:
        w.u1(1)                # num_ref_idx_active_override
        w.ue(nrefs - 1)
    else:
        w.u1(0)                # num_ref_idx_active_override
    write_rplm(w, reorder)
    if weights is not None:
        write_pwt(w, weights, nrefs)
    if nal_ref_idc:
        if mmco:
            write_drpm(w, mmco)
        else:
            w.u1(0)            # adaptive_ref_pic_marking_mode_flag
    w.se(slice_qp - init_qp)
    if deblock_idc is not None:
        w.ue(deblock_idc)
        if deblock_idc != 1:
            w.se(0)
            w.se(0)
    enc = IntraEncoder(mb_w, mb_h, slice_qp)
    mvs = MvState(mb_w, mb_h)
    skip_state = {'run': 0}
    for n, spec in enumerate(specs):
        addr = first_mb + n
        encode_p_mb(w, enc, mvs, addr % mb_w, addr // mb_w, spec, nrefs,
                    skip_state)
    if skip_state['run']:
        w.ue(skip_state['run'])
    w.rbsp_trailing()
    return nal(nal_ref_idc, 1, w.bytes_unescaped())


def random_p_mb(rng, nrefs, max_level=8, density=0.3, mv_range=32,
                intra_prob=0.15, skip_prob=0.2):
    u = rng.random()
    if u < skip_prob:
        return MbSpec('skip')
    if u < skip_prob + intra_prob:
        return random_intra_mb(rng, ('i4', 'i16'), max_level, density)

    def rand_coeffs(n, start=0):
        c = [0] * n
        for i in range(start, n):
            if rng.random() < density:
                v = rng.randrange(1, max_level + 1)
                c[i] = v if rng.random() < 0.5 else -v
        return c

    kind = rng.choice(['p16', 'p16x8', 'p8x16', 'p8'])
    nparts = 1 if kind == 'p16' else 2 if kind in ('p16x8', 'p8x16') else 4
    refidx = [rng.randrange(nrefs) for _ in range(nparts)]
    sub_types = [rng.randrange(4) for _ in range(4)] if kind == 'p8' else None
    if kind == 'p8':
        n_mvds = sum(4 // (SUB_WH[s][0] * SUB_WH[s][1]) for s in sub_types)
    else:
        n_mvds = nparts
    mvds = [(rng.randrange(-mv_range, mv_range + 1),
             rng.randrange(-mv_range, mv_range + 1)) for _ in range(n_mvds)]
    cbp_luma = rng.randrange(16) if rng.random() < 0.7 else 0
    cbp_chroma = rng.choice([0, 1, 2])
    return MbSpec(kind, refidx=refidx, sub_types=sub_types, mvds=mvds,
                  cbp=cbp_luma | cbp_chroma << 4,
                  qp_delta=rng.randrange(-3, 4),
                  luma_coeffs=[rand_coeffs(16) for _ in range(16)],
                  chroma_dc=[rand_coeffs(4) for _ in range(2)],
                  chroma_ac=[[rand_coeffs(16, 1) for _ in range(4)]
                             for _ in range(2)])


def random_frame_specs(rng, mb_w, mb_h, kind="i", *, nrefs=1, qp=26,
                       max_level=8, density=0.3, mv_range=16,
                       intra_prob=0.15, skip_prob=0.2, b_nrefs=(1, 1)):
    """One whole frame's MbSpec list: kind 'i' (intra), 'p', or 'b'.
    Building block for hand-assembled conformance-case streams."""
    specs = []
    probe = IntraEncoder(mb_w, mb_h, qp)
    for addr in range(mb_w * mb_h):
        if kind == "i":
            spec = random_intra_mb(rng, ('i4', 'i16'), max_level, density)
        elif kind == "p":
            spec = random_p_mb(rng, nrefs, max_level, density, mv_range,
                               intra_prob, skip_prob)
        else:
            spec = random_b_mb(rng, b_nrefs, max_level, density, mv_range)
        if spec.kind in ('i4', 'i16'):
            resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w,
                                 spec)
        probe.parsed.add((addr % mb_w, addr // mb_w))
        specs.append(spec)
    return specs


def gen_random_ipp_stream(mb_w, mb_h, n_frames=3, seed=0, *, qp=26,
                          nrefs=1, max_level=8, density=0.3, mv_range=32,
                          intra_prob=0.15, skip_prob=0.2,
                          deblock=True, slices_per_frame=1) -> bytes:
    """IDR + (n_frames-1) P frames, each referencing up to `nrefs` previous
    frames, each split into `slices_per_frame` slices at random mb bounds
    (mode/MVP availability is per-slice, like the reference's
    slice-boundary rules)."""
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h, max_ref_frames=max(nrefs, 1)) \
        + make_pps(deblock_control=not deblock, nrefs=nrefs)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h

    def slice_bounds():
        bounds = [0]
        for s in range(1, slices_per_frame):
            bounds.append(rng.randrange(
                bounds[-1] + 1, n_mbs - (slices_per_frame - s) + 1))
        bounds.append(n_mbs)
        return bounds

    # IDR intra frame
    bounds = slice_bounds()
    for s in range(slices_per_frame):
        specs = []
        probe = IntraEncoder(mb_w, mb_h, qp)
        for addr in range(bounds[s], bounds[s + 1]):
            spec = random_intra_mb(rng, ('i4', 'i16'), max_level, density)
            resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w, spec)
            probe.parsed.add((addr % mb_w, addr // mb_w))
            specs.append(spec)
        out += make_idr_slice(mb_w, mb_h, specs, slice_qp=qp,
                              first_mb=bounds[s], deblock_idc=deblock_idc)
    for f in range(1, n_frames):
        nr = min(f, nrefs)
        bounds = slice_bounds()
        for s in range(slices_per_frame):
            specs = []
            probe = IntraEncoder(mb_w, mb_h, qp)
            for addr in range(bounds[s], bounds[s + 1]):
                spec = random_p_mb(rng, nr, max_level, density, mv_range,
                                   intra_prob, skip_prob)
                if spec.kind in ('i4', 'i16'):
                    resolve_random_modes(rng, probe, addr % mb_w,
                                         addr // mb_w, spec)
                probe.parsed.add((addr % mb_w, addr // mb_w))
                specs.append(spec)
            out += make_p_slice(mb_w, mb_h, specs, slice_qp=qp,
                                frame_num=f % 16, first_mb=bounds[s],
                                poc_lsb=(2 * f) % 16, nrefs=nr,
                                pps_nrefs=nrefs, deblock_idc=deblock_idc)
    return out


# ---------------------------------------------------------------------------
# B slices

B_PAIR_USE = [(1, 1), (2, 2), (1, 2), (2, 1), (1, 3), (2, 3), (3, 1), (3, 2),
              (3, 3)]
B_SUB_USE = [0, 1, 2, 3, 1, 1, 2, 2, 3, 3, 1, 2, 3]
B_SUB_WH = [(2, 2), (2, 2), (2, 2), (2, 2), (2, 1), (1, 2), (2, 1), (1, 2),
            (2, 1), (1, 2), (1, 1), (1, 1), (1, 1)]


def encode_b_mb(w, enc: IntraEncoder, mx, my, spec, nrefs, skip_state):
    if spec.kind == 'bskip':
        enc.parsed.add((mx, my))
        skip_state['run'] += 1
        return
    w.ue(skip_state['run'])
    skip_state['run'] = 0

    if spec.kind in ('i4', 'i16'):
        if spec.kind == 'i4':
            w.ue(23)
            enc2_encode_i4_body(w, enc, mx, my, spec)
        else:
            pm = spec.pred_mode
            cbp_chroma = spec.cbp >> 4
            cbp_luma15 = 1 if (spec.cbp & 15) else 0
            w.ue(23 + 1 + pm + cbp_chroma * 4 + cbp_luma15 * 12)
            enc2_encode_i16_body(w, enc, mx, my, spec)
        return

    enc.parsed.add((mx, my))
    if spec.kind == 'bdirect':
        w.ue(0)
    elif spec.kind == 'b16':
        w.ue(spec.use[0])              # 1 L0, 2 L1, 3 Bi
    elif spec.kind in ('b16x8', 'b8x16'):
        k = B_PAIR_USE.index((spec.use[0], spec.use[1]))
        w.ue(4 + 2 * k + (1 if spec.kind == 'b8x16' else 0))
    else:                              # b8
        w.ue(22)
        for st in spec.sub_types:
            w.ue(st)

    # ref_idx: list 0 then list 1, partitions/quads in order
    if spec.kind == 'b8':
        uses = [B_SUB_USE[st] for st in spec.sub_types]
    elif spec.kind == 'bdirect':
        uses = []
    else:
        uses = list(spec.use)
    for l in range(2):
        for i, u in enumerate(uses):
            if (u >> l & 1) and nrefs[l] > 1:
                r = spec.refidx[l][i]
                if nrefs[l] == 2:
                    w.u1(r ^ 1)
                else:
                    w.ue(r)
    # mvds: list 0 then list 1
    mvd_i = 0
    for l in range(2):
        for i, u in enumerate(uses):
            if not (u >> l & 1):
                continue
            n = 1
            if spec.kind == 'b8':
                w4, h4 = B_SUB_WH[spec.sub_types[i]]
                n = (2 // w4) * (2 // h4)
            for _ in range(n):
                dx, dy = spec.mvds[mvd_i]
                mvd_i += 1
                w.se(dx)
                w.se(dy)

    # residuals
    cbp = spec.cbp
    w.ue(INV_ME_CBP_INTER[cbp])
    if (cbp & 15) and enc.pps_t8:
        b8ok = spec.kind != 'b8' or all(s <= 3 for s in spec.sub_types)
        if b8ok:
            w.u1(0)            # transform_size_8x8_flag
    if cbp:
        spec.qp_delta = _safe_qpd(enc.qp, spec.qp_delta)
        w.se(spec.qp_delta)
        enc.qp = (enc.qp + spec.qp_delta + 52) % 52
    for i8 in range(4):
        if not (cbp >> i8 & 1):
            continue
        for k in range(4):
            i = i8 * 4 + k
            nC = enc.nC_luma(mx, my, i)
            n = encode_residual_cavlc(w, spec.luma_coeffs[i], nC, 16)
            enc.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = n
    if cbp >> 4:
        for c in range(2):
            encode_residual_cavlc(w, spec.chroma_dc[c], -1, 4)
    if cbp >> 4 == 2:
        for c in range(2):
            for cy in range(2):
                for cx in range(2):
                    nC = enc.nC_chroma(c, mx, my, cx, cy)
                    n = encode_residual_cavlc(
                        w, spec.chroma_ac[c][cy * 2 + cx][1:], nC, 15)
                    enc.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = n


def make_b_slice(mb_w, mb_h, specs, *, slice_qp=26, init_qp=26, frame_num=0,
                 poc_lsb=0, nal_ref_idc=0, first_mb=0, nrefs=(1, 1),
                 pps_nrefs=None, direct_spatial=True, deblock_idc=None,
                 log2_max_frame_num=4, log2_max_poc_lsb=6,
                 weights=None) -> bytes:
    w = BitWriter()
    w.ue(first_mb)
    w.ue(6)                    # slice_type B (all slices in pic are B)
    w.ue(0)                    # pps id
    w.u(frame_num, log2_max_frame_num)
    w.u(poc_lsb, log2_max_poc_lsb)
    w.u1(1 if direct_spatial else 0)
    if pps_nrefs is not None and tuple(nrefs) != tuple(pps_nrefs):
        w.u1(1)
        w.ue(nrefs[0] - 1)
        w.ue(nrefs[1] - 1)
    else:
        w.u1(0)
    w.u1(0)                    # ref_pic_list_modification_flag_l0
    w.u1(0)                    # ref_pic_list_modification_flag_l1
    if weights is not None:    # explicit bipred (PPS wbi=1)
        write_pwt(w, weights, nrefs[0], nrefs[1])
    if nal_ref_idc:
        w.u1(0)                # adaptive_ref_pic_marking_mode_flag
    w.se(slice_qp - init_qp)
    if deblock_idc is not None:
        w.ue(deblock_idc)
        if deblock_idc != 1:
            w.se(0)
            w.se(0)
    enc = IntraEncoder(mb_w, mb_h, slice_qp)
    skip_state = {'run': 0}
    for n, spec in enumerate(specs):
        addr = first_mb + n
        mx, my = addr % mb_w, addr // mb_w
        if spec.kind in ('i4', 'i16'):
            resolve_random_modes(random.Random(addr), enc, mx, my, spec)
        encode_b_mb(w, enc, mx, my, spec, nrefs, skip_state)
    if skip_state['run']:
        w.ue(skip_state['run'])
    w.rbsp_trailing()
    return nal(nal_ref_idc, 1, w.bytes_unescaped())


def random_b_mb(rng, nrefs, max_level=8, density=0.3, mv_range=32,
                intra_prob=0.1, skip_prob=0.15, direct_prob=0.15):
    u = rng.random()
    if u < skip_prob:
        return MbSpec('bskip')
    if u < skip_prob + intra_prob:
        return random_intra_mb(rng, ('i4', 'i16'), max_level, density)

    def rand_coeffs(n, start=0):
        c = [0] * n
        for i in range(start, n):
            if rng.random() < density:
                v = rng.randrange(1, max_level + 1)
                c[i] = v if rng.random() < 0.5 else -v
        return c

    common = dict(
        cbp=(rng.randrange(16) if rng.random() < 0.7 else 0)
        | rng.choice([0, 1, 2]) << 4,
        qp_delta=rng.randrange(-3, 4),
        luma_coeffs=[rand_coeffs(16) for _ in range(16)],
        chroma_dc=[rand_coeffs(4) for _ in range(2)],
        chroma_ac=[[rand_coeffs(16, 1) for _ in range(4)] for _ in range(2)])

    if u < skip_prob + intra_prob + direct_prob:
        return MbSpec('bdirect', **common)
    kind = rng.choice(['b16', 'b16x8', 'b8x16', 'b8'])
    nparts = 1 if kind == 'b16' else 2 if kind in ('b16x8', 'b8x16') else 4
    sub_types = [rng.randrange(13) for _ in range(4)] if kind == 'b8' else None
    if kind == 'b8':
        uses = [B_SUB_USE[st] for st in sub_types]
    else:
        uses = [rng.randrange(1, 4) for _ in range(nparts)]
    refidx = [[rng.randrange(nrefs[l]) for _ in range(nparts)]
              for l in range(2)]
    n_mvds = 0
    for i, use in enumerate(uses):
        nsub = 1
        if kind == 'b8':
            w4, h4 = B_SUB_WH[sub_types[i]]
            nsub = (2 // w4) * (2 // h4)
        n_mvds += bin(use).count('1') * nsub
    mvds = [(rng.randrange(-mv_range, mv_range + 1),
             rng.randrange(-mv_range, mv_range + 1)) for _ in range(n_mvds)]
    return MbSpec(kind, use=uses, sub_types=sub_types, refidx=refidx,
                  mvds=mvds, **common)


def gen_random_ipb_stream(mb_w, mb_h, n_gops=2, seed=0, *, qp=26,
                          max_level=8, density=0.3, mv_range=32,
                          direct_spatial=True, wbi=0, b_nrefs=(2, 1),
                          deblock=True, closed=False, gop_pb=2) -> bytes:
    """IDR, then per GOP: P (ref), B (non-ref, POC between).  Decode order
    I P1 B1 P2 B2...; display order I B1 P1 B2 P2...

    closed=True emits n_gops CLOSED GOPs, each opened by its own IDR
    (distinct idr_pic_id, frame_num/POC reset) followed by `gop_pb` P+B
    pairs — the frame-task independence unit across IDRs matching
    /root/reference/src/edge264_headers.c:1275-1277 (refs never cross an
    IDR), so split_gops() yields n_gops independent chunks."""
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h, max_ref_frames=3, log2_max_poc_lsb=6) \
        + make_pps(deblock_control=not deblock, nrefs=2, nrefs1=1, wbi=wbi)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h

    def emit_idr(idr_pic_id):
        specs = []
        probe = IntraEncoder(mb_w, mb_h, qp)
        for addr in range(n_mbs):
            spec = random_intra_mb(rng, ('i4', 'i16'), max_level, density)
            resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w, spec)
            probe.parsed.add((addr % mb_w, addr // mb_w))
            specs.append(spec)
        return make_idr_slice(mb_w, mb_h, specs, slice_qp=qp,
                              idr_pic_id=idr_pic_id,
                              deblock_idc=deblock_idc, log2_max_poc_lsb=6)

    def emit_p(g):
        # P reference frame at poc 8g, frame_num g
        nr = min(g, 2)
        specs = []
        probe = IntraEncoder(mb_w, mb_h, qp)
        for addr in range(n_mbs):
            spec = random_p_mb(rng, nr, max_level, density, mv_range)
            if spec.kind in ('i4', 'i16'):
                resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w,
                                     spec)
            probe.parsed.add((addr % mb_w, addr // mb_w))
            specs.append(spec)
        return make_p_slice(mb_w, mb_h, specs, slice_qp=qp,
                            frame_num=g % 16, poc_lsb=(8 * g) % 64, nrefs=nr,
                            pps_nrefs=2, deblock_idc=deblock_idc,
                            log2_max_poc_lsb=6)

    def emit_b(g):
        # non-ref B frame at poc 8g-4, frame_num g+1 (prev ref + 1)
        nrefs_b = (min(g + 1, b_nrefs[0]), 1)
        specs = []
        probe = IntraEncoder(mb_w, mb_h, qp)
        for addr in range(n_mbs):
            spec = random_b_mb(rng, nrefs_b, max_level, density, mv_range)
            if spec.kind in ('i4', 'i16'):
                resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w,
                                     spec)
            probe.parsed.add((addr % mb_w, addr // mb_w))
            specs.append(spec)
        return make_b_slice(mb_w, mb_h, specs, slice_qp=qp,
                            frame_num=(g + 1) % 16,
                            poc_lsb=(8 * g - 4) % 64, nrefs=nrefs_b,
                            pps_nrefs=(2, 1), direct_spatial=direct_spatial,
                            deblock_idc=deblock_idc, log2_max_poc_lsb=6)

    if closed:
        for gop in range(n_gops):
            out += emit_idr(gop % 16)
            for j in range(1, gop_pb + 1):
                out += emit_p(j)
                out += emit_b(j)
        return out
    out += emit_idr(0)
    for g in range(1, n_gops + 1):
        out += emit_p(g)
        out += emit_b(g)
    return out


# ---------------------------------------------------------------------------
# CABAC slice encoding: mirrors the decoder's context scheme
# (native/src/mb_cabac.cpp).  Single slice per frame.

from tools.cabac_enc import CabacWriter


class CabacSliceEncoder:
    """Per-frame CABAC mb-layer encoder with full neighbour-context
    tracking (nz/cbp/absmvd/refnz/skip/direct/chroma-mode state)."""

    def __init__(self, mb_w, mb_h, qp, init_table, bitwriter):
        self.mb_w, self.mb_h = mb_w, mb_h
        self.qp = qp
        self.c = CabacWriter(bitwriter, qp, init_table)
        self.w = bitwriter
        n = mb_w * mb_h
        self.flags = [0] * n            # 1 intra, 2 i16, 4 pcm, 16 skip,
                                        # 128 direct, 8 transform_8x8
        self.pps_t8 = False
        self.cbp = [0] * n              # luma | chroma<<4
        self.chmode = [None] * n
        self.dc_cbf = [[0, 0, 0] for _ in range(n)]   # y, cb, cr
        self.nz_y = {}                  # (gby,gbx) -> cbf
        self.nz_c = {}                  # (comp,gy,gx) -> cbf
        self.modes = {}                 # intra4x4 modes
        self.refnz = {}                 # (l, qy, qx) -> refIdx>0
        self.absmvd = {}                # (l, gy, gx) -> (ax, ay)
        self.qp_delta_nz = 0
        self.mvs = MvState(mb_w, mb_h)

    # -- availability helpers (mirror IntraEncoder) ------------------------
    def mb_avail(self, mx, my):
        return 0 <= mx < self.mb_w and 0 <= my < self.mb_h and \
            (mx, my) in self.mvs.parsed

    def blkA_avail(self, mx, my, i):
        return True if BLK4_X[i] > 0 else self.mb_avail(mx - 1, my)

    def blkB_avail(self, mx, my, i):
        return True if BLK4_Y[i] > 0 else self.mb_avail(mx, my - 1)

    def blkC_avail(self, mx, my, i):
        bx, by = BLK4_X[i], BLK4_Y[i]
        if by == 0:
            return self.mb_avail(mx, my - 1) if bx < 3 else                 self.mb_avail(mx + 1, my - 1)
        if bx == 3:
            return False
        return BLK_ORD[by - 1][bx + 1] < i

    def blkD_avail(self, mx, my, i):
        bx, by = BLK4_X[i], BLK4_Y[i]
        if bx == 0 and by == 0:
            return self.mb_avail(mx - 1, my - 1)
        if by == 0:
            return self.mb_avail(mx, my - 1)
        if bx == 0:
            return self.mb_avail(mx - 1, my)
        return True

    def neighbor_mode(self, gby, gbx, _):
        return self.modes.get((gby, gbx), 2)

    # -- context helpers ---------------------------------------------------
    def _skip_inc(self, mx, my):
        a = self.mb_avail(mx - 1, my) and \
            not (self.flags[my * self.mb_w + mx - 1] & 16)
        b = self.mb_avail(mx, my - 1) and \
            not (self.flags[(my - 1) * self.mb_w + mx] & 16)
        return int(a) + int(b)

    def _cbf_nbr(self, avail, nbr_pcm, cbf, cur_intra):
        if not avail:
            return 1 if cur_intra else 0
        return 1 if nbr_pcm else cbf

    def _cbf_inc_luma4(self, mx, my, i, cur_intra):
        gbx, gby = mx * 4 + BLK4_X[i], my * 4 + BLK4_Y[i]
        aA = BLK4_X[i] > 0 or self.mb_avail(mx - 1, my)
        aB = BLK4_Y[i] > 0 or self.mb_avail(mx, my - 1)
        a = self._cbf_nbr(aA, aA and self.flags[(gby // 4) * self.mb_w
                          + (gbx - 1) // 4] & 4,
                          self.nz_y.get((gby, gbx - 1), 0), cur_intra) \
            if aA else self._cbf_nbr(False, False, 0, cur_intra)
        b = self._cbf_nbr(aB, aB and self.flags[((gby - 1) // 4) * self.mb_w
                          + gbx // 4] & 4,
                          self.nz_y.get((gby - 1, gbx), 0), cur_intra) \
            if aB else self._cbf_nbr(False, False, 0, cur_intra)
        return a + 2 * b

    def _cbf_inc_chroma(self, mx, my, comp, cx, cy, cur_intra):
        gx, gy = mx * 2 + cx, my * 2 + cy
        aA = cx > 0 or self.mb_avail(mx - 1, my)
        aB = cy > 0 or self.mb_avail(mx, my - 1)
        a = self._cbf_nbr(aA, aA and self.flags[(gy // 2) * self.mb_w
                          + (gx - 1) // 2] & 4,
                          self.nz_c.get((comp, gy, gx - 1), 0), cur_intra) \
            if aA else self._cbf_nbr(False, False, 0, cur_intra)
        b = self._cbf_nbr(aB, aB and self.flags[((gy - 1) // 2) * self.mb_w
                          + gx // 2] & 4,
                          self.nz_c.get((comp, gy - 1, gx), 0), cur_intra) \
            if aB else self._cbf_nbr(False, False, 0, cur_intra)
        return a + 2 * b

    def _cbf_inc_dc(self, mx, my, comp, cur_intra):
        def of(nmx, nmy):
            f = self.flags[nmy * self.mb_w + nmx]
            if f & 4:
                return 1
            if comp == 0 and not (f & 2):
                return 0
            return self.dc_cbf[nmy * self.mb_w + nmx][comp]
        a = of(mx - 1, my) if self.mb_avail(mx - 1, my) \
            else self._cbf_nbr(False, False, 0, cur_intra)
        b = of(mx, my - 1) if self.mb_avail(mx, my - 1) \
            else self._cbf_nbr(False, False, 0, cur_intra)
        return a + 2 * b

    def _cbp_encode(self, mx, my, cbp_val):
        mbi = my * self.mb_w + mx
        cbp = 0
        for k in range(4):
            if k & 1:
                a = (cbp >> (k - 1) & 1) ^ 1
            elif self.mb_avail(mx - 1, my):
                a = (self.cbp[mbi - 1] >> (k + 1) & 1) ^ 1
            else:
                a = 0
            if k >= 2:
                b = (cbp >> (k - 2) & 1) ^ 1
            elif self.mb_avail(mx, my - 1):
                b = (self.cbp[mbi - self.mb_w] >> (k + 2) & 1) ^ 1
            else:
                b = 0
            bit = cbp_val >> k & 1
            self.c.encode(73 + a + 2 * b, bit)
            cbp |= bit << k
        ca = self.cbp[mbi - 1] >> 4 if self.mb_avail(mx - 1, my) else 0
        cb = self.cbp[mbi - self.mb_w] >> 4 \
            if self.mb_avail(mx, my - 1) else 0
        cc = cbp_val >> 4
        self.c.encode(77 + (ca > 0) + 2 * (cb > 0), 1 if cc else 0)
        if cc:
            self.c.encode(81 + (ca == 2) + 2 * (cb == 2), cc - 1)
        self.cbp[mbi] = cbp_val

    def _qp_delta(self, delta):
        delta = _safe_qpd(self.qp, delta)
        self.c.encode(60 + self.qp_delta_nz, 1 if delta else 0)
        self.qp_delta_nz = 1 if delta else 0
        if not delta:
            return
        count = 2 * delta - 1 if delta > 0 else -2 * delta
        for i in range(1, count):
            self.c.encode(62 if i == 1 else 63, 1)
        self.c.encode(62 if count == 1 else 63, 0)
        self.qp = (self.qp + delta + 52) % 52

    def _chroma_mode(self, mx, my, mode):
        def nzm(nmx, nmy):
            m_ = self.chmode[nmy * self.mb_w + nmx]
            return 1 if m_ not in (None, 0) else 0
        inc = (nzm(mx - 1, my) if self.mb_avail(mx - 1, my) else 0) \
            + (nzm(mx, my - 1) if self.mb_avail(mx, my - 1) else 0)
        ctx = 64 + inc
        for i in range(mode):
            self.c.encode(ctx, 1)
            ctx = 67
        if mode < 3:
            self.c.encode(ctx, 0)
        self.chmode[my * self.mb_w + mx] = mode

    def _ref_idx(self, mx, my, l, x4, y4, w4, h4, nrefs, ref):
        gqx, gqy = mx * 2 + (x4 >> 1), my * 2 + (y4 >> 1)
        if x4 > 0:
            a = self.refnz.get((l, gqy, gqx - (0 if x4 & 1 else 1)), 0)
        elif self.mb_avail(mx - 1, my):
            a = self.refnz.get((l, gqy, gqx - 1), 0)
        else:
            a = 0
        if y4 > 0:
            b = self.refnz.get((l, gqy - (0 if y4 & 1 else 1), gqx), 0)
        elif self.mb_avail(mx, my - 1):
            b = self.refnz.get((l, gqy - 1, gqx), 0)
        else:
            b = 0
        if nrefs > 1:
            self.c.ue_tu([54 + a + 2 * b, 58, 59], ref, 32)
        if ref > 0:
            for qy in range(y4 >> 1, (y4 + h4 - 1 >> 1) + 1):
                for qx in range(x4 >> 1, (x4 + w4 - 1 >> 1) + 1):
                    self.refnz[(l, my * 2 + qy, mx * 2 + qx)] = 1

    def _mvd(self, mx, my, l, x4, y4, w4, h4, mvdx, mvdy):
        gx, gy = mx * 4 + x4, my * 4 + y4
        for comp, val in ((0, mvdx), (1, mvdy)):
            s = 0
            if x4 > 0 or self.mb_avail(mx - 1, my):
                s += self.absmvd.get((l, gy, gx - 1), (0, 0))[comp]
            if y4 > 0 or self.mb_avail(mx, my - 1):
                s += self.absmvd.get((l, gy - 1, gx), (0, 0))[comp]
            inc = (1 if s >= 3 else 0) + (1 if s > 32 else 0)
            self.c.mvd(40 if comp == 0 else 47, inc, val)
        ax, ay = min(abs(mvdx), 127), min(abs(mvdy), 127)
        for dy in range(h4):
            for dx in range(w4):
                self.absmvd[(l, gy + dy, gx + dx)] = (ax, ay)

    def _residuals(self, mx, my, spec, cbp, is16, cur_intra):
        mbi = my * self.mb_w + mx
        if is16:
            dc = spec.dc_coeffs
            cbf = 1 if any(dc) else 0
            self.c.encode(CAT_CBF[0] + self._cbf_inc_dc(mx, my, 0, cur_intra),
                          cbf)
            self.dc_cbf[mbi][0] = cbf
            if cbf:
                self.c.residual_block(0, dc, None, 0, 15)
        for i8 in range(4):
            if not (cbp >> i8 & 1):
                continue
            for k in range(4):
                i = i8 * 4 + k
                coeffs = spec.luma_coeffs[i]
                if is16:
                    blockc = [0] + coeffs[1:]
                    cbf = 1 if any(coeffs[1:]) else 0
                else:
                    blockc = coeffs
                    cbf = 1 if any(coeffs) else 0
                cat = 1 if is16 else 2
                self.c.encode(CAT_CBF[cat]
                              + self._cbf_inc_luma4(mx, my, i, cur_intra), cbf)
                gbx, gby = mx * 4 + BLK4_X[i], my * 4 + BLK4_Y[i]
                self.nz_y[(gby, gbx)] = cbf
                if cbf:
                    if is16:
                        self.c.residual_block(1, blockc, None, 1, 15)
                    else:
                        self.c.residual_block(2, blockc, None, 0, 15)
        cc = cbp >> 4
        if cc:
            for comp in range(2):
                dc = spec.chroma_dc[comp]
                cbf = 1 if any(dc) else 0
                self.c.encode(CAT_CBF[3]
                              + self._cbf_inc_dc(mx, my, 1 + comp, cur_intra),
                              cbf)
                self.dc_cbf[mbi][1 + comp] = cbf
                if cbf:
                    self.c.residual_block(3, dc, None, 0, 3)
        if cc == 2:
            for comp in range(2):
                for cy in range(2):
                    for cx in range(2):
                        coeffs = spec.chroma_ac[comp][cy * 2 + cx]
                        blockc = [0] + coeffs[1:]
                        cbf = 1 if any(coeffs[1:]) else 0
                        self.c.encode(
                            CAT_CBF[4] + self._cbf_inc_chroma(
                                mx, my, comp, cx, cy, cur_intra), cbf)
                        self.nz_c[(comp, my * 2 + cy, mx * 2 + cx)] = cbf
                        if cbf:
                            self.c.residual_block(4, blockc, None, 1, 15)

    def _t8_flag(self, mx, my, val):
        mbi = my * self.mb_w + mx
        inc = (1 if self.mb_avail(mx - 1, my) and
               self.flags[mbi - 1] & 8 else 0) \
            + (1 if self.mb_avail(mx, my - 1) and
               self.flags[mbi - self.mb_w] & 8 else 0)
        self.c.encode(399 + inc, 1 if val else 0)
        if val:
            self.flags[mbi] |= 8

    def _residuals8(self, mx, my, spec, cbp):
        mbi = my * self.mb_w + mx
        for i8 in range(4):
            if not (cbp >> i8 & 1):
                continue
            c8 = spec.luma8_coeffs[i8]
            self.c.residual_block(5, c8, None, 0, 63)
            for k in range(4):
                i = i8 * 4 + k
                self.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = 1
        cc = cbp >> 4
        if cc:
            for comp in range(2):
                dc = spec.chroma_dc[comp]
                cbf = 1 if any(dc) else 0
                self.c.encode(CAT_CBF[3]
                              + self._cbf_inc_dc(mx, my, 1 + comp, True), cbf)
                self.dc_cbf[mbi][1 + comp] = cbf
                if cbf:
                    self.c.residual_block(3, dc, None, 0, 3)
        if cc == 2:
            for comp in range(2):
                for cy in range(2):
                    for cx in range(2):
                        coeffs = spec.chroma_ac[comp][cy * 2 + cx]
                        blockc = [0] + coeffs[1:]
                        cbf = 1 if any(coeffs[1:]) else 0
                        self.c.encode(
                            CAT_CBF[4] + self._cbf_inc_chroma(
                                mx, my, comp, cx, cy, True), cbf)
                        self.nz_c[(comp, my * 2 + cy, mx * 2 + cx)] = cbf
                        if cbf:
                            self.c.residual_block(4, blockc, None, 1, 15)

    def encode_i8_mb(self, mx, my, spec, slice_type):
        mbi = my * self.mb_w + mx
        c = self.c
        if slice_type == 2:
            def nb_inc(nmx, nmy):
                f = self.flags[nmy * self.mb_w + nmx]
                return 1 if (f & 1) and (f & (2 | 4)) else 0
            inc = (nb_inc(mx - 1, my)
                   if self.mb_avail(mx - 1, my) else 0) \
                + (nb_inc(mx, my - 1)
                   if self.mb_avail(mx, my - 1) else 0)
            base = 3 + inc
        else:
            base = 17 if slice_type == 0 else 32
        c.encode(base, 0)       # I_NxN
        self._t8_flag(mx, my, True)
        _encode_i8_modes(None, self, mx, my, spec, cabac=c)
        self._chroma_mode(mx, my, spec.chroma_mode)
        self.flags[mbi] |= 1
        self._cbp_encode(mx, my, spec.cbp)
        if spec.cbp:
            self._qp_delta(spec.qp_delta)
        else:
            self.qp_delta_nz = 0
        self._residuals8(mx, my, spec, spec.cbp)
        self.mvs.start_mb(mx, my)
        self.mvs.finish_mb(True)
        self.mvs.parsed.add((mx, my))

    # -- macroblocks -------------------------------------------------------
    def encode_i_mb(self, mx, my, spec, slice_type):
        mbi = my * self.mb_w + mx
        c = self.c
        if slice_type == 2:
            def nb_inc(nmx, nmy):
                f = self.flags[nmy * self.mb_w + nmx]
                return 1 if (f & 1) and (f & (2 | 4)) else 0
            inc = (nb_inc(mx - 1, my)
                   if self.mb_avail(mx - 1, my) else 0) \
                + (nb_inc(mx, my - 1)
                   if self.mb_avail(mx, my - 1) else 0)
            base = 3 + inc
        elif slice_type == 0:
            base = 17
        else:
            base = 32

        if spec.kind == 'pcm':
            c.encode(base, 1)
            c.terminate(1)
            self.w.align_zero()
            for v in spec.samples_y:
                self.w.u(v, 8)
            for v in spec.samples_cb:
                self.w.u(v, 8)
            for v in spec.samples_cr:
                self.w.u(v, 8)
            c.restart()
            self.flags[mbi] = 1 | 4
            self.cbp[mbi] = 15 | 2 << 4
            for i in range(16):
                self.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = 1
            for comp in range(2):
                for cy in range(2):
                    for cx in range(2):
                        self.nz_c[(comp, my * 2 + cy, mx * 2 + cx)] = 1
            self.qp_delta_nz = 0
            # PCM mbs ARE available neighbours (the decoder claims them
            # like any parsed mb); slice-local availability reads parsed
            self.mvs.parsed.add((mx, my))
            return

        if spec.kind == 'i4':
            c.encode(base, 0)
            if self.pps_t8:
                self._t8_flag(mx, my, False)
            for i in range(16):
                gbx, gby = mx * 4 + BLK4_X[i], my * 4 + BLK4_Y[i]
                aA = BLK4_X[i] > 0 or self.mb_avail(mx - 1, my)
                aB = BLK4_Y[i] > 0 or self.mb_avail(mx, my - 1)
                mA = self.modes.get((gby, gbx - 1), 2) if aA else -1
                mB = self.modes.get((gby - 1, gbx), 2) if aB else -1
                pred = 2 if (mA < 0 or mB < 0) else min(mA, mB)
                mode = spec.modes[i]
                if mode is None:
                    mode = pred
                if mode == pred:
                    c.encode(68, 1)
                else:
                    rem = mode - (1 if mode > pred else 0)
                    c.encode(68, 0)
                    c.encode(69, rem & 1)
                    c.encode(69, rem >> 1 & 1)
                    c.encode(69, rem >> 2 & 1)
                self.modes[(gby, gbx)] = mode
            self._chroma_mode(mx, my, spec.chroma_mode)
            self.flags[mbi] = 1
            self._cbp_encode(mx, my, spec.cbp)
            if spec.cbp:
                self._qp_delta(spec.qp_delta)
            else:
                self.qp_delta_nz = 0
            self._residuals(mx, my, spec, spec.cbp, False, True)
        else:                   # i16
            c.encode(base, 1)
            c.terminate(0)
            ctx = max(base, 5)
            cbp_luma = 1 if (spec.cbp & 15) else 0
            c.encode(ctx + 1, cbp_luma)
            cc = spec.cbp >> 4
            c.encode(ctx + 2, 1 if cc else 0)
            c6 = max(ctx, 6)
            if cc:
                c.encode(c6 + 2, cc - 1)
            mode = spec.pred_mode
            c.encode(c6 + 3, mode >> 1)
            c.encode(max(c6 + 3, 10), mode & 1)
            for i in range(16):
                self.modes.pop((my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i]), None)
            self._chroma_mode(mx, my, spec.chroma_mode)
            self.flags[mbi] = 1 | 2
            self.cbp[mbi] = (15 if cbp_luma else 0) | cc << 4
            self._qp_delta(spec.qp_delta)
            self._residuals(mx, my, spec,
                            (15 if cbp_luma else 0) | cc << 4, True, True)
        self.mvs.start_mb(mx, my)
        self.mvs.finish_mb(True)
        self.mvs.parsed.add((mx, my))


CAT_CBF = {0: 85, 1: 89, 2: 93, 3: 97, 4: 101}


def _cabac_p_mb(enc: CabacSliceEncoder, mx, my, spec, nrefs):
    c = enc.c
    mbi = my * enc.mb_w + mx
    if spec.kind == 'skip':
        c.encode(11 + enc._skip_inc(mx, my), 1)
        enc.mvs.start_mb(mx, my)
        mvx, mvy = enc.mvs.skip_mv()
        enc.mvs.store(0, 0, 0, 4, 4, mvx, mvy)
        enc.mvs.finish_mb(False)
        enc.flags[mbi] = 16
        enc.qp_delta_nz = 0
        return
    c.encode(11 + enc._skip_inc(mx, my), 0)
    if spec.kind in ('i4', 'i16', 'pcm'):
        c.encode(14, 1)        # mb_type prefix: intra
        enc.encode_i_mb(mx, my, spec, 0)
        return
    c.encode(14, 0)
    enc.mvs.start_mb(mx, my)
    kind2t = {'p16': 0, 'p16x8': 3, 'p8x16': 2, 'p8': 1}
    t = kind2t[spec.kind]
    c.encode(15, t >> 1)
    c.encode(16 + (t >> 1), t & 1)
    parts = {'p16': [(0, 0, 4, 4, 0, 0)],
             'p16x8': [(0, 0, 4, 2, 1, 0), (0, 2, 4, 2, 2, 2)],
             'p8x16': [(0, 0, 2, 4, 3, 0), (2, 0, 2, 4, 4, 1)]}.get(spec.kind)
    if spec.kind != 'p8':
        for i, (x4, y4, w4, h4, shape, ri) in enumerate(parts):
            enc._ref_idx(mx, my, 0, x4, y4, w4, h4, nrefs, spec.refidx[i])
        for i, (x4, y4, w4, h4, shape, ri) in enumerate(parts):
            dx, dy = spec.mvds[i]
            enc._mvd(mx, my, 0, x4, y4, w4, h4, dx, dy)
            px, py = enc.mvs.mvp(spec.refidx[i], x4, y4, w4, h4, shape)
            enc.mvs.store(spec.refidx[i], x4, y4, w4, h4, px + dx, py + dy)
    else:
        for st in spec.sub_types:
            if st == 0:
                c.encode(21, 1)
            elif st == 1:
                c.encode(21, 0); c.encode(22, 0)
            elif st == 2:
                c.encode(21, 0); c.encode(22, 1); c.encode(23, 1)
            else:
                c.encode(21, 0); c.encode(22, 1); c.encode(23, 0)
        for q in range(4):
            enc._ref_idx(mx, my, 0, (q & 1) * 2, (q >> 1) * 2, 2, 2, nrefs,
                         spec.refidx[q])
        mvd_i = 0
        for q in range(4):
            bx, by = (q & 1) * 2, (q >> 1) * 2
            w4, h4 = SUB_WH[spec.sub_types[q]]
            for sy in range(0, 2, h4):
                for sx in range(0, 2, w4):
                    dx, dy = spec.mvds[mvd_i]
                    mvd_i += 1
                    enc._mvd(mx, my, 0, bx + sx, by + sy, w4, h4, dx, dy)
                    px, py = enc.mvs.mvp(spec.refidx[q], bx + sx, by + sy,
                                         w4, h4, 0)
                    enc.mvs.store(spec.refidx[q], bx + sx, by + sy, w4, h4,
                                  px + dx, py + dy)
    enc.mvs.finish_mb(False)
    enc.flags[mbi] = 0
    enc._cbp_encode(mx, my, spec.cbp)
    if (spec.cbp & 15) and enc.pps_t8 and (
            spec.kind != 'p8' or all(s == 0 for s in spec.sub_types)):
        enc._t8_flag(mx, my, False)
    if spec.cbp:
        enc._qp_delta(spec.qp_delta)
    else:
        enc.qp_delta_nz = 0
    enc._residuals(mx, my, spec, spec.cbp, False, False)


def _cabac_b_mb(enc: CabacSliceEncoder, mx, my, spec, nrefs):
    c = enc.c
    mbi = my * enc.mb_w + mx
    if spec.kind == 'bskip':
        c.encode(24 + enc._skip_inc(mx, my), 1)
        enc.flags[mbi] = 16 | 128
        enc.qp_delta_nz = 0
        enc.mvs.parsed.add((mx, my))
        return
    c.encode(24 + enc._skip_inc(mx, my), 0)
    if spec.kind in ('i4', 'i16', 'pcm'):
        # B mb_type prefix for intra: str == 13
        da = enc.mb_avail(mx - 1, my) and enc.flags[mbi - 1] & 128
        db = enc.mb_avail(mx, my - 1) and \
            enc.flags[(my - 1) * enc.mb_w + mx] & 128
        inc = (1 if enc.mb_avail(mx - 1, my) and not da else 0) \
            + (1 if enc.mb_avail(mx, my - 1) and not db else 0)
        c.encode(27 + inc, 1)
        c.encode(30, 1)
        for ctx, b in ((31, 1), (32, 1), (32, 0), (32, 1)):  # str 13 = 1101
            c.encode(ctx, b)
        enc.encode_i_mb(mx, my, spec, 1)
        return
    da = enc.mb_avail(mx - 1, my) and enc.flags[mbi - 1] & 128
    db = enc.mb_avail(mx, my - 1) and \
        enc.flags[(my - 1) * enc.mb_w + mx] & 128
    inc = (1 if enc.mb_avail(mx - 1, my) and not da else 0) \
        + (1 if enc.mb_avail(mx, my - 1) and not db else 0)
    if spec.kind == 'bdirect':
        c.encode(27 + inc, 0)
        enc.flags[mbi] = 128
        enc.mvs.parsed.add((mx, my))
        enc._cbp_encode(mx, my, spec.cbp)
        if (spec.cbp & 15) and enc.pps_t8:
            enc._t8_flag(mx, my, False)    # direct_8x8_inference is on
        if spec.cbp:
            enc._qp_delta(spec.qp_delta)
        else:
            enc.qp_delta_nz = 0
        enc._residuals(mx, my, spec, spec.cbp, False, False)
        return
    c.encode(27 + inc, 1)
    # mb_type -> str
    if spec.kind == 'b16':
        mb_type = spec.use[0]           # 1,2,3
    elif spec.kind in ('b16x8', 'b8x16'):
        k = B_PAIR_USE.index((spec.use[0], spec.use[1]))
        mb_type = 4 + 2 * k + (1 if spec.kind == 'b8x16' else 0)
    else:
        mb_type = 22
    mb2str = {1: 8, 2: 9, 22: 15}
    if mb_type in (1, 2):
        c.encode(30, 0)
        c.encode(32, mb_type - 1)
    else:
        strv = mb2str.get(mb_type)
        if strv is None:
            if mb_type <= 10:
                strv = mb_type - 3      # 3..10 -> 0..7
            elif mb_type == 11:
                strv = 14
            else:
                strv = mb_type + 4      # 12..21 -> 16..25
        c.encode(30, 1)
        if strv < 8:
            c.encode(31, strv >> 3 & 1)
            c.encode(32, strv >> 2 & 1)
            c.encode(32, strv >> 1 & 1)
            c.encode(32, strv & 1)
        elif strv in (14, 15):
            c.encode(31, 1)
            c.encode(32, 1)
            c.encode(32, strv >> 1 & 1)
            c.encode(32, strv & 1)
        else:                           # 16..25: 5 bins
            c.encode(31, strv >> 4 & 1)
            c.encode(32, strv >> 3 & 1)
            c.encode(32, strv >> 2 & 1)
            c.encode(32, strv >> 1 & 1)
            c.encode(32, strv & 1)
    enc.mvs.parsed.add((mx, my))
    uses = [B_SUB_USE[st] for st in spec.sub_types] if spec.kind == 'b8' \
        else list(spec.use)
    if spec.kind == 'b8':
        for st in spec.sub_types:
            if st == 0:
                c.encode(36, 0)
                continue
            c.encode(36, 1)
            if st in (1, 2):
                c.encode(37, 0)
                c.encode(39, st - 1)
                continue
            s2 = {3: 0, 4: 1, 5: 2, 6: 3, 11: 6, 12: 7, 7: 8, 8: 9,
                  9: 10, 10: 11}[st]
            c.encode(37, 1)
            if s2 < 8:
                c.encode(38, s2 >> 2 & 1)
                c.encode(39, s2 >> 1 & 1)
                c.encode(39, s2 & 1)
            else:                       # extended: prefix = s2>>1 (4..5)
                c.encode(38, s2 >> 3 & 1)
                c.encode(39, s2 >> 2 & 1)
                c.encode(39, s2 >> 1 & 1)
                c.encode(39, s2 & 1)
    # ref_idx l0 then l1
    for l in range(2):
        for i, u in enumerate(uses):
            if spec.kind == 'b8' and spec.sub_types[i] == 0:
                continue
            if u >> l & 1:
                if spec.kind == 'b8':
                    x4, y4, w4, h4 = (i & 1) * 2, (i >> 1) * 2, 2, 2
                elif spec.kind == 'b16':
                    x4, y4, w4, h4 = 0, 0, 4, 4
                elif spec.kind == 'b16x8':
                    x4, y4, w4, h4 = 0, i * 2, 4, 2
                else:
                    x4, y4, w4, h4 = i * 2, 0, 2, 4
                enc._ref_idx(mx, my, l, x4, y4, w4, h4, nrefs[l],
                             spec.refidx[l][i])
    # mvds l0 then l1
    mvd_i = 0
    for l in range(2):
        for i, u in enumerate(uses):
            if spec.kind == 'b8' and spec.sub_types[i] == 0:
                continue
            if not (u >> l & 1):
                continue
            if spec.kind == 'b8':
                w4, h4 = B_SUB_WH[spec.sub_types[i]]
                bx, by = (i & 1) * 2, (i >> 1) * 2
                for sy in range(0, 2, h4):
                    for sx in range(0, 2, w4):
                        dx, dy = spec.mvds[mvd_i]
                        mvd_i += 1
                        enc._mvd(mx, my, l, bx + sx, by + sy, w4, h4, dx, dy)
            else:
                if spec.kind == 'b16':
                    x4, y4, w4, h4 = 0, 0, 4, 4
                elif spec.kind == 'b16x8':
                    x4, y4, w4, h4 = 0, i * 2, 4, 2
                else:
                    x4, y4, w4, h4 = i * 2, 0, 2, 4
                dx, dy = spec.mvds[mvd_i]
                mvd_i += 1
                enc._mvd(mx, my, l, x4, y4, w4, h4, dx, dy)
    enc.flags[mbi] = 0
    enc._cbp_encode(mx, my, spec.cbp)
    if (spec.cbp & 15) and enc.pps_t8:
        b8ok = spec.kind != 'b8' or all(s <= 3 for s in spec.sub_types)
        if b8ok:
            enc._t8_flag(mx, my, False)
    if spec.cbp:
        enc._qp_delta(spec.qp_delta)
    else:
        enc.qp_delta_nz = 0
    enc._residuals(mx, my, spec, spec.cbp, False, False)


def make_cabac_slice(mb_w, mb_h, specs, slice_type, *, slice_qp=26,
                     init_qp=26, frame_num=0, idr_pic_id=0, poc_lsb=0,
                     idr=False, nal_ref_idc=3, nrefs=(1, 1), pps_nrefs=None,
                     cabac_init_idc=0, direct_spatial=True, deblock_idc=None,
                     log2_max_frame_num=4, log2_max_poc_lsb=6,
                     first_mb=0, pps_id=0, weights=None) -> bytes:
    """One CABAC slice (I/P/B) covering mbs [first_mb, first_mb+len(specs))."""
    w = BitWriter()
    w.ue(first_mb)
    w.ue(slice_type + 5)       # "all slices are ..." variants
    w.ue(pps_id)
    w.u(frame_num, log2_max_frame_num)
    if idr:
        w.ue(idr_pic_id)
    w.u(poc_lsb, log2_max_poc_lsb)
    if slice_type == 1:
        w.u1(1 if direct_spatial else 0)
    if slice_type != 2:
        if pps_nrefs is not None and tuple(nrefs) != tuple(pps_nrefs):
            w.u1(1)
            w.ue(nrefs[0] - 1)
            if slice_type == 1:
                w.ue(nrefs[1] - 1)
        else:
            w.u1(0)
        w.u1(0)                # ref_pic_list_modification_flag_l0
        if slice_type == 1:
            w.u1(0)            # ..._l1
        if weights is not None:
            write_pwt(w, weights, nrefs[0],
                      nrefs[1] if slice_type == 1 else 0)
    if nal_ref_idc:
        if idr:
            w.u1(0)
            w.u1(0)
        else:
            w.u1(0)            # adaptive_ref_pic_marking_mode_flag
    if slice_type != 2:
        w.ue(cabac_init_idc)
    w.se(slice_qp - init_qp)
    if deblock_idc is not None:
        w.ue(deblock_idc)
        if deblock_idc != 1:
            w.se(0)
            w.se(0)
    while len(w.bits) % 8:
        w.u1(1)                # cabac_alignment_one_bit
    init_table = 0 if slice_type == 2 else 1 + cabac_init_idc
    enc = CabacSliceEncoder(mb_w, mb_h, slice_qp, init_table, w)
    n = len(specs)
    for i, spec in enumerate(specs):
        addr = first_mb + i
        mx, my = addr % mb_w, addr // mb_w
        if slice_type == 2:
            enc.encode_i_mb(mx, my, spec, 2)
        elif slice_type == 0:
            _cabac_p_mb(enc, mx, my, spec, nrefs[0])
        else:
            _cabac_b_mb(enc, mx, my, spec, nrefs)
        enc.c.terminate(0 if i < n - 1 else 1)
    w.align_zero()
    return nal(nal_ref_idc, 5 if idr else 1, w.bytes_unescaped())


def gen_random_cabac_stream(mb_w, mb_h, n_frames=1, seed=0, *, qp=26,
                            kinds=('i4', 'i16', 'pcm'), max_level=8,
                            density=0.3, deblock=True,
                            cabac_init_idc=0) -> bytes:
    """All-intra CABAC stream (IDR + I frames)."""
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h, log2_max_poc_lsb=6) \
        + make_pps(cabac=True, deblock_control=not deblock)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h
    for f in range(n_frames):
        specs = []
        probe = IntraEncoder(mb_w, mb_h, qp)
        for addr in range(n_mbs):
            spec = random_intra_mb(rng, kinds, max_level, density)
            resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w, spec)
            probe.parsed.add((addr % mb_w, addr // mb_w))
            specs.append(spec)
        out += make_cabac_slice(mb_w, mb_h, specs, 2, slice_qp=qp,
                                frame_num=0 if f == 0 else f % 16,
                                idr_pic_id=f, poc_lsb=(2 * f) % 64,
                                idr=(f == 0), deblock_idc=deblock_idc)
    return out


def gen_random_cabac_ipb_stream(mb_w, mb_h, n_gops=2, seed=0, *, qp=26,
                                max_level=8, density=0.3, mv_range=32,
                                direct_spatial=True, wbi=0, with_b=True,
                                cabac_init_idc=0, deblock=True,
                                closed=False, gop_pb=2,
                                slices_per_frame=1,
                                intra_prob=None) -> bytes:
    """CABAC IDR + per GOP: P (ref) [+ non-ref B between] — the CABAC twin
    of gen_random_ipb_stream.  closed=True: n_gops CLOSED GOPs, each its
    own IDR (distinct idr_pic_id, frame_num/POC reset) + gop_pb P[+B]
    pairs, independent across IDRs like the reference's frame-task
    dependency rule (edge264_headers.c:1275-1277).  slices_per_frame>1
    splits every frame at random mb bounds (per-slice availability)."""
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h, max_ref_frames=3, log2_max_poc_lsb=6) \
        + make_pps(cabac=True, deblock_control=not deblock, nrefs=2,
                   nrefs1=1, wbi=wbi)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h

    def slice_bounds():
        bounds = [0]
        for s in range(1, slices_per_frame):
            bounds.append(rng.randrange(
                bounds[-1] + 1, n_mbs - (slices_per_frame - s) + 1))
        bounds.append(n_mbs)
        return bounds

    def emit_idr(idr_pic_id):
        out = b""
        bounds = slice_bounds()
        for s in range(slices_per_frame):
            specs = []
            probe = IntraEncoder(mb_w, mb_h, qp)
            for addr in range(bounds[s], bounds[s + 1]):
                spec = random_intra_mb(rng, ('i4', 'i16'), max_level,
                                       density)
                resolve_random_modes(rng, probe, addr % mb_w, addr // mb_w,
                                     spec)
                probe.parsed.add((addr % mb_w, addr // mb_w))
                specs.append(spec)
            out += make_cabac_slice(mb_w, mb_h, specs, 2, slice_qp=qp,
                                    idr=True, idr_pic_id=idr_pic_id,
                                    first_mb=bounds[s],
                                    deblock_idc=deblock_idc)
        return out

    def emit_p(g):
        nr = min(g, 2)
        out = b""
        bounds = slice_bounds()
        for s in range(slices_per_frame):
            specs = []
            probe = IntraEncoder(mb_w, mb_h, qp)
            for addr in range(bounds[s], bounds[s + 1]):
                spec = random_p_mb(rng, nr, max_level, density, mv_range,
                                   *(() if intra_prob is None
                                     else (intra_prob,)))
                if spec.kind in ('i4', 'i16'):
                    resolve_random_modes(rng, probe, addr % mb_w,
                                         addr // mb_w, spec)
                probe.parsed.add((addr % mb_w, addr // mb_w))
                specs.append(spec)
            out += make_cabac_slice(mb_w, mb_h, specs, 0, slice_qp=qp,
                                    frame_num=g % 16, poc_lsb=(8 * g) % 64,
                                    nrefs=(nr, 1), pps_nrefs=(2, 1),
                                    first_mb=bounds[s],
                                    cabac_init_idc=cabac_init_idc,
                                    deblock_idc=deblock_idc)
        return out

    def emit_b(g):
        nb = (min(g + 1, 2), 1)
        out = b""
        bounds = slice_bounds()
        for s in range(slices_per_frame):
            specs = []
            probe = IntraEncoder(mb_w, mb_h, qp)
            for addr in range(bounds[s], bounds[s + 1]):
                spec = random_b_mb(rng, nb, max_level, density, mv_range,
                                   *(() if intra_prob is None
                                     else (intra_prob,)))
                if spec.kind in ('i4', 'i16'):
                    resolve_random_modes(rng, probe, addr % mb_w,
                                         addr // mb_w, spec)
                probe.parsed.add((addr % mb_w, addr // mb_w))
                specs.append(spec)
            out += make_cabac_slice(mb_w, mb_h, specs, 1, slice_qp=qp,
                                    frame_num=(g + 1) % 16, nal_ref_idc=0,
                                    poc_lsb=(8 * g - 4) % 64, nrefs=nb,
                                    pps_nrefs=(2, 1), first_mb=bounds[s],
                                    cabac_init_idc=cabac_init_idc,
                                    direct_spatial=direct_spatial,
                                    deblock_idc=deblock_idc)
        return out

    if closed:
        for gop in range(n_gops):
            out += emit_idr(gop % 16)
            for j in range(1, gop_pb + 1):
                out += emit_p(j)
                if with_b:
                    out += emit_b(j)
        return out
    out += emit_idr(0)
    for g in range(1, n_gops + 1):
        out += emit_p(g)
        if with_b:
            out += emit_b(g)
    return out


# ---------------------------------------------------------------------------
# High profile: Intra_8x8 and inter transform_size_8x8 (CAVLC)

I8_AC = {0: 'B', 1: 'C', 2: True, 3: False}   # doc only


def _i8_avail(enc, mx, my, b):
    aA = (b & 1) or enc.mb_avail(mx - 1, my)
    aB = (b >> 1) or enc.mb_avail(mx, my - 1)
    aC = [enc.mb_avail(mx, my - 1), enc.mb_avail(mx + 1, my - 1),
          True, False][b]
    aD = [enc.mb_avail(mx - 1, my - 1), enc.mb_avail(mx, my - 1),
          enc.mb_avail(mx - 1, my), True][b]
    return aA, aB, aC, aD


def _encode_i8_modes(w, enc, mx, my, spec, cabac=None):
    for b in range(4):
        i = b * 4
        gbx = mx * 4 + BLK4_X[i]
        gby = my * 4 + BLK4_Y[i]
        aA = enc.blkA_avail(mx, my, i)
        aB = enc.blkB_avail(mx, my, i)
        mA = enc.neighbor_mode(gby, gbx - 1, None) if aA else -1
        mB = enc.neighbor_mode(gby - 1, gbx, None) if aB else -1
        pred = 2 if (mA < 0 or mB < 0) else min(mA, mB)
        mode = spec.modes[b]
        if mode is None:
            mode = pred
        if cabac is None:
            if mode == pred:
                w.u1(1)
            else:
                w.u1(0)
                w.u(mode - (1 if mode > pred else 0), 3)
        else:
            if mode == pred:
                cabac.encode(68, 1)
            else:
                rem = mode - (1 if mode > pred else 0)
                cabac.encode(68, 0)
                cabac.encode(69, rem & 1)
                cabac.encode(69, rem >> 1 & 1)
                cabac.encode(69, rem >> 2 & 1)
        for k in range(4):
            cell = i + k
            enc.modes[(my * 4 + BLK4_Y[cell], mx * 4 + BLK4_X[cell])] = mode


def _encode_i8_residuals_cavlc(w, enc, mx, my, spec):
    cbp = spec.cbp
    if cbp:
        spec.qp_delta = _safe_qpd(enc.qp, spec.qp_delta)
        w.se(spec.qp_delta)
        enc.qp = (enc.qp + spec.qp_delta + 52) % 52
    for i8 in range(4):
        if not (cbp >> i8 & 1):
            continue
        c8 = spec.luma8_coeffs[i8]      # 64 levels, 8x8 scan order
        for k in range(4):
            sub = [c8[4 * j + k] for j in range(16)]
            i = i8 * 4 + k
            nC = enc.nC_luma(mx, my, i)
            n = encode_residual_cavlc(w, sub, nC, 16)
            enc.nz_y[(my * 4 + BLK4_Y[i], mx * 4 + BLK4_X[i])] = n
    if cbp >> 4:
        for c in range(2):
            encode_residual_cavlc(w, spec.chroma_dc[c], -1, 4)
    if cbp >> 4 == 2:
        for c in range(2):
            for cy in range(2):
                for cx in range(2):
                    nC = enc.nC_chroma(c, mx, my, cx, cy)
                    n = encode_residual_cavlc(
                        w, spec.chroma_ac[c][cy * 2 + cx][1:], nC, 15)
                    enc.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = n


def encode_i8_mb_cavlc(w, enc, mx, my, spec, mb_type_offset=0):
    w.ue(mb_type_offset)        # I_NxN
    w.u1(1)                     # transform_size_8x8_flag
    _encode_i8_modes(w, enc, mx, my, spec)
    w.ue(spec.chroma_mode)
    w.ue(INV_ME_CBP_INTRA[spec.cbp])
    enc.parsed.add((mx, my))
    _encode_i8_residuals_cavlc(w, enc, mx, my, spec)


def random_i8_mb(rng, enc, mx, my, max_level=8, density=0.3):
    def rand_coeffs(n, start=0):
        c = [0] * n
        for i in range(start, n):
            if rng.random() < density:
                v = rng.randrange(1, max_level + 1)
                c[i] = v if rng.random() < 0.5 else -v
        return c

    modes = []
    for b in range(4):
        aA, aB, aC, aD = _i8_avail(enc, mx, my, b)
        # within-mb: left/top halves come from earlier 8x8s
        if b & 1:
            aA = True
        if b >> 1:
            aB = True
        allowed = [2]
        if aB:
            allowed += [0, 3, 7]
        if aA:
            allowed += [1, 8]
        if aA and aB and aD:
            allowed += [4, 5, 6]
        modes.append(rng.choice(allowed))
    aA, aB = enc.mb_avail(mx - 1, my), enc.mb_avail(mx, my - 1)
    aD = enc.mb_avail(mx - 1, my - 1)
    ch = [0]
    if aA:
        ch.append(1)
    if aB:
        ch.append(2)
    if aA and aB and aD:
        ch.append(3)
    return MbSpec('i8', modes=modes,
                  cbp=rng.randrange(16) | rng.choice([0, 1, 2]) << 4,
                  chroma_mode=rng.choice(ch), qp_delta=rng.randrange(-3, 4),
                  luma8_coeffs=[rand_coeffs(64) for _ in range(4)],
                  chroma_dc=[rand_coeffs(4) for _ in range(2)],
                  chroma_ac=[[rand_coeffs(16, 1) for _ in range(4)]
                             for _ in range(2)])


def gen_random_high_stream(mb_w, mb_h, n_frames=1, seed=0, *, qp=26,
                           kinds=('i4', 'i8', 'i16'), max_level=8,
                           density=0.3, deblock=True, scaling=False,
                           second_chroma_qp_off=None,
                           scaling4=None, scaling8=None) -> bytes:
    """High-profile all-intra CAVLC stream: 8x8 transforms, optional
    scaling matrices and separate Cb/Cr QP offsets (config #4).
    scaling4/scaling8 override the random matrices (entries may be None
    for 'not present' — the §7.3.2.1.1 fallback rules apply)."""
    rng = random.Random(seed)
    s4 = s8 = None
    if scaling:
        # weights kept near the flat-16 default: conformant encoders pick
        # (weight x level) products that keep transform intermediates in
        # 16 bits, which random levels would otherwise violate
        s4 = [[rng.randrange(8, 25) for _ in range(16)] for _ in range(6)]
        s8 = [[rng.randrange(8, 25) for _ in range(64)] for _ in range(2)]
    if scaling4 is not None:
        s4 = scaling4
    if scaling8 is not None:
        s8 = scaling8
    out = make_sps(mb_w, mb_h, profile=100, scaling4=s4, scaling8=s8)
    out += make_pps(deblock_control=not deblock, transform_8x8=True,
                    second_chroma_qp_off=second_chroma_qp_off)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h
    result = out
    for f in range(n_frames):
        w = BitWriter()
        w.ue(0)
        w.ue(7)
        w.ue(0)
        w.u(0 if f == 0 else f % 16, 4)
        if f == 0:
            w.ue(f)
        w.u((2 * f) % 16, 4)
        if f == 0:
            w.u1(0)            # no_output_of_prior_pics
            w.u1(0)            # long_term_reference_flag
        else:
            w.u1(0)            # adaptive_ref_pic_marking_mode_flag
        w.se(qp - 26)
        if deblock_idc is not None:
            w.ue(deblock_idc)
        enc = IntraEncoder(mb_w, mb_h, qp, pps_t8=True)
        for addr in range(n_mbs):
            mx, my = addr % mb_w, addr // mb_w
            kind = rng.choice(kinds)
            if kind == 'i8':
                spec = random_i8_mb(rng, enc, mx, my, max_level, density)
                encode_i8_mb_cavlc(w, enc, mx, my, spec)
            else:
                spec = random_intra_mb(rng, (kind,), max_level, density)
                resolve_random_modes(rng, enc, mx, my, spec)
                enc.encode_mb(w, mx, my, spec)
        w.rbsp_trailing()
        result += nal(3, 5 if f == 0 else 1, w.bytes_unescaped())
    return result


def random_p_mb_t8(rng, nrefs, max_level=8, density=0.3, mv_range=32):
    """P_L0_16x16 with transform_size_8x8 residual."""
    def rc(n):
        c = [0] * n
        for i in range(n):
            if rng.random() < density:
                v = rng.randrange(1, max_level + 1)
                c[i] = v if rng.random() < 0.5 else -v
        return c
    return MbSpec('p16t8', refidx=[rng.randrange(nrefs)],
                  mvds=[(rng.randrange(-mv_range, mv_range + 1),
                         rng.randrange(-mv_range, mv_range + 1))],
                  cbp=(rng.randrange(1, 16)) | rng.choice([0, 1, 2]) << 4,
                  qp_delta=rng.randrange(-3, 4),
                  luma8_coeffs=[rc(64) for _ in range(4)],
                  chroma_dc=[rc(4) for _ in range(2)],
                  chroma_ac=[[([0] + rc(15)) for _ in range(4)]
                             for _ in range(2)])


def gen_random_high_ipp_stream(mb_w, mb_h, n_frames=3, seed=0, *, qp=26,
                               nrefs=1, max_level=8, density=0.3,
                               mv_range=32, deblock=True,
                               t8_prob=0.5) -> bytes:
    """High-profile IPP stream mixing 4x4 and 8x8 transforms in P frames."""
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h, profile=100, max_ref_frames=max(nrefs, 1))
    out += make_pps(deblock_control=not deblock, nrefs=nrefs,
                    transform_8x8=True)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h
    # IDR: mixed intra incl. i8
    w = BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0); w.u(0, 4)
    w.u1(0); w.u1(0)
    w.se(qp - 26)
    if deblock_idc is not None:
        w.ue(deblock_idc)
    enc = IntraEncoder(mb_w, mb_h, qp, pps_t8=True)
    for addr in range(n_mbs):
        mx, my = addr % mb_w, addr // mb_w
        kind = rng.choice(('i4', 'i8', 'i16'))
        if kind == 'i8':
            spec = random_i8_mb(rng, enc, mx, my, max_level, density)
            encode_i8_mb_cavlc(w, enc, mx, my, spec)
        else:
            spec = random_intra_mb(rng, (kind,), max_level, density)
            resolve_random_modes(rng, enc, mx, my, spec)
            enc.encode_mb(w, mx, my, spec)
    w.rbsp_trailing()
    out += nal(3, 5, w.bytes_unescaped())
    for f in range(1, n_frames):
        nr = min(f, nrefs)
        w = BitWriter()
        w.ue(0); w.ue(5); w.ue(0); w.u(f % 16, 4); w.u((2 * f) % 16, 4)
        if nrefs > 1 and nr != nrefs:
            w.u1(1); w.ue(nr - 1)
        else:
            w.u1(0)
        w.u1(0)               # ref_pic_list_modification
        w.u1(0)               # adaptive marking
        w.se(qp - 26)
        if deblock_idc is not None:
            w.ue(deblock_idc)
        enc = IntraEncoder(mb_w, mb_h, qp, pps_t8=True)
        mvs = MvState(mb_w, mb_h)
        skip_state = {'run': 0}
        for addr in range(n_mbs):
            mx, my = addr % mb_w, addr // mb_w
            if rng.random() < t8_prob:
                spec = random_p_mb_t8(rng, nr, max_level, density, mv_range)
                # encode like p16 + t8 flag + 8x8 residual
                w.ue(skip_state['run']); skip_state['run'] = 0
                mvs.start_mb(mx, my)
                w.ue(0)       # P_L0_16x16
                r = spec.refidx[0]
                if nr > 1:
                    if nr == 2:
                        w.u1(r ^ 1)
                    else:
                        w.ue(r)
                dx, dy = spec.mvds[0]
                px, py = mvs.mvp(r, 0, 0, 4, 4, 0)
                w.se(dx); w.se(dy)
                mvs.store(r, 0, 0, 4, 4, px + dx, py + dy)
                mvs.finish_mb(False)
                enc.parsed.add((mx, my))
                w.ue(INV_ME_CBP_INTER[spec.cbp])
                if spec.cbp & 15:
                    w.u1(1)   # transform_size_8x8_flag
                if spec.cbp:
                    spec.qp_delta = _safe_qpd(enc.qp, spec.qp_delta)
                    w.se(spec.qp_delta)
                    enc.qp = (enc.qp + spec.qp_delta + 52) % 52
                cbp = spec.cbp
                for i8 in range(4):
                    if not (cbp >> i8 & 1):
                        continue
                    c8 = spec.luma8_coeffs[i8]
                    for k in range(4):
                        sub = [c8[4 * j + k] for j in range(16)]
                        i = i8 * 4 + k
                        nC = enc.nC_luma(mx, my, i)
                        n2 = encode_residual_cavlc(w, sub, nC, 16)
                        enc.nz_y[(my * 4 + BLK4_Y[i],
                                  mx * 4 + BLK4_X[i])] = n2
                if cbp >> 4:
                    for c in range(2):
                        encode_residual_cavlc(w, spec.chroma_dc[c], -1, 4)
                if cbp >> 4 == 2:
                    for c in range(2):
                        for cy in range(2):
                            for cx in range(2):
                                nC = enc.nC_chroma(c, mx, my, cx, cy)
                                n2 = encode_residual_cavlc(
                                    w, spec.chroma_ac[c][cy * 2 + cx][1:],
                                    nC, 15)
                                enc.nz_c[(c, my * 2 + cy, mx * 2 + cx)] = n2
            else:
                spec = random_p_mb(rng, nr, max_level, density, mv_range,
                                   intra_prob=0.15, skip_prob=0.2)
                if spec.kind in ('i4', 'i16'):
                    resolve_random_modes(rng, enc, mx, my, spec)
                encode_p_mb(w, enc, mvs, mx, my, spec, nr, skip_state)
        if skip_state['run']:
            w.ue(skip_state['run'])
        w.rbsp_trailing()
        out += nal(3, 1, w.bytes_unescaped())
    return out


def gen_random_high_cabac_stream(mb_w, mb_h, n_frames=1, seed=0, *, qp=26,
                                 kinds=('i4', 'i8', 'i16'), max_level=8,
                                 density=0.3, deblock=True) -> bytes:
    """High-profile all-intra CABAC stream with 8x8 transforms."""
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h, profile=100, log2_max_poc_lsb=6)
    out += make_pps(cabac=True, deblock_control=not deblock,
                    transform_8x8=True)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h
    for f in range(n_frames):
        w = BitWriter()
        w.ue(0); w.ue(7); w.ue(0); w.u(0 if f == 0 else f % 16, 4)
        if f == 0:
            w.ue(f)
        w.u((2 * f) % 64, 6)
        if f == 0:
            w.u1(0); w.u1(0)
        else:
            w.u1(0)
        w.se(qp - 26)
        if deblock_idc is not None:
            w.ue(deblock_idc)
        while len(w.bits) % 8:
            w.u1(1)
        enc = CabacSliceEncoder(mb_w, mb_h, qp, 0, w)
        enc.pps_t8 = True
        for addr in range(n_mbs):
            mx, my = addr % mb_w, addr // mb_w
            kind = rng.choice(kinds)
            if kind == 'i8':
                spec = random_i8_mb(rng, enc, mx, my, max_level, density)
                enc.encode_i8_mb(mx, my, spec, 2)
            else:
                spec = random_intra_mb(rng, (kind,), max_level, density)
                resolve_random_modes(rng, enc, mx, my, spec)
                enc.encode_i_mb(mx, my, spec, 2)
            enc.c.terminate(0 if addr < n_mbs - 1 else 1)
        w.align_zero()
        out += nal(3, 5 if f == 0 else 1, w.bytes_unescaped())
    return out


# ---------------------------------------------------------------------------
# MVC Stereo High (Annex H): subset SPS, prefix NALs, NAL-20 slices

def make_subset_sps(mb_w, mb_h, *, profile=128, level=40,
                    log2_max_frame_num=4, log2_max_poc_lsb=4,
                    max_ref_frames=2, num_views=2,
                    ext2_bits=0) -> bytes:
    w = BitWriter()
    w.u(profile, 8)
    w.u(0, 8)
    w.u(level, 8)
    w.ue(0)                 # sps id (shared slot)
    w.ue(1)                 # chroma_format_idc
    w.ue(0); w.ue(0)        # bit depths
    w.u1(0)                 # qpprime
    w.u1(0)                 # seq_scaling_matrix
    w.ue(log2_max_frame_num - 4)
    w.ue(0)                 # poc type 0
    w.ue(log2_max_poc_lsb - 4)
    w.ue(max_ref_frames)
    w.u1(0)
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u1(1)                 # frame_mbs_only
    w.u1(1)                 # direct_8x8_inference
    w.u1(0)                 # crop
    w.u1(0)                 # vui
    # MVC extension
    w.u1(1)                 # bit_equal_to_one
    w.ue(num_views - 1)     # num_views_minus1
    for v in range(num_views):
        w.ue(v)             # view_id[v]
    for v in range(1, num_views):
        w.ue(1); w.ue(0)    # num_anchor_refs_l0 = 1, ref = view 0
        w.ue(0)             # num_anchor_refs_l1
    for v in range(1, num_views):
        w.ue(1); w.ue(0)    # num_non_anchor_refs_l0 = 1, ref = view 0
        w.ue(0)             # num_non_anchor_refs_l1
    w.ue(0)                 # num_level_values_signalled_minus1
    w.u(level, 8)
    w.ue(0)                 # num_applicable_ops_minus1
    w.u(0, 3)               # temporal_id
    w.ue(0)                 # num_target_output_views_minus1
    w.ue(min(num_views - 1, 1))  # target view id
    w.ue(num_views - 1)     # num_views_minus1
    w.u1(0)                 # mvc_vui_parameters_present
    if ext2_bits:
        w.u1(1)             # additional_extension2_flag: trailing data
        for i in range(ext2_bits):
            w.u1(i & 1)
    else:
        w.u1(0)             # additional_extension2
    w.rbsp_trailing()
    return nal(3, 15, w.bytes_unescaped())


def _mvc_ext_bytes(w, non_idr, view_id, anchor):
    w.u1(0)                 # svc_extension_flag
    w.u1(non_idr)
    w.u(0, 6)               # priority_id
    w.u(view_id, 10)
    w.u(0, 3)               # temporal_id
    w.u1(anchor)
    w.u1(1)                 # inter_view_flag
    w.u1(1)                 # reserved_one_bit


def make_prefix_nal(non_idr, anchor) -> bytes:
    w = BitWriter()
    _mvc_ext_bytes(w, non_idr, 0, anchor)
    return nal(3, 14, w.bytes_unescaped())


def gen_random_mvc_stream(mb_w, mb_h, n_aus=2, seed=0, *, qp=26,
                          max_level=8, density=0.3, mv_range=24,
                          deblock=True) -> bytes:
    """Stereo MVC: base view IDR+P chain, non-base view P slices that
    reference the base view (inter-view) and their own previous frames."""
    rng = random.Random(seed)
    out = make_sps(mb_w, mb_h, profile=100) + make_subset_sps(mb_w, mb_h)
    out += make_pps(deblock_control=not deblock, nrefs=2)
    deblock_idc = None if deblock else 1
    n_mbs = mb_w * mb_h

    def intra_slice(idr, f):
        w = BitWriter()
        w.ue(0); w.ue(7); w.ue(0); w.u(0 if idr else f % 16, 4)
        if idr:
            w.ue(0)
        w.u((2 * f) % 16, 4)
        if idr:
            w.u1(0); w.u1(0)
        else:
            w.u1(0)
        w.se(qp - 26)
        if deblock_idc is not None:
            w.ue(deblock_idc)
        enc = IntraEncoder(mb_w, mb_h, qp)
        for addr in range(n_mbs):
            spec = random_intra_mb(rng, ('i4', 'i16'), max_level, density)
            resolve_random_modes(rng, enc, addr % mb_w, addr // mb_w, spec)
            enc.encode_mb(w, addr % mb_w, addr // mb_w, spec)
        w.rbsp_trailing()
        return w

    def p_slice_bits(f, nrefs, mvc_view, idr_like):
        """P slice payload; for mvc_view the same syntax follows the
        NAL-20 extension."""
        w = BitWriter()
        if mvc_view:
            _mvc_ext_bytes(w, 0 if idr_like else 1, 1, 1 if idr_like else 0)
        w.ue(0); w.ue(5); w.ue(0)
        w.u(0 if idr_like else f % 16, 4)
        if idr_like:
            w.ue(0)             # idr_pic_id
        w.u((2 * f) % 16, 4)
        if nrefs != 2:          # pps default is 2
            w.u1(1); w.ue(nrefs - 1)
        else:
            w.u1(0)
        w.u1(0)                 # ref_pic_list_modification
        if idr_like:
            w.u1(0); w.u1(0)    # no_output, long_term
        else:
            w.u1(0)             # adaptive marking
        w.se(qp - 26)
        if deblock_idc is not None:
            w.ue(deblock_idc)
        enc = IntraEncoder(mb_w, mb_h, qp)
        mvs = MvState(mb_w, mb_h)
        skip_state = {'run': 0}
        for addr in range(n_mbs):
            mx, my = addr % mb_w, addr // mb_w
            spec = random_p_mb(rng, nrefs, max_level, density, mv_range)
            if spec.kind in ('i4', 'i16'):
                resolve_random_modes(rng, enc, mx, my, spec)
            encode_p_mb(w, enc, mvs, mx, my, spec, nrefs, skip_state)
        if skip_state['run']:
            w.ue(skip_state['run'])
        w.rbsp_trailing()
        return w

    for f in range(n_aus):
        # base view
        out += make_prefix_nal(0 if f == 0 else 1, 1 if f == 0 else 0)
        if f == 0:
            out += nal(3, 5, intra_slice(True, f).bytes_unescaped())
        else:
            out += nal(3, 1, p_slice_bits(f, min(f, 2), False,
                                          False).bytes_unescaped())
        # non-base view: P with inter-view ref (+ own temporal refs later)
        nrefs1 = 1 if f == 0 else min(f + 1, 2)
        out += nal(3, 20, p_slice_bits(f, nrefs1, True,
                                       f == 0).bytes_unescaped())
    return out

// CABAC macroblock layer (§9.3.2, §9.3.3.1): binarizations, context
// increments and residual decoding for I/P/B macroblocks.  Context index
// numbering follows Tables 9-11/9-39..9-43; behavior parity target is the
// reference's CABAC compilation of edge264_slice.c.  Pixel semantics are
// identical to the CAVLC layer (shared MVP/store/weights helpers).
#include "e264t.h"

namespace e264t {

extern const uint8_t me_cbp_intra[48], me_cbp_inter[48];
extern const uint8_t blk4_x[16], blk4_y[16];
int chroma_qp(int qpy, int offset);
void Decoder_direct_mv_pred(Task &d, Task::MbCtx &m, int quad_mask);
void Decoder_P_skip(Task &d, Task::MbCtx &m);
void Decoder_fill_wp(Task &d, Task::MbCtx &m);
void Decoder_clear_inter_cells(Task::MbCtx &m);

// ---------------------------------------------------------------------------
// Residual block categories (§9.3.3.1.3, frame coding): ctxIdx bases for
// coded_block_flag / significant / last_significant / coeff_abs, plus the
// cap of the coeff_abs ">1" context chain (chroma DC caps at +8).
struct CatOff { int cbf, sig, last, abs, abs_cap; };
static const CatOff CAT[6] = {
	{85, 105, 166, 227, 9},     // 0: Intra16x16 luma DC
	{89, 119, 180, 237, 9},     // 1: Intra16x16 luma AC  (ctxInc folds +1)
	{93, 134, 195, 247, 9},     // 2: luma 4x4
	{97, 149, 210, 257, 8},     // 3: chroma DC
	{101, 151, 212, 266, 9},    // 4: chroma AC (ctxInc folds +1)
	{1012, 402, 417, 426, 9},   // 5: luma 8x8
};


// significant/last ctxIdxInc maps for 8x8 blocks (Table 9-43, frame)
static const uint8_t SIG_INC_8x8[64] = {
	0, 1, 2, 3, 4, 5, 5, 4, 4, 3, 3, 4, 4, 4, 5, 5,
	4, 4, 4, 4, 3, 3, 6, 7, 7, 7, 8, 9, 10, 9, 8, 7,
	7, 6, 11, 12, 13, 11, 6, 7, 8, 9, 14, 10, 9, 8, 6, 11,
	12, 13, 11, 6, 9, 14, 10, 9, 11, 12, 13, 11, 14, 10, 12, 0,
};
static const uint8_t LAST_INC_8x8[64] = {
	0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
	2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
	3, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4, 4, 4, 4, 4,
	5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8, 8, 8,
};

// ---------------------------------------------------------------------------
// Neighbour helpers for context increments

// condTermFlag for coded_block_flag neighbours (§9.3.3.1.1.9): unavailable
// neighbour counts 1 for intra mbs and 0 for inter; PCM counts 1.
static int cbf_nbr(Task::MbCtx &m, bool avail, bool nbr_pcm, int nbr_cbf) {
	if (!avail)
		return (m.pl.mb_flags[m.mbi] & MBF_INTRA) ? 1 : 0;
	return nbr_pcm ? 1 : nbr_cbf;
}

static int cbf_inc_luma4(Task::MbCtx &m, int i) {
	Planes &pl = m.pl;
	int a, b;
	if (m.blkA_avail(i)) {
		size_t n = (size_t)m.gby(i) * (m.mbW * 4) + m.gbx(i) - 1;
		size_t nmb = (size_t)m.gby(i) / 4 * m.mbW + (m.gbx(i) - 1) / 4;
		a = cbf_nbr(m, true, pl.mb_flags[nmb] & MBF_IPCM, pl.nz_y[n] > 0);
	} else {
		a = cbf_nbr(m, false, false, 0);
	}
	if (m.blkB_avail(i)) {
		size_t n = (size_t)(m.gby(i) - 1) * (m.mbW * 4) + m.gbx(i);
		size_t nmb = (size_t)(m.gby(i) - 1) / 4 * m.mbW + m.gbx(i) / 4;
		b = cbf_nbr(m, true, pl.mb_flags[nmb] & MBF_IPCM, pl.nz_y[n] > 0);
	} else {
		b = cbf_nbr(m, false, false, 0);
	}
	return a + 2 * b;
}

static int cbf_inc_chroma(Task::MbCtx &m, int comp, int cx, int cy) {
	Planes &pl = m.pl;
	int W2 = m.mbW * 2;
	int gx = m.mx * 2 + cx, gy = m.my * 2 + cy;
	int a, b;
	bool aA = cx > 0 ? true : m.availA;
	bool aB = cy > 0 ? true : m.availB;
	if (aA) {
		size_t nmb = (size_t)(gy / 2) * m.mbW + (gx - 1) / 2;
		a = cbf_nbr(m, true, pl.mb_flags[nmb] & MBF_IPCM,
		            pl.nz_c[((size_t)gy * W2 + gx - 1) * 2 + comp] > 0);
	} else {
		a = cbf_nbr(m, false, false, 0);
	}
	if (aB) {
		size_t nmb = (size_t)((gy - 1) / 2) * m.mbW + gx / 2;
		b = cbf_nbr(m, true, pl.mb_flags[nmb] & MBF_IPCM,
		            pl.nz_c[((size_t)(gy - 1) * W2 + gx) * 2 + comp] > 0);
	} else {
		b = cbf_nbr(m, false, false, 0);
	}
	return a + 2 * b;
}

// mb-level DC cbf of a neighbour (luma: comp<0; chroma: comp 0/1)
static int dc_cbf_of(Task::MbCtx &m, size_t nmb, int comp) {
	Planes &pl = m.pl;
	if (pl.mb_flags[nmb] & MBF_IPCM)
		return 1;
	if (comp < 0) {
		if (!(pl.mb_flags[nmb] & MBF_I16x16))
			return 0;
		for (int k = 0; k < 16; k++)
			if (pl.coef_y_dc[nmb * 16 + k])
				return 1;
		return 0;
	}
	for (int k = 0; k < 4; k++)
		if (pl.coef_c_dc[nmb * 8 + comp * 4 + k])
			return 1;
	return 0;
}

static int cbf_inc_dc(Task::MbCtx &m, int comp) {
	int a = m.availA ? dc_cbf_of(m, m.mbi - 1, comp)
	                 : cbf_nbr(m, false, false, 0);
	int b = m.availB ? dc_cbf_of(m, m.mbi - m.mbW, comp)
	                 : cbf_nbr(m, false, false, 0);
	return a + 2 * b;
}

// ---------------------------------------------------------------------------
// Residual block decoding (§9.3.2.3 + 9.3.3.1.3): significance map then
// levels in reverse scan order, un-zigzagged into `out`.
static void parse_block_cabac(Task &d, int cat, int startIdx, int endIdx,
                              const uint8_t *scan, int16_t *out,
                              const uint8_t *sig_inc, const uint8_t *last_inc) {
	Cabac &c = d.cab;
	const CatOff &co = CAT[cat];
	uint64_t sigf = 0;
	int i = startIdx;
	do {
		int si = sig_inc ? sig_inc[i] : i;
		if (c.decode(co.sig + si)) {
			sigf |= (uint64_t)1 << i;
			if (c.decode(co.last + (last_inc ? last_inc[i] : i)))
				break;
		}
	} while (++i < endIdx);
	sigf |= (uint64_t)1 << i;

	int idx0 = 1;               // coeff_abs ctx offsets relative to co.abs
	int idx1 = 5;
	static const int8_t trans0[5] = {0, 2, 3, 4, 4};
	do {
		int i2 = 63 - __builtin_clzll(sigf);
		int level;
		if (!c.decode(co.abs + idx0)) {
			level = 1;
			idx0 = trans0[idx0];
		} else {
			level = 2;
			while (level < 15 && c.decode(co.abs + idx1))
				level++;
			if (level == 15) {  // UEG0 suffix (§9.3.2.3)
				int k = 0;
				while (k < 20 && c.bypass())
					k++;
				level = 14 + (1 << k) + (int)c.bypass_n(k);
			}
			idx0 = 0;
			idx1 = idx1 < co.abs_cap ? idx1 + 1 : co.abs_cap;
		}
		if (c.bypass())
			level = -level;
		out[scan[i2]] = level;
		sigf &= ~((uint64_t)1 << i2);
	} while (sigf);
}

// §9.3.3.1.1.5 mb_qp_delta
static int parse_mb_qp_delta_cabac(Task &d) {
	Cabac &c = d.cab;
	int nz = c.decode(60 + d.mb_qp_delta_nz);
	d.mb_qp_delta_nz = nz;
	if (!nz)
		return 0;
	int count = 1, ctx = 62;
	while (count < 78 && c.decode(ctx)) {
		count++;
		ctx = 63;
	}
	return (count & 1) ? count / 2 + 1 : -(count / 2);
}

// Residual-level logging: one `- {c: [scan-order levels]}` entry per
// DECODED block and `- {}` for a coded_block_flag of 0, in visit order —
// the CABAC twin of the CAVLC `- {nC, c}` entries, closing the
// log-schema-as-test-vector loop (tools/yaml2avc.py compiles them back;
// reference analog tests/gen_avc.py).
static void log_block_cabac(Task &d, const int16_t *out,
                            const uint8_t *scan, int start, int end) {
	d.logf("    - {c: [");
	for (int i = start; i <= end; i++)
		d.logf(i < end ? "%d," : "%d", (int)out[scan[i]]);
	d.logf("]}\n");
}

// ---------------------------------------------------------------------------
// Residuals for a whole macroblock (mirrors Task::parse_residuals)
void Task::parse_residuals_cabac(MbCtx &m, int cbp, bool is16) {
	Planes &pl = m.pl;
	static const uint8_t scan2x2[4] = {0, 1, 2, 3};
	// reference log schema keys the residual list (edge264_slice.c:509)
	if (is16 || cbp)
		logf("    coeffLevels:\n");
	if (is16) {
		if (cab.decode(CAT[0].cbf + cbf_inc_dc(m, -1))) {
			mark(Planes::DP_COEF_Y_DC, m.mbi * 16);
			parse_block_cabac(*this, 0, 0, 15, zigzag4x4,
			                  &pl.coef_y_dc[m.mbi * 16], nullptr, nullptr);
			log_block_cabac(*this, &pl.coef_y_dc[m.mbi * 16], zigzag4x4,
			                0, 15);
		} else {
			logf("    - {}\n");
		}
	}
	bool t8 = (pl.mb_flags[m.mbi] & MBF_T8x8) != 0;
	for (int i8 = 0; i8 < 4; i8++) {
		if (!(cbp >> i8 & 1))
			continue;
		if (t8) {
			// cat5: no coded_block_flag for 4:2:0 (§7.3.5.3.3)
			size_t b8 = (size_t)(m.my * 2 + (i8 >> 1)) * (m.mbW * 2)
				+ m.mx * 2 + (i8 & 1);
			mark(Planes::DP_COEF_Y8, b8 * 64);
			parse_block_cabac(*this, 5, 0, 63, zigzag8x8,
			                  &pl.coef_y8[b8 * 64], SIG_INC_8x8,
			                  LAST_INC_8x8);
			log_block_cabac(*this, &pl.coef_y8[b8 * 64], zigzag8x8,
			                0, 63);
			for (int k = 0; k < 4; k++)
				pl.nz_y[m.gblk(i8 * 4 + k)] = 1;
			continue;
		}
		for (int k = 0; k < 4; k++) {
			int i = i8 * 4 + k;
			int cat = is16 ? 1 : 2;
			if (cab.decode(CAT[cat].cbf + cbf_inc_luma4(m, i))) {
				pl.nz_y[m.gblk(i)] = 1;
				mark(Planes::DP_COEF_Y, m.gblk(i) * 16);
				if (is16)
					parse_block_cabac(*this, 1, 1, 15, zigzag4x4,
					                  &pl.coef_y[m.gblk(i) * 16],
					                  nullptr, nullptr);
				else
					parse_block_cabac(*this, 2, 0, 15, zigzag4x4,
					                  &pl.coef_y[m.gblk(i) * 16],
					                  nullptr, nullptr);
				log_block_cabac(*this, &pl.coef_y[m.gblk(i) * 16],
				                zigzag4x4, is16 ? 1 : 0, 15);
			} else {
				logf("    - {}\n");
			}
		}
	}
	int cbp_c = cbp >> 4;
	if (cbp_c) {
		for (int comp = 0; comp < 2; comp++) {
			if (cab.decode(CAT[3].cbf + cbf_inc_dc(m, comp))) {
				mark(Planes::DP_COEF_C_DC, m.mbi * 8 + comp * 4);
				parse_block_cabac(*this, 3, 0, 3, scan2x2,
				                  &pl.coef_c_dc[m.mbi * 8 + comp * 4],
				                  nullptr, nullptr);
				log_block_cabac(*this, &pl.coef_c_dc[m.mbi * 8 + comp * 4],
				                scan2x2, 0, 3);
			} else {
				logf("    - {}\n");
			}
		}
	}
	if (cbp_c == 2) {
		int W2 = m.mbW * 2;
		for (int comp = 0; comp < 2; comp++) {
			std::vector<int16_t> &plane = comp == 0 ? pl.coef_cb : pl.coef_cr;
			for (int cy = 0; cy < 2; cy++) {
				for (int cx = 0; cx < 2; cx++) {
					size_t blk = (size_t)(m.my * 2 + cy) * W2 + m.mx * 2 + cx;
					if (cab.decode(CAT[4].cbf
					               + cbf_inc_chroma(m, comp, cx, cy))) {
						pl.nz_c[blk * 2 + comp] = 1;
						mark(comp == 0 ? Planes::DP_COEF_CB
						        : Planes::DP_COEF_CR, blk * 16);
						parse_block_cabac(*this, 4, 1, 15, zigzag4x4,
						                  &plane[blk * 16], nullptr, nullptr);
						log_block_cabac(*this, &plane[blk * 16], zigzag4x4,
						                1, 15);
					} else {
						logf("    - {}\n");
					}
				}
			}
		}
	}
}

// ---------------------------------------------------------------------------
// coded_block_pattern (§9.3.3.1.1.4).  Luma bins use the neighbouring 8x8
// blocks' cbp bits (condTerm = bit == 0); chroma bins compare cbpChroma.
static int parse_cbp_cabac(Task &d, Task::MbCtx &m) {
	Planes &pl = m.pl;
	Cabac &c = d.cab;
	int cbp = 0;
	for (int k = 0; k < 4; k++) {
		int a, b;
		if (k & 1) {            // A = block k-1 of this mb
			a = (cbp >> (k - 1) & 1) ^ 1;
		} else if (m.availA) {
			a = (pl.cbp[m.mbi - 1] >> (k + 1) & 1) ^ 1;
		} else {
			a = 0;
		}
		if (k >= 2) {           // B = block k-2 of this mb
			b = (cbp >> (k - 2) & 1) ^ 1;
		} else if (m.availB) {
			b = (pl.cbp[m.mbi - m.mbW] >> (k + 2) & 1) ^ 1;
		} else {
			b = 0;
		}
		cbp |= c.decode(73 + a + 2 * b) << k;
	}
	int ca = m.availA ? pl.cbp[m.mbi - 1] >> 4 : 0;
	int cb = m.availB ? pl.cbp[m.mbi - m.mbW] >> 4 : 0;
	if (c.decode(77 + (ca > 0) + 2 * (cb > 0))) {
		int ac = c.decode(81 + (ca == 2) + 2 * (cb == 2));
		cbp |= (1 + ac) << 4;
	}
	return cbp;
}

// ---------------------------------------------------------------------------
// Intra macroblocks (ctx_base: 3+inc for I slices, 17 in P, 32 in B)
int Task::parse_I_mb_cabac(MbCtx &m, int ctx_base) {
	Planes &pl = m.pl;
	int in_p = ctx_base == 17, in_b = ctx_base == 32;

	if (!cab.decode(ctx_base)) {   // ---- I_NxN ----------------------------
		logf("    mb_type: %u\n", in_p ? 5 : in_b ? 23 : 0);
		bool t8x8 = false;
		if (cpps->transform_8x8_mode) {
			int inc = (m.availA && (pl.mb_flags[m.mbi - 1] & MBF_T8x8) ? 1 : 0)
			        + (m.availB && (pl.mb_flags[m.mbi - m.mbW] & MBF_T8x8) ? 1 : 0);
			t8x8 = cab.decode(399 + inc);
			logf("    transform_size_8x8_flag: %u\n", (int)t8x8);
		}
		if (t8x8) {
			static const uint16_t needs_A8 =
				1 << 1 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 8;
			static const uint16_t needs_B8 =
				1 << 0 | 1 << 3 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 7;
			int rems8[4], modes8[4];
			bool aC8[4] = {m.availB, m.availC, true, false};
			bool aD8[4] = {m.availD, m.availB, m.availA, true};
			for (int b = 0; b < 4; b++) {
				int i = b * 4;
				int mA = m.neighbor_mode_A(i);
				int mB = m.neighbor_mode_B(i);
				if (mA < 0 && m.blkA_avail(i)) mA = 2;
				if (mB < 0 && m.blkB_avail(i)) mB = 2;
				int pred = (mA < 0 || mB < 0) ? 2 : (mA < mB ? mA : mB);
				int mode;
				if (cab.decode(68)) {
					rems8[b] = -1;
					mode = pred;
				} else {
					int rem = cab.decode(69);
					rem += cab.decode(69) << 1;
					rem += cab.decode(69) << 2;
					rems8[b] = rem;
					mode = rem < pred ? rem : rem + 1;
				}
				bool aA = m.blkA_avail(i), aB = m.blkB_avail(i);
				modes8[b] = mode;
				bool fb = ((needs_A8 >> mode & 1) && !aA)
				       || ((needs_B8 >> mode & 1) && !aB)
				       || ((mode == 4 || mode == 5 || mode == 6)
				           && !aD8[b]);
				for (int k = 0; k < 4; k++) {
					pl.pred_modes[m.gblk(i + k)] = (uint8_t)mode;
					pl.i4_modes[m.gblk(i + k)] = (uint8_t)(fb ? 2 : mode);
				}
				size_t b8 = (size_t)(m.my * 2 + (b >> 1)) * (m.mbW * 2)
					+ m.mx * 2 + (b & 1);
				pl.i8_modes[b8] = (uint8_t)(fb ? 2
					: (mode | aA << 4 | aB << 5 |
					   aC8[b] << 6 | aD8[b] << 7));
			}
			if (logdec && log_mbs) {
				logf("    rem_intra8x8_pred_modes: [");
				for (int b = 0; b < 4; b++)
					logf(b ? ",%d" : "%d", rems8[b]);
				logf("]\n    Intra8x8PredModes: [%u,%u,%u,%u]\n",
				     modes8[0], modes8[1], modes8[2], modes8[3]);
			}
			int avail_bits = (m.availA << 4) | (m.availB << 5) | (m.availD << 6);
			int chroma_mode = parse_chroma_mode_cabac(m);
			pl.ch_modes[m.mbi] = (uint8_t)(resolve_chroma_mode(chroma_mode,
			avail_bits) | (avail_bits & 0x70));
			pl.mb_flags[m.mbi] = MBF_INTRA | MBF_T8x8 | MBF_PARSED;
			int cbp = parse_cbp_cabac(*this, m);
			logf("    coded_block_pattern: %u\n", cbp);
			pl.cbp[m.mbi] = (uint8_t)cbp;
			int delta = 0;
			if (cbp) {
				delta = parse_mb_qp_delta_cabac(*this);
				logf("    mb_qp_delta: %d\n", delta);
			} else {
				mb_qp_delta_nz = 0;
			}
			int sum = m.qp + delta;
			m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
			set_mb_qp(m);
			parse_residuals_cabac(m, cbp, false);
			return 0;
		}
		int rems[16], modes[16];
		static const uint16_t needs_A = 1 << 1 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 8;
		static const uint16_t needs_B =
			1 << 0 | 1 << 3 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 7;
		for (int i = 0; i < 16; i++) {
			int mA = m.neighbor_mode_A(i);
			int mB = m.neighbor_mode_B(i);
			if (mA < 0 && m.blkA_avail(i))
				mA = 2;
			if (mB < 0 && m.blkB_avail(i))
				mB = 2;
			int pred = (mA < 0 || mB < 0) ? 2 : (mA < mB ? mA : mB);
			int mode;
			if (cab.decode(68)) {
				rems[i] = -1;
				mode = pred;
			} else {
				int rem = cab.decode(69);
				rem += cab.decode(69) << 1;
				rem += cab.decode(69) << 2;
				rems[i] = rem;
				mode = rem < pred ? rem : rem + 1;
			}
			bool aA = m.blkA_avail(i), aB = m.blkB_avail(i);
			modes[i] = mode;
			pl.pred_modes[m.gblk(i)] = (uint8_t)mode;
			bool fb = ((needs_A >> mode & 1) && !aA)
			       || ((needs_B >> mode & 1) && !aB)
			       || ((mode == 4 || mode == 5 || mode == 6)
			           && !m.blkD_avail(i));
			int bits = fb ? 0
				: (aA << 4) | (aB << 5) | (m.blkC_avail(i) << 6) |
				  (m.blkD_avail(i) << 7);
			pl.i4_modes[m.gblk(i)] = (uint8_t)((fb ? 2 : mode) | bits);
		}
		if (logdec && log_mbs) {
			logf("    rem_intra4x4_pred_modes: [");
			for (int i = 0; i < 16; i++)
				logf(i ? ",%d" : "%d", rems[i]);
			logf("]\n    Intra4x4PredModes: [");
			for (int i = 0; i < 16; i++)
				logf(i ? ",%d" : "%d", modes[i]);
			logf("]\n");
		}
		int avail_bits = (m.availA << 4) | (m.availB << 5) | (m.availD << 6);
		int chroma_mode = parse_chroma_mode_cabac(m);
		pl.ch_modes[m.mbi] = (uint8_t)(resolve_chroma_mode(chroma_mode,
			avail_bits) | (avail_bits & 0x70));
		pl.mb_flags[m.mbi] = MBF_INTRA | MBF_PARSED;
		int cbp = parse_cbp_cabac(*this, m);
		logf("    coded_block_pattern: %u\n", cbp);
		pl.cbp[m.mbi] = (uint8_t)cbp;
		int delta = 0;
		if (cbp) {
			delta = parse_mb_qp_delta_cabac(*this);
			logf("    mb_qp_delta: %d\n", delta);
		} else {
			mb_qp_delta_nz = 0;
		}
		int sum = m.qp + delta;
		m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
		set_mb_qp(m);
		parse_residuals_cabac(m, cbp, false);
		return 0;
	}

	if (!cab.terminate()) {        // ---- Intra_16x16 ----------------------
		int ctx = ctx_base > 5 ? ctx_base : 5;
		int cbp_luma = cab.decode(ctx + 1) ? 15 : 0;
		int cbp_c = 0;
		if (cab.decode(ctx + 2)) {
			int c6 = ctx > 6 ? ctx : 6;
			cbp_c = 1 + cab.decode(c6 + 2);
		}
		int c6 = ctx > 6 ? ctx : 6;
		int mode = cab.decode(c6 + 3) << 1;
		mode += cab.decode(c6 + 3 > 10 ? c6 + 3 : 10);
		logf("    mb_type: %u\n", (cbp_luma ? 12 : 0) + cbp_c * 4 + mode
		     + (in_p ? 6 : in_b ? 24 : 1));
		int avail_bits = (m.availA << 4) | (m.availB << 5) | (m.availD << 6);
		pl.i16_modes[m.mbi] = (uint8_t)(resolve_i16_mode(mode,
			avail_bits) | avail_bits);
		int chroma_mode = parse_chroma_mode_cabac(m);
		pl.ch_modes[m.mbi] = (uint8_t)(resolve_chroma_mode(chroma_mode,
			avail_bits) | (avail_bits & 0x70));
		pl.mb_flags[m.mbi] = MBF_INTRA | MBF_I16x16 | MBF_PARSED;
		pl.cbp[m.mbi] = (uint8_t)(cbp_luma | cbp_c << 4);
		int delta = parse_mb_qp_delta_cabac(*this);
		logf("    mb_qp_delta: %d\n", delta);
		int sum = m.qp + delta;
		m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
		set_mb_qp(m);
		parse_residuals_cabac(m, cbp_luma | cbp_c << 4, true);
		return 0;
	}

	// ---- I_PCM ------------------------------------------------------------
	logf("    mb_type: %u\n", in_p ? 30 : in_b ? 48 : 25);
	// after the terminating bin the reader sits exactly at the end of the
	// encoder's flushed bits (empirically validated vs our encoder and the
	// reference); skip pcm_alignment_zero_bit to the byte boundary (§7.3.5)
	while (gb.consumed() & 7)
		gb.u1();
	uint8_t *py = &pl.pcm_y[((size_t)m.my * 16) * (m.mbW * 16) + m.mx * 16];
	for (int y = 0; y < 16; y++)
		for (int x = 0; x < 16; x++)
			py[(size_t)y * (m.mbW * 16) + x] = (uint8_t)gb.u(8);
	for (int c = 0; c < 2; c++) {
		uint8_t *pc = &pl.pcm_c[((size_t)c * m.mbH * 8 + m.my * 8) *
		                        (m.mbW * 8) + m.mx * 8];
		for (int y = 0; y < 8; y++)
			for (int x = 0; x < 8; x++)
				pc[(size_t)y * (m.mbW * 8) + x] = (uint8_t)gb.u(8);
	}
	pl.mb_flags[m.mbi] = MBF_INTRA | MBF_IPCM | MBF_PARSED;
	pl.cbp[m.mbi] = 15 | 2 << 4;
	pl.qp[m.mbi * 4 + 0] = 0;
	pl.qp[m.mbi * 4 + 1] = (int8_t)chroma_qp(0, cpps->chroma_qp_index_offset);
	pl.qp[m.mbi * 4 + 2] =
		(int8_t)chroma_qp(0, cpps->second_chroma_qp_index_offset);
	for (int i = 0; i < 16; i++)
		pl.nz_y[m.gblk(i)] = 1;
	for (int cy = 0; cy < 2; cy++)
		for (int cx = 0; cx < 2; cx++)
			for (int c = 0; c < 2; c++)
				pl.nz_c[(((size_t)(m.my * 2 + cy) * (m.mbW * 2)) +
				         m.mx * 2 + cx) * 2 + c] = 1;
	log_pcm_samples(m);
	mb_qp_delta_nz = 0;
	cab.start(&gb);                // §9.3.1: re-init after pcm samples
	return 0;
}

// intra_chroma_pred_mode (§9.3.3.1.1.8), shared by I_NxN and I16x16
int Task::parse_chroma_mode_cabac(MbCtx &m) {
	Planes &pl = m.pl;
	auto nz = [&](size_t nmb) {
		uint8_t v = pl.ch_modes[nmb];
		return v != 0xFF && (v & 3) != 0 ? 1 : 0;
	};
	int inc = (m.availA ? nz(m.mbi - 1) : 0) + (m.availB ? nz(m.mbi - m.mbW) : 0);
	int mode = 0;
	int ctx = 64 + inc;
	while (mode < 3 && cab.decode(ctx)) {
		mode++;
		ctx = 67;
	}
	logf("    intra_chroma_pred_mode: %u\n", mode);
	return mode;
}

// ---------------------------------------------------------------------------
// Inter syntax elements

// ref_idx (§9.3.3.1.1.6): unary with ctx 54+inc, 58, 59; condTerm uses the
// per-8x8 "refIdx parsed nonzero" markers (direct/skip/intra count 0).
static int parse_ref_idx_cabac(Task &d, Task::MbCtx &m, int list,
                               int x4, int y4, int nrefs) {
	Planes &pl = m.pl;
	int W2 = m.mbW * 2;
	int gqx = m.mx * 2 + (x4 >> 1), gqy = m.my * 2 + (y4 >> 1);
	int a = 0, b = 0;
	// neighbour 8x8 quads of the partition's top-left corner
	if (x4 > 0) {
		a = pl.refnz[(size_t)gqy * W2 + gqx - (x4 & 1 ? 0 : 1)] >> list & 1;
	} else if (m.availA) {
		a = pl.refnz[(size_t)gqy * W2 + gqx - 1] >> list & 1;
	}
	if (y4 > 0) {
		b = pl.refnz[(size_t)(gqy - (y4 & 1 ? 0 : 1)) * W2 + gqx] >> list & 1;
	} else if (m.availB) {
		b = pl.refnz[(size_t)(gqy - 1) * W2 + gqx] >> list & 1;
	}
	if (nrefs <= 1)
		return 0;
	int ref = 0;
	if (d.cab.decode(54 + a + 2 * b)) {
		ref = 1;
		int ctx = 58;
		while (ref < 32 && d.cab.decode(ctx)) {
			ref++;
			ctx = 59;
		}
	}
	return ref < nrefs ? ref : nrefs - 1;
}

static void set_refnz(Task::MbCtx &m, int list, int x4, int y4,
                      int w4, int h4, int ref) {
	if (ref <= 0)
		return;
	int W2 = m.mbW * 2;
	for (int qy = y4 >> 1; qy <= (y4 + h4 - 1) >> 1; qy++)
		for (int qx = x4 >> 1; qx <= (x4 + w4 - 1) >> 1; qx++)
			m.pl.refnz[(size_t)(m.my * 2 + qy) * W2 + m.mx * 2 + qx] |=
				1 << list;
}

// mvd (§9.3.3.1.1.7): ctx base 40 (x) / 47 (y); inc from the sum of
// neighbouring cells' |mvd| of the same component and list.
static int parse_mvd_comp_cabac(Task &d, Task::MbCtx &m, int list,
                                int comp, int x4, int y4) {
	Planes &pl = m.pl;
	int BW = m.mbW * 4;
	int gx = m.mx * 4 + x4, gy = m.my * 4 + y4;
	int sum = 0;
	if (gx > 0 && (x4 > 0 || m.availA))
		sum += pl.absmvd[(((size_t)gy * BW + gx - 1) * 2 + list) * 2 + comp];
	if (gy > 0 && (y4 > 0 || m.availB))
		sum += pl.absmvd[(((size_t)(gy - 1) * BW + gx) * 2 + list) * 2 + comp];
	int base = comp ? 47 : 40;
	int inc = (sum >= 3) + (sum > 32);
	if (!d.cab.decode(base + inc))
		return 0;
	int v = 1;
	while (v < 9 && d.cab.decode(base + 3 + (v - 1 < 3 ? v - 1 : 3)))
		v++;
	if (v == 9) {               // UEG3 suffix
		int k = 3;
		while (k < 24 && d.cab.bypass())
			k++;
		v = 1 + (1 << k) + (int)d.cab.bypass_n(k);
	}
	return d.cab.bypass() ? -v : v;
}

static void store_absmvd(Task::MbCtx &m, int list, int x4, int y4,
                         int w4, int h4, int mvdx, int mvdy) {
	int BW = m.mbW * 4;
	int ax = mvdx < 0 ? -mvdx : mvdx;
	int ay = mvdy < 0 ? -mvdy : mvdy;
	ax = ax > 127 ? 127 : ax;
	ay = ay > 127 ? 127 : ay;
	for (int dy = 0; dy < h4; dy++)
		for (int dx = 0; dx < w4; dx++) {
			size_t c = ((size_t)(m.my * 4 + y4 + dy) * BW
			            + m.mx * 4 + x4 + dx) * 2 + list;
			m.pl.absmvd[c * 2] = (uint8_t)ax;
			m.pl.absmvd[c * 2 + 1] = (uint8_t)ay;
		}
}

// mb_skip_flag ctx (§9.3.3.1.1.1): base 11 (P) / 24 (B)
static int skip_inc(Task::MbCtx &m) {
	Planes &pl = m.pl;
	int a = m.availA && !(pl.mb_flags[m.mbi - 1] & MBF_SKIP);
	int b = m.availB && !(pl.mb_flags[m.mbi - m.mbW] & MBF_SKIP);
	return a + b;
}

// ---------------------------------------------------------------------------
int Task::parse_P_mb_cabac(MbCtx &m) {
	Planes &pl = m.pl;
	int skip = cab.decode(11 + skip_inc(m));
	logf("    mb_skip_flag: %u\n", skip);
	if (skip) {
		Decoder_P_skip(*this, m);
		mb_qp_delta_nz = 0;
		return 0;
	}
	if (cab.decode(14))
		return parse_I_mb_cabac(m, 17);

	int b1 = cab.decode(15);
	int t = 2 * b1 + cab.decode(16 + b1);
	int mb_type = (4 - t) & 3;             // 0:16x16 1:16x8 2:8x16 3:P_8x8
	logf("    mb_type: %u\n", mb_type);
	int nrefs = sh.num_refs[0];
	bool sub_all_8x8 = true;

	if (mb_type <= 2) {
		struct Part { int x4, y4, w4, h4, shape, ri; };
		Part parts16[1] = {{0, 0, 4, 4, 0, 0}};
		Part parts16x8[2] = {{0, 0, 4, 2, 1, 0}, {0, 2, 4, 2, 2, 2}};
		Part parts8x16[2] = {{0, 0, 2, 4, 3, 0}, {2, 0, 2, 4, 4, 1}};
		Part *parts = mb_type == 0 ? parts16
		            : mb_type == 1 ? parts16x8 : parts8x16;
		int n_parts = mb_type == 0 ? 1 : 2;
		int refidx[2] = {0, 0};
		logf("    ref_idx: {");
		for (int i = 0; i < n_parts; i++) {
			refidx[i] = parse_ref_idx_cabac(*this, m, 0, parts[i].x4,
			                                parts[i].y4, nrefs);
			if (nrefs > 1)
				logf("\"%u\":%u,", parts[i].ri, refidx[i]);
			set_refnz(m, 0, parts[i].x4, parts[i].y4, parts[i].w4,
			          parts[i].h4, refidx[i]);
		}
		logf("}\n    mvds: [");
		for (int i = 0; i < n_parts; i++) {
			Part &p = parts[i];
			int mvdx = parse_mvd_comp_cabac(*this, m, 0, 0, p.x4, p.y4);
			int mvdy = parse_mvd_comp_cabac(*this, m, 0, 1, p.x4, p.y4);
			logf("[%d,%d],", mvdx, mvdy);
			int mvpx, mvpy;
			m.mvp_median(0, refidx[i], p.x4, p.y4, p.w4, p.h4, p.shape,
			             &mvpx, &mvpy);
			m.store_mv(0, p.x4, p.y4, p.w4, p.h4, refidx[i],
			           sh.RefPicList[0][refidx[i]], mvpx + mvdx, mvpy + mvdy);
			store_absmvd(m, 0, p.x4, p.y4, p.w4, p.h4, mvdx, mvdy);
		}
		logf("]\n");
	} else {
		// P_8x8: sub_mb_type tree 1->8x8, 00->8x4, 011->4x8, 010->4x4
		int sub[4];
		static const int subw[4] = {2, 2, 1, 1};
		static const int subh[4] = {2, 1, 2, 1};
		logf("    sub_mb_types: [");
		for (int q = 0; q < 4; q++) {
			if (cab.decode(21))
				sub[q] = 0;
			else if (!cab.decode(22))
				sub[q] = 1;
			else if (cab.decode(23))
				sub[q] = 2;
			else
				sub[q] = 3;
			if (sub[q] != 0)
				sub_all_8x8 = false;
			logf(q < 3 ? "%u," : "%u]\n", sub[q]);
		}
		int refidx[4] = {0, 0, 0, 0};
		logf("    ref_idx: {");
		for (int q = 0; q < 4; q++) {
			refidx[q] = parse_ref_idx_cabac(*this, m, 0, (q & 1) * 2,
			                                (q >> 1) * 2, nrefs);
			if (nrefs > 1)
				logf("\"%u\":%u,", q, refidx[q]);
			set_refnz(m, 0, (q & 1) * 2, (q >> 1) * 2, 2, 2, refidx[q]);
		}
		logf("}\n    mvds: [");
		for (int q = 0; q < 4; q++) {
			int bx = (q & 1) * 2, by = (q >> 1) * 2;
			int w4 = subw[sub[q]], h4 = subh[sub[q]];
			for (int sy = 0; sy < 2; sy += h4)
				for (int sx = 0; sx < 2; sx += w4) {
					int mvdx = parse_mvd_comp_cabac(*this, m, 0, 0,
					                                bx + sx, by + sy);
					int mvdy = parse_mvd_comp_cabac(*this, m, 0, 1,
					                                bx + sx, by + sy);
					logf("[%d,%d],", mvdx, mvdy);
					int mvpx, mvpy;
					m.mvp_median(0, refidx[q], bx + sx, by + sy, w4, h4, 0,
					             &mvpx, &mvpy);
					m.store_mv(0, bx + sx, by + sy, w4, h4, refidx[q],
					           sh.RefPicList[0][refidx[q]],
					           mvpx + mvdx, mvpy + mvdy);
					store_absmvd(m, 0, bx + sx, by + sy, w4, h4, mvdx, mvdy);
				}
		}
		logf("]\n");
	}
	pl.mb_flags[m.mbi] = MBF_INTER | MBF_PARSED;
	Decoder_fill_wp(*this, m);

	int cbp = parse_cbp_cabac(*this, m);
	logf("    coded_block_pattern: %u\n", cbp);
	pl.cbp[m.mbi] = (uint8_t)cbp;
	bool t8_ok = mb_type <= 2 || sub_all_8x8;
	if ((cbp & 15) && cpps->transform_8x8_mode && t8_ok) {
		int incT = (m.availA && (pl.mb_flags[m.mbi - 1] & MBF_T8x8) ? 1 : 0)
		         + (m.availB && (pl.mb_flags[m.mbi - m.mbW] & MBF_T8x8) ? 1 : 0);
		if (cab.decode(399 + incT)) {
			pl.mb_flags[m.mbi] |= MBF_T8x8;
			logf("    transform_size_8x8_flag: 1\n");
		} else {
			logf("    transform_size_8x8_flag: 0\n");
		}
	}
	int delta = 0;
	if (cbp) {
		delta = parse_mb_qp_delta_cabac(*this);
		logf("    mb_qp_delta: %d\n", delta);
	} else {
		mb_qp_delta_nz = 0;
	}
	int sum = m.qp + delta;
	m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
	set_mb_qp(m);
	parse_residuals_cabac(m, cbp, false);
	return 0;
}

// ---------------------------------------------------------------------------
static const uint8_t b_sub_use_c[13] = {0, 1, 2, 3, 1, 1, 2, 2, 3, 3, 1, 2, 3};
static const uint8_t b_sub_w_c[13] = {2, 2, 2, 2, 2, 1, 2, 1, 2, 1, 1, 1, 1};
static const uint8_t b_sub_h_c[13] = {2, 2, 2, 2, 1, 2, 1, 2, 1, 2, 1, 1, 1};

int Task::parse_B_mb_cabac(MbCtx &m) {
	Planes &pl = m.pl;
	int skip = cab.decode(24 + skip_inc(m));
	logf("    mb_skip_flag: %u\n", skip);
	if (skip) {
		Decoder_direct_mv_pred(*this, m, 0xF);
		pl.mb_flags[m.mbi] = MBF_INTER | MBF_SKIP | MBF_DIRECT | MBF_PARSED;
		Decoder_fill_wp(*this, m);
		set_mb_qp(m);
		mb_qp_delta_nz = 0;
		return 0;
	}

	// mb_type (§9.3.3.1.1.3): bin0 ctx 27 + condA + condB
	int da = m.availA && (pl.mb_flags[m.mbi - 1] & MBF_DIRECT);
	int db_ = m.availB && (pl.mb_flags[m.mbi - m.mbW] & MBF_DIRECT);
	int inc = (m.availA && !da) + (m.availB && !db_);
	if (!cab.decode(27 + inc)) {     // B_Direct_16x16
		logf("    mb_type: 0\n");
		Decoder_direct_mv_pred(*this, m, 0xF);
		pl.mb_flags[m.mbi] = MBF_INTER | MBF_DIRECT | MBF_PARSED;
		Decoder_fill_wp(*this, m);
		int cbp = parse_cbp_cabac(*this, m);
		logf("    coded_block_pattern: %u\n", cbp);
		pl.cbp[m.mbi] = (uint8_t)cbp;
		if ((cbp & 15) && cpps->transform_8x8_mode &&
		    sps.direct_8x8_inference) {
			int incT = (m.availA && (pl.mb_flags[m.mbi - 1] & MBF_T8x8) ? 1 : 0)
			         + (m.availB && (pl.mb_flags[m.mbi - m.mbW] & MBF_T8x8) ? 1 : 0);
			if (cab.decode(399 + incT)) {
				pl.mb_flags[m.mbi] |= MBF_T8x8;
				logf("    transform_size_8x8_flag: 1\n");
			} else {
				logf("    transform_size_8x8_flag: 0\n");
			}
		}
		int delta = 0;
		if (cbp) {
			delta = parse_mb_qp_delta_cabac(*this);
			logf("    mb_qp_delta: %d\n", delta);
		} else {
			mb_qp_delta_nz = 0;
		}
		int sum = m.qp + delta;
		m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
		set_mb_qp(m);
		parse_residuals_cabac(m, cbp, false);
		return 0;
	}
	int str = 4;
	if (!cab.decode(30)) {
		str = 8 + cab.decode(32);
	} else {
		str = cab.decode(31);
		str += str + cab.decode(32);
		str += str + cab.decode(32);
		str += str + cab.decode(32);
		if (str >= 8 && str <= 12)
			str += str + cab.decode(32);
	}
	if (str == 13)
		return parse_I_mb_cabac(m, 32);
	static const uint8_t str2mb_type[26] = {3, 4, 5, 6, 7, 8, 9, 10, 1, 2, 0,
		0, 0, 0, 11, 22, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21};
	int mb_type = str2mb_type[str];
	logf("    mb_type: %u\n", mb_type);
	int nrefs[2] = {sh.num_refs[0], sh.num_refs[1]};
	int b_sub_arr[4] = {1, 1, 1, 1};
	int *sub = b_sub_arr;

	if (mb_type != 22) {
		struct Part { int x4, y4, w4, h4, shape, ri; uint8_t use; };
		Part parts[2];
		int n_parts;
		if (mb_type < 4) {
			n_parts = 1;
			parts[0] = {0, 0, 4, 4, 0, 0, (uint8_t)mb_type};
		} else {
			n_parts = 2;
			int k = (mb_type - 4) >> 1;
			static const uint8_t pair_use[9][2] = {
				{1, 1}, {2, 2}, {1, 2}, {2, 1}, {1, 3},
				{2, 3}, {3, 1}, {3, 2}, {3, 3}};
			if ((mb_type & 1) == 0) {
				parts[0] = {0, 0, 4, 2, 1, 0, pair_use[k][0]};
				parts[1] = {0, 2, 4, 2, 2, 2, pair_use[k][1]};
			} else {
				parts[0] = {0, 0, 2, 4, 3, 0, pair_use[k][0]};
				parts[1] = {2, 0, 2, 4, 4, 1, pair_use[k][1]};
			}
		}
		int refidx[2][2] = {{0, 0}, {0, 0}};
		int mvd[2][2][2];
		logf("    ref_idx: {");
		for (int l = 0; l < 2; l++)
			for (int i = 0; i < n_parts; i++)
				if (parts[i].use >> l & 1) {
					refidx[l][i] = parse_ref_idx_cabac(
						*this, m, l, parts[i].x4, parts[i].y4, nrefs[l]);
					if (nrefs[l] > 1)
						logf("\"%u\":%u,", parts[i].ri + l * 4, refidx[l][i]);
					set_refnz(m, l, parts[i].x4, parts[i].y4, parts[i].w4,
					          parts[i].h4, refidx[l][i]);
				}
		logf("}\n    mvds: [");
		for (int l = 0; l < 2; l++)
			for (int i = 0; i < n_parts; i++)
				if (parts[i].use >> l & 1) {
					mvd[l][i][0] = parse_mvd_comp_cabac(*this, m, l, 0,
					                                    parts[i].x4,
					                                    parts[i].y4);
					mvd[l][i][1] = parse_mvd_comp_cabac(*this, m, l, 1,
					                                    parts[i].x4,
					                                    parts[i].y4);
					logf("[%d,%d],", mvd[l][i][0], mvd[l][i][1]);
					// absMvd is written per list as soon as parsed so the
					// second list's contexts see it (§9.3.3.1.1.7)
					store_absmvd(m, l, parts[i].x4, parts[i].y4,
					             parts[i].w4, parts[i].h4,
					             mvd[l][i][0], mvd[l][i][1]);
				}
		logf("]\n");
		for (int i = 0; i < n_parts; i++) {
			Part &p = parts[i];
			for (int l = 0; l < 2; l++) {
				if (!(p.use >> l & 1))
					continue;
				int mvpx, mvpy;
				m.mvp_median(l, refidx[l][i], p.x4, p.y4, p.w4, p.h4,
				             p.shape, &mvpx, &mvpy);
				m.store_mv(l, p.x4, p.y4, p.w4, p.h4, refidx[l][i],
				           sh.RefPicList[l][refidx[l][i]],
				           mvpx + mvd[l][i][0], mvpy + mvd[l][i][1]);
			}
		}
	} else {
		// B_8x8: sub_mb_type tree (§9.3.3.1.1.2, ctx 36-39)
		logf("    sub_mb_types: [");
		for (int q = 0; q < 4; q++) {
			if (!cab.decode(36)) {
				sub[q] = -1;      // B_Direct_8x8
			} else {
				int s = 2;
				if (!cab.decode(37)) {
					s = 4 + cab.decode(39);
				} else {
					s = cab.decode(38);
					s += s + cab.decode(39);
					s += s + cab.decode(39);
					if (s == 4 || s == 5)
						s += s + cab.decode(39);
				}
				static const uint8_t s2sub[12] = {3, 4, 5, 6, 1, 2, 11, 12,
				                                  7, 8, 9, 10};
				sub[q] = s2sub[s];
			}
			logf(q < 3 ? "%u," : "%u]\n", sub[q] < 0 ? 0 : sub[q]);
		}
		// remap: our sub value 12 means direct here
		int refidx[2][4] = {{0, 0, 0, 0}, {0, 0, 0, 0}};
		int mvd[2][4][4][2];
		logf("    ref_idx: {");
		for (int l = 0; l < 2; l++)
			for (int q = 0; q < 4; q++)
				if (sub[q] >= 0 && (b_sub_use_c[sub[q]] >> l & 1)) {
					refidx[l][q] = parse_ref_idx_cabac(
						*this, m, l, (q & 1) * 2, (q >> 1) * 2, nrefs[l]);
					if (nrefs[l] > 1)
						logf("\"%u\":%u,", q + l * 4, refidx[l][q]);
					set_refnz(m, l, (q & 1) * 2, (q >> 1) * 2, 2, 2,
					          refidx[l][q]);
				}
		logf("}\n");
		logf("    mvds: [");
		for (int l = 0; l < 2; l++)
			for (int q = 0; q < 4; q++) {
				if (sub[q] < 0 || !(b_sub_use_c[sub[q]] >> l & 1))
					continue;
				int w4 = b_sub_w_c[sub[q]], h4 = b_sub_h_c[sub[q]];
				int k = 0;
				for (int sy = 0; sy < 2; sy += h4)
					for (int sx = 0; sx < 2; sx += w4) {
						int bx = (q & 1) * 2 + sx, by = (q >> 1) * 2 + sy;
						mvd[l][q][k][0] =
							parse_mvd_comp_cabac(*this, m, l, 0, bx, by);
						mvd[l][q][k][1] =
							parse_mvd_comp_cabac(*this, m, l, 1, bx, by);
						logf("[%d,%d],", mvd[l][q][k][0], mvd[l][q][k][1]);
						store_absmvd(m, l, bx, by, w4, h4,
						             mvd[l][q][k][0], mvd[l][q][k][1]);
						k++;
					}
			}
		logf("]\n");
		// derive strictly in quadrant order, direct quads at their turn:
		// a direct quad's cells must not be `written` when an EARLIER
		// quad's mvp asks for its C/D neighbour (decode-order
		// availability, §6.4.11.7 — probed against the reference)
		for (int q = 0; q < 4; q++) {
			if (sub[q] < 0) {
				Decoder_direct_mv_pred(*this, m, 1 << q);
				continue;
			}
			int bx = (q & 1) * 2, by = (q >> 1) * 2;
			int w4 = b_sub_w_c[sub[q]], h4 = b_sub_h_c[sub[q]];
			int k = 0;
			for (int sy = 0; sy < 2; sy += h4)
				for (int sx = 0; sx < 2; sx += w4) {
					for (int l = 0; l < 2; l++) {
						if (!(b_sub_use_c[sub[q]] >> l & 1))
							continue;
						int mvpx, mvpy;
						m.mvp_median(l, refidx[l][q], bx + sx, by + sy,
						             w4, h4, 0, &mvpx, &mvpy);
						m.store_mv(l, bx + sx, by + sy, w4, h4,
						           refidx[l][q],
						           sh.RefPicList[l][refidx[l][q]],
						           mvpx + mvd[l][q][k][0],
						           mvpy + mvd[l][q][k][1]);
					}
					k++;
				}
		}
	}
	pl.mb_flags[m.mbi] = MBF_INTER | MBF_PARSED;
	Decoder_fill_wp(*this, m);

	int cbp = parse_cbp_cabac(*this, m);
	logf("    coded_block_pattern: %u\n", cbp);
	pl.cbp[m.mbi] = (uint8_t)cbp;
	bool t8_ok;
	if (mb_type != 22) {
		t8_ok = true;
	} else {
		t8_ok = true;
		for (int q = 0; q < 4; q++) {
			if (sub[q] < 0)
				t8_ok = t8_ok && sps.direct_8x8_inference;
			else if (b_sub_w_c[sub[q]] != 2 || b_sub_h_c[sub[q]] != 2)
				t8_ok = false;
		}
	}
	if ((cbp & 15) && cpps->transform_8x8_mode && t8_ok) {
		int incT = (m.availA && (pl.mb_flags[m.mbi - 1] & MBF_T8x8) ? 1 : 0)
		         + (m.availB && (pl.mb_flags[m.mbi - m.mbW] & MBF_T8x8) ? 1 : 0);
		if (cab.decode(399 + incT)) {
			pl.mb_flags[m.mbi] |= MBF_T8x8;
			logf("    transform_size_8x8_flag: 1\n");
		} else {
			logf("    transform_size_8x8_flag: 0\n");
		}
	}
	int delta = 0;
	if (cbp) {
		delta = parse_mb_qp_delta_cabac(*this);
		logf("    mb_qp_delta: %d\n", delta);
	} else {
		mb_qp_delta_nz = 0;
	}
	int sum = m.qp + delta;
	m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
	set_mb_qp(m);
	parse_residuals_cabac(m, cbp, false);
	return 0;
}

// ---------------------------------------------------------------------------
int Task::parse_slice_data_cabac() {
	MbCtx m(*this);
	// I slices use init table 0; P/B use 1 + cabac_init_idc (slice.cpp
	// stores sh.cabac_init_idc = 1 + idc for P/B, 0 for I)
	cab.init_contexts(sh.cabac_init_idc, sh.qp);
	cab.start(&gb);
	mb_qp_delta_nz = 0;
	int mb_addr = sh.first_mb;
	int n_mbs = m.mbW * m.mbH;
	int err = 0;

	while (mb_addr < n_mbs) {
		m.set_addr(mb_addr);
		if (!m.claim_mb()) {     // duplicate coverage: stop + recover
			err = E264T_EBADMSG;
			break;
		}
		logf("  - mbAddr: %d\n", mb_addr);
		int r;
		if (sh.slice_type == 0) {
			r = parse_P_mb_cabac(m);
		} else if (sh.slice_type == 1) {
			r = parse_B_mb_cabac(m);
		} else {
			int inc = 0;
			if (m.availA) {
				int f = m.pl.mb_flags[m.mbi - 1];
				inc += (f & MBF_INTRA) && ((f & MBF_I16x16) || (f & MBF_IPCM));
			}
			if (m.availB) {
				int f = m.pl.mb_flags[m.mbi - m.mbW];
				inc += (f & MBF_INTRA) && ((f & MBF_I16x16) || (f & MBF_IPCM));
			}
			r = parse_I_mb_cabac(m, 3 + inc);
		}
		if (r) { err = r; break; }
		if ((m.pl.mb_flags[m.mbi] & MBF_INTRA) && sh.slice_type != 2)
			Decoder_clear_inter_cells(m);
		__atomic_sub_fetch(&remaining_mbs[curr], 1, __ATOMIC_ACQ_REL);
		uint8_t db = 0;
		if (sh.disable_deblocking_filter_idc != 1) {
			db |= DBF_INNER;
			if (m.mx > 0 && (sh.disable_deblocking_filter_idc == 0 ||
			                 m.availA))
				db |= DBF_LEFT;
			if (m.my > 0 && (sh.disable_deblocking_filter_idc == 0 ||
			                 m.availB))
				db |= DBF_TOP;
		}
		m.pl.deblock[m.mbi] = db;
		m.pl.deblock_ab[m.mbi * 2] = (int8_t)sh.alpha_c0_offset;
		m.pl.deblock_ab[m.mbi * 2 + 1] = (int8_t)sh.beta_offset;

		mb_addr++;
		if (cab.terminate())         // end_of_slice_flag
			break;
	}
	cab.sync();    // idempotent: the overrun verdict must not count lookahead
	if (gb.over && !err)
		err = E264T_EBADMSG;
	if (err)
		recover_slice(m, mb_addr);
	return err;
}

} // namespace e264t

// CAVLC slice-data / macroblock-layer parsing (§7.3.4, §7.3.5, §9.2),
// I macroblocks first.  Emits syntax planes; no pixel math.
// Syntax coverage mirrors parse_I_mb / parse_slice_data in the reference
// (edge264_slice.c:783-940, :1651-1849) with a flat loop instead of its
// tail-call pipeline.
#include "e264t.h"

namespace e264t {

extern const uint8_t me_cbp_intra[48], me_cbp_inter[48];
extern const uint8_t blk4_x[16], blk4_y[16];
int chroma_qp(int qpy, int offset);
int parse_residual_cavlc(BitReader &gb, int nC, int max_coeff,
                         const uint8_t *scan, int16_t *out);

// Out-of-line MbCtx helpers (declared in e264t.h).
int Task::MbCtx::gbx(int i) const { return mx * 4 + blk4_x[i]; }
int Task::MbCtx::gby(int i) const { return my * 4 + blk4_y[i]; }
size_t Task::MbCtx::gblk(int i) const {
	return (size_t)gby(i) * (mbW * 4) + gbx(i);
}

// availability of neighbour 4x4 blocks for intra prediction / nC
bool Task::MbCtx::blkA_avail(int i) const {
	return blk4_x[i] > 0 ? true : availA;
}
bool Task::MbCtx::blkB_avail(int i) const {
	return blk4_y[i] > 0 ? true : availB;
}
bool Task::MbCtx::blkC_avail(int i) const {
	int bx = blk4_x[i], by = blk4_y[i];
	if (by == 0) return bx < 3 ? availB : availC;
	if (bx == 3) return false;          // right column: decoded later
	// internal: available iff decoded earlier in quad order
	static const int8_t ord[4][4] = {   // [by][bx] -> block index
		{0, 1, 4, 5}, {2, 3, 6, 7}, {8, 9, 12, 13}, {10, 11, 14, 15}};
	return ord[by - 1][bx + 1] < i;
}
bool Task::MbCtx::blkD_avail(int i) const {
	int bx = blk4_x[i], by = blk4_y[i];
	if (bx == 0 && by == 0) return availD;
	if (by == 0) return availB;
	if (bx == 0) return availA;
	return true;
}

// nC of neighbour luma blocks (total_coeff; PCM mbs carry 16)
int Task::MbCtx::nC_luma(int i) const {
	int sum = 0, have = 0;
	if (blkA_avail(i)) {
		size_t n = (size_t)gby(i) * (mbW * 4) + gbx(i) - 1;
		sum += pl.nz_y[n]; have |= 1;
	}
	if (blkB_avail(i)) {
		size_t n = (size_t)(gby(i) - 1) * (mbW * 4) + gbx(i);
		sum += pl.nz_y[n]; have |= 2;
	}
	return have == 3 ? (sum + 1) >> 1 : sum;
}
// chroma 4x4 block (cx,cy in 0..1 within mb), comp 0=cb 1=cr
int Task::MbCtx::nC_chroma(int comp, int cx, int cy) const {
	int W2 = mbW * 2;
	int gx = mx * 2 + cx, gy = my * 2 + cy;
	int sum = 0, have = 0;
	bool aA = cx > 0 ? true : availA;
	bool aB = cy > 0 ? true : availB;
	if (aA) { sum += pl.nz_c[((size_t)gy * W2 + gx - 1) * 2 + comp]; have |= 1; }
	if (aB) { sum += pl.nz_c[((size_t)(gy - 1) * W2 + gx) * 2 + comp]; have |= 2; }
	return have == 3 ? (sum + 1) >> 1 : sum;
}

// parsed intra mode of a neighbour block, or -1 if not intra NxN
// §8.3.1.1 mode prediction reads the PARSED neighbour modes (pred_modes),
// not the resolved kernel enums: a corrupt-mode fallback must not leak
// into later predictions (matches the reference, whose mb record keeps
// Intra4x4PredMode as parsed)
int Task::MbCtx::neighbor_mode_A(int i) const {
	if (!blkA_avail(i)) return -1;
	uint8_t v = pl.pred_modes[(size_t)gby(i) * (mbW * 4) + gbx(i) - 1];
	return v == 0xFF ? -1 : v & 15;
}
int Task::MbCtx::neighbor_mode_B(int i) const {
	if (!blkB_avail(i)) return -1;
	uint8_t v = pl.pred_modes[(size_t)(gby(i) - 1) * (mbW * 4) + gbx(i)];
	return v == 0xFF ? -1 : v & 15;
}

// modes that require left / top neighbours (§8.3.1.2): remapped to DC when
// the needed neighbour is missing (corrupt streams only; the spec forbids
// signalling them then)
// trace line per residual block, matching the reference's
// "- {nC: %u, c: [...]}" schema (edge264_slice.c:265-297)
static void log_block(Task &d, int nC, int tc, const uint8_t *scan, int n,
                      const int16_t *out) {
	if (!d.logdec || !d.log_mbs)
		return;
	if (!tc) {
		d.logf("    - {nC: %d}\n", nC);
		return;
	}
	d.logf("    - {nC: %d, c: [", nC);
	for (int i = 0; i < n; i++)
		d.logf(i < n - 1 ? "%d," : "%d", out[scan[i]]);
	d.logf("]}\n");
}

static const uint16_t mode_needs_A =
	1 << 1 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 8;
static const uint16_t mode_needs_B =
	1 << 0 | 1 << 3 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 7;

// PCM raw samples in the reference's log schema (edge264_slice.c:908-932)
// -- needed for the YAML->bitstream round-trip (tools/yaml2avc.py)
void Task::log_pcm_samples(MbCtx &m) {
	if (!logdec || !log_mbs)
		return;
	Planes &pl = m.pl;
	logf("    pcm_samples:\n");
	const char *names[3] = {"Y", "Cb", "Cr"};
	for (int comp = 0; comp < 3; comp++) {
		int n = comp == 0 ? 16 : 8;
		logf("      %s: [", names[comp]);
		for (int y = 0; y < n; y++)
			for (int x = 0; x < n; x++) {
				unsigned v = comp == 0
					? pl.pcm_y[((size_t)m.my * 16 + y) * (m.mbW * 16)
					           + m.mx * 16 + x]
					: pl.pcm_c[((size_t)(comp - 1) * m.mbH * 8
					            + m.my * 8 + y) * (m.mbW * 8)
					           + m.mx * 8 + x];
				logf(y == n - 1 && x == n - 1 ? "%u" : "%u,", v);
			}
		logf("]\n");
	}
}

int Task::parse_I_mb(MbCtx &m, int mb_type) {
	Planes &pl = m.pl;

	if (mb_type == 25) {   // ---- I_PCM -------------------------------------
		// byte-align, then raw samples (escapes already stripped)
		int pad = (8 - (int)(gb.consumed() & 7)) & 7;
		gb.u(pad);
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
		pl.qp[m.mbi * 4 + 0] = 0;   // QPY of I_PCM is 0 (§8.7)
		pl.qp[m.mbi * 4 + 1] = chroma_qp(0, cpps->chroma_qp_index_offset);
		pl.qp[m.mbi * 4 + 2] = chroma_qp(0, cpps->second_chroma_qp_index_offset);
		for (int i = 0; i < 16; i++)
			pl.nz_y[m.gblk(i)] = 16;
		for (int cy = 0; cy < 2; cy++)
			for (int cx = 0; cx < 2; cx++)
				for (int c = 0; c < 2; c++)
					pl.nz_c[(((size_t)(m.my * 2 + cy) * (m.mbW * 2)) +
					         m.mx * 2 + cx) * 2 + c] = 16;
		log_pcm_samples(m);
		return 0;
	}

	int avail_bits = (m.availA << 4) | (m.availB << 5) | (m.availD << 6);
	int cbp;
	if (mb_type == 0) {   // ---- I_NxN --------------------------------------
		bool t8x8 = false;
		if (cpps->transform_8x8_mode) {
			t8x8 = gb.u1();
			logf("    transform_size_8x8_flag: %u\n", t8x8);
		}
		if (t8x8) {
			// ---- Intra_8x8: 4 prediction modes (§8.3.2) ------------------
			static const uint16_t needs_A8 =
				1 << 1 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 8;
			static const uint16_t needs_B8 =
				1 << 0 | 1 << 3 | 1 << 4 | 1 << 5 | 1 << 6 | 1 << 7;
			int rems[4], modes[4];
			bool aC8[4] = {m.availB, m.availC, true, false};
			bool aD8[4] = {m.availD, m.availB, m.availA, true};
			for (int b = 0; b < 4; b++) {
				int i = b * 4;          // top-left 4x4 cell of this 8x8
				int mA = m.neighbor_mode_A(i);
				int mB = m.neighbor_mode_B(i);
				if (mA < 0 && m.blkA_avail(i)) mA = 2;
				if (mB < 0 && m.blkB_avail(i)) mB = 2;
				int pred = (mA < 0 || mB < 0) ? 2 : (mA < mB ? mA : mB);
				int mode;
				if (gb.u1()) {
					rems[b] = -1;
					mode = pred;
				} else {
					int rem = gb.u(3);
					rems[b] = rem;
					mode = rem < pred ? rem : rem + 1;
				}
				bool aA = m.blkA_avail(i), aB = m.blkB_avail(i);
				modes[b] = mode;
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
					logf(b ? ",%d" : "%d", rems[b]);
				logf("]\n    Intra8x8PredModes: [%u,%u,%u,%u]\n",
				     modes[0], modes[1], modes[2], modes[3]);
			}
			int chroma_mode = gb.ue(3);
			logf("    intra_chroma_pred_mode: %u\n", chroma_mode);
			pl.ch_modes[m.mbi] = (uint8_t)(resolve_chroma_mode(chroma_mode,
			avail_bits) | (avail_bits & 0x70));
			cbp = me_cbp_intra[gb.ue(47)];
			logf("    coded_block_pattern: %u\n", cbp);
			pl.mb_flags[m.mbi] = MBF_INTRA | MBF_T8x8 | MBF_PARSED;
			pl.cbp[m.mbi] = (uint8_t)((cbp & 15) | (cbp >> 4) << 4);
			bool is16_ = false;
			if (cbp) {
				int delta = gb.se(-26, 25);
				logf("    mb_qp_delta: %d\n", delta);
				int sum = m.qp + delta;
				m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
			}
			set_mb_qp(m);
			parse_residuals(m, cbp, is16_);
			return 0;
		}
		// 16 prediction modes, each predicted from min(A, B) (§8.3.1.1)
		int rems[16], modes[16];
		for (int i = 0; i < 16; i++) {
			int mA = m.neighbor_mode_A(i);
			int mB = m.neighbor_mode_B(i);
			// unavailable or non-IntraNxN neighbour predicts DC
			if (mA < 0 && m.blkA_avail(i)) {
				// available but not intra NxN: DC
				mA = 2;
			}
			if (mB < 0 && m.blkB_avail(i))
				mB = 2;
			int pred = (mA < 0 || mB < 0) ? 2 : (mA < mB ? mA : mB);
			int mode;
			if (gb.u1()) {
				rems[i] = -1;
				mode = pred;
			} else {
				int rem = gb.u(3);
				rems[i] = rem;
				mode = rem < pred ? rem : rem + 1;
			}
			// corrupt-stream fallback: a mode whose needed neighbour is
			// missing renders as NO-NEIGHBOUR DC (128), like the
			// reference's Intra4x4Modes tables (edge264_slice.c:573-594)
			bool aA = m.blkA_avail(i), aB = m.blkB_avail(i);
			modes[i] = mode;
			pl.pred_modes[m.gblk(i)] = (uint8_t)mode;
			bool fb = ((mode_needs_A >> mode & 1) && !aA)
			       || ((mode_needs_B >> mode & 1) && !aB)
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
		int chroma_mode = gb.ue(3);
		logf("    intra_chroma_pred_mode: %u\n", chroma_mode);
		pl.ch_modes[m.mbi] = (uint8_t)(resolve_chroma_mode(chroma_mode,
			avail_bits) | (avail_bits & 0x70));
		cbp = me_cbp_intra[gb.ue(47)];
		logf("    coded_block_pattern: %u\n", cbp);
		pl.mb_flags[m.mbi] = MBF_INTRA | MBF_PARSED;
	} else {   // ---- I_16x16 ----------------------------------------------
		int t = mb_type - 1;
		int pred_mode = t & 3;
		int cbp_chroma = (t >> 2) % 3;
		int cbp_luma = t >= 12 ? 15 : 0;
		cbp = cbp_luma | cbp_chroma << 4;
		pl.i16_modes[m.mbi] = (uint8_t)(resolve_i16_mode(pred_mode,
			avail_bits) | avail_bits);
		int chroma_mode = gb.ue(3);
		logf("    intra_chroma_pred_mode: %u\n", chroma_mode);
		pl.ch_modes[m.mbi] = (uint8_t)(resolve_chroma_mode(chroma_mode,
			avail_bits) | (avail_bits & 0x70));
		pl.mb_flags[m.mbi] = MBF_INTRA | MBF_I16x16 | MBF_PARSED;
	}

	pl.cbp[m.mbi] = (uint8_t)((cbp & 15) | (cbp >> 4) << 4);

	// ---- mb_qp_delta + residuals -----------------------------------------
	bool is16 = mb_type > 0;
	if (cbp || is16) {
		int delta = gb.se(-26, 25);
		logf("    mb_qp_delta: %d\n", delta);
		int sum = m.qp + delta;
		m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
	}
	set_mb_qp(m);
	parse_residuals(m, cbp, is16);
	return 0;
}

void Task::set_mb_qp(MbCtx &m) {
	Planes &pl = m.pl;
	pl.qp[m.mbi * 4 + 0] = (int8_t)m.qp;
	pl.qp[m.mbi * 4 + 1] = (int8_t)chroma_qp(m.qp, cpps->chroma_qp_index_offset);
	pl.qp[m.mbi * 4 + 2] =
		(int8_t)chroma_qp(m.qp, cpps->second_chroma_qp_index_offset);
}

// Shared residual syntax for I and P/B macroblocks (§7.3.5.3, CAVLC):
// Intra16x16 luma DC, luma 4x4 AC/full blocks per CBP, chroma DC + AC.
void Task::parse_residuals(MbCtx &m, int cbp, bool is16) {
	Planes &pl = m.pl;
	// reference log schema keys the residual list (edge264_slice.c:509,
	// :598) -- also makes the per-mb trace valid YAML for yaml2avc
	if (is16 || cbp)
		logf("    coeffLevels:\n");
	if (is16) {
		int nC = m.nC_luma(0);
		int16_t *out = &pl.coef_y_dc[m.mbi * 16];
		mark(Planes::DP_COEF_Y_DC, m.mbi * 16);
		int tc = parse_residual_cavlc(gb, nC, 16, zigzag4x4, out);
		log_block(*this, nC, tc, zigzag4x4, 16, out);
	}

	// luma AC / full 4x4 blocks (or 8x8 split into 4 interleaved CAVLC
	// sub-blocks, §7.4.5.3.3)
	bool t8 = (pl.mb_flags[m.mbi] & MBF_T8x8) != 0;
	static const uint8_t iota16[16] =
		{0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15};
	for (int i8 = 0; i8 < 4; i8++) {
		if (!(cbp >> i8 & 1))
			continue;
		if (t8) {
			size_t b8 = (size_t)(m.my * 2 + (i8 >> 1)) * (m.mbW * 2)
				+ m.mx * 2 + (i8 & 1);
			int16_t *out8 = &pl.coef_y8[b8 * 64];
			mark(Planes::DP_COEF_Y8, b8 * 64);
			for (int k = 0; k < 4; k++) {
				int i = i8 * 4 + k;
				int16_t tmp[16] = {0};
				int nC = m.nC_luma(i);
				int tc = parse_residual_cavlc(gb, nC, 16, iota16, tmp);
				log_block(*this, nC, tc, iota16, 16, tmp);
				pl.nz_y[m.gblk(i)] = (uint8_t)tc;
				for (int j = 0; j < 16; j++)
					out8[zigzag8x8[4 * j + k]] = tmp[j];
			}
			continue;
		}
		for (int k = 0; k < 4; k++) {
			int i = i8 * 4 + k;
			int nC = m.nC_luma(i);
			int16_t *out = &pl.coef_y[m.gblk(i) * 16];
			mark(Planes::DP_COEF_Y, m.gblk(i) * 16);
			int tc;
			if (is16) {
				tc = parse_residual_cavlc(gb, nC, 15, zigzag4x4 + 1, out);
				log_block(*this, nC, tc, zigzag4x4 + 1, 15, out);
			} else {
				tc = parse_residual_cavlc(gb, nC, 16, zigzag4x4, out);
				log_block(*this, nC, tc, zigzag4x4, 16, out);
			}
			pl.nz_y[m.gblk(i)] = (uint8_t)tc;
		}
	}

	// chroma DC (2x2, nC = -1)
	int cbp_c = cbp >> 4;
	if (cbp_c) {
		static const uint8_t scan2x2[4] = {0, 1, 2, 3};
		for (int c = 0; c < 2; c++) {
			int16_t *out = &pl.coef_c_dc[m.mbi * 8 + c * 4];
			mark(Planes::DP_COEF_C_DC, m.mbi * 8 + c * 4);
			int tc = parse_residual_cavlc(gb, -1, 4, scan2x2, out);
			log_block(*this, -1, tc, scan2x2, 4, out);
		}
	}
	// chroma AC
	if (cbp_c == 2) {
		int W2 = m.mbW * 2;
		for (int c = 0; c < 2; c++) {
			std::vector<int16_t> &plane = c == 0 ? pl.coef_cb : pl.coef_cr;
			for (int cy = 0; cy < 2; cy++) {
				for (int cx = 0; cx < 2; cx++) {
					int nC = m.nC_chroma(c, cx, cy);
					size_t blk = (size_t)(m.my * 2 + cy) * W2 + m.mx * 2 + cx;
					mark(c == 0 ? Planes::DP_COEF_CB : Planes::DP_COEF_CR,
					        blk * 16);
					int tc = parse_residual_cavlc(gb, nC, 15, zigzag4x4 + 1,
					                              &plane[blk * 16]);
					log_block(*this, nC, tc, zigzag4x4 + 1, 15,
					          &plane[blk * 16]);
					pl.nz_c[blk * 2 + c] = (uint8_t)tc;
				}
			}
		}
	}
}

// ---------------------------------------------------------------------------
// Slice data loop (§7.3.4), CAVLC.
int Task::parse_slice_data_cavlc() {
	MbCtx m(*this);
	int mb_addr = sh.first_mb;
	int n_mbs = m.mbW * m.mbH;
	int err = 0;
	int skip_run = -1;   // -1 = not in a run; counts down skipped mbs

	while (mb_addr < n_mbs) {
		m.set_addr(mb_addr);
		if (!m.claim_mb()) {     // duplicate coverage: stop + recover
			err = E264T_EBADMSG;
			break;
		}
		logf("  - mbAddr: %d\n", mb_addr);
		int r;
		if (sh.slice_type == 0) {
			r = parse_P_mb(m, skip_run);
		} else if (sh.slice_type == 1) {
			r = parse_B_mb(m, skip_run);
		} else {
			int mb_type = gb.ue(25);
			logf("    mb_type: %u\n", mb_type);
			r = parse_I_mb(m, mb_type);
		}
		if (r) { err = r; break; }
		__atomic_sub_fetch(&remaining_mbs[curr], 1, __ATOMIC_ACQ_REL);
		// deblock-control planes for this mb
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
		if (skip_run <= 0 && !gb.more_rbsp())
			break;
	}
	if (!gb.rbsp_finished() && !err)
		err = E264T_EBADMSG;
	if (err)
		recover_slice(m, mb_addr);
	return err;
}

} // namespace e264t

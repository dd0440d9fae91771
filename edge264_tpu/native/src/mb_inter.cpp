// Inter macroblock syntax + motion-vector prediction (§7.3.5.1, §8.4.1).
// P macroblocks: skip runs, partition types, sub-mb types, ref_idx, mvd
// with median prediction; emits per-4x4 mv/refIdx/refslot planes consumed
// by the device MC kernel.  Parity target: parse_P_mb / parse_P_sub_mb /
// decode_P_skip in the reference (edge264_slice.c:1566-1643, :1450-1540,
// edge264_mvpred.c:44-74), re-expressed as plain scalar logic over the
// syntax-plane layout.
#include "e264t.h"

namespace e264t {

extern const uint8_t me_cbp_inter[48];
extern const uint8_t blk4_x[16], blk4_y[16];

// ---------------------------------------------------------------------------
// Neighbour fetch for MVP (§8.4.1.3.2 + decode-order availability 6.4.11.7)

Decoder::MbCtx::NbMv Decoder::MbCtx::fetch_mv(int gx, int gy, int list) const {
	NbMv n{0, -1, 0, 0};
	int BW = mbW * 4;
	if (gx < 0 || gy < 0 || gx >= BW)
		return n;
	int nmx = gx >> 2, nmy = gy >> 2;
	if (nmx == mx && nmy == my) {
		int cell = (gy & 3) * 4 + (gx & 3);
		if (!(written >> cell & 1))
			return n;
	} else {
		size_t nmb = (size_t)nmy * mbW + nmx;
		if (nmb >= mbi || pl.slice_id[nmb] != slice_id)
			return n;
		if (pl.mb_flags[nmb] & MBF_INTRA) {
			n.avail = 1;        // available but intra: ref -1, mv 0
			return n;
		}
	}
	n.avail = 1;
	size_t c = (size_t)gy * BW + gx;
	n.ref = pl.refpoc_idx[c * 2 + list];
	n.mvx = pl.mvs[(c * 2 + list) * 2];
	n.mvy = pl.mvs[(c * 2 + list) * 2 + 1];
	return n;
}

static int median3(int a, int b, int c) {
	return a > b ? (b > c ? b : a > c ? c : a)
	             : (a > c ? a : b > c ? c : b);
}

// shape: 0 = square/other, 1 = 16x8 top, 2 = 16x8 bottom, 3 = 8x16 left,
// 4 = 8x16 right (the directional overrides of §8.4.1.3)
void Decoder::MbCtx::mvp_median(int list, int refIdx, int x4, int y4,
                                int w4, int h4, int shape,
                                int *mvpx, int *mvpy) const {
	int gx = mx * 4 + x4, gy = my * 4 + y4;
	NbMv A = fetch_mv(gx - 1, gy, list);
	NbMv B = fetch_mv(gx, gy - 1, list);
	NbMv C = fetch_mv(gx + w4, gy - 1, list);
	if (!C.avail)
		C = fetch_mv(gx - 1, gy - 1, list);    // D substitution
	// B and C (and D) unavailable: inherit from A (§8.4.1.3.2)
	if (!B.avail && !C.avail && A.avail) {
		B = C = A;
	}
	// directional rules for 16x8 / 8x16 mb partitions (§8.4.1.3)
	if (shape == 1 && B.avail && B.ref == refIdx) {
		*mvpx = B.mvx; *mvpy = B.mvy; return;
	}
	if (shape == 2 && A.avail && A.ref == refIdx) {
		*mvpx = A.mvx; *mvpy = A.mvy; return;
	}
	if (shape == 3 && A.avail && A.ref == refIdx) {
		*mvpx = A.mvx; *mvpy = A.mvy; return;
	}
	if (shape == 4 && C.avail && C.ref == refIdx) {
		*mvpx = C.mvx; *mvpy = C.mvy; return;
	}
	int ma = A.avail && A.ref == refIdx;
	int mb_ = B.avail && B.ref == refIdx;
	int mc = C.avail && C.ref == refIdx;
	if (ma + mb_ + mc == 1) {
		const NbMv &n = ma ? A : mb_ ? B : C;
		*mvpx = n.mvx; *mvpy = n.mvy; return;
	}
	*mvpx = median3(A.mvx, B.mvx, C.mvx);
	*mvpy = median3(A.mvy, B.mvy, C.mvy);
}

void Decoder::MbCtx::store_mv(int list, int x4, int y4, int w4, int h4,
                              int refIdx, int slot, int mvx, int mvy) {
	int BW = mbW * 4;
	for (int dy = 0; dy < h4; dy++) {
		for (int dx = 0; dx < w4; dx++) {
			int gx = mx * 4 + x4 + dx, gy = my * 4 + y4 + dy;
			size_t c = (size_t)gy * BW + gx;
			pl.refpoc_idx[c * 2 + list] = (int8_t)refIdx;
			pl.refslot[c * 2 + list] = (int8_t)slot;
			pl.mvs[(c * 2 + list) * 2] = (int16_t)mvx;
			pl.mvs[(c * 2 + list) * 2 + 1] = (int16_t)mvy;
			written |= 1u << ((y4 + dy) * 4 + x4 + dx);
		}
	}
}

// mark an intra (or missing) mb's cells in the mv planes
static void clear_inter_cells(Decoder::MbCtx &m) {
	int BW = m.mbW * 4;
	for (int dy = 0; dy < 4; dy++) {
		for (int dx = 0; dx < 4; dx++) {
			size_t c = (size_t)(m.my * 4 + dy) * BW + m.mx * 4 + dx;
			for (int l = 0; l < 2; l++) {
				m.pl.refpoc_idx[c * 2 + l] = -1;
				m.pl.refslot[c * 2 + l] = -1;
				m.pl.mvs[(c * 2 + l) * 2] = 0;
				m.pl.mvs[(c * 2 + l) * 2 + 1] = 0;
			}
		}
	}
}


// Resolve explicit prediction weights per 8x8 quadrant into the wp planes
// (§8.4.2.3.2 resolved at parse time so the device kernel needs no
// per-refIdx lookups).
static void fill_wp(Decoder &d, Decoder::MbCtx &m) {
	Planes &pl = m.pl;
	int8_t *wp = &pl.wp[m.mbi * 24];
	wp[0] = (int8_t)d.sh.weighted_bipred_idc;
	wp[1] = (int8_t)d.sh.luma_log2_weight_denom;
	wp[2] = (int8_t)d.sh.chroma_log2_weight_denom;
	if (d.sh.weighted_bipred_idc != 1)
		return;
	int BW = m.mbW * 4, W2 = m.mbW * 2;
	for (int q = 0; q < 4; q++) {
		int cx = m.mx * 2 + (q & 1), cy = m.my * 2 + (q >> 1);
		size_t cell = (size_t)(m.my * 4 + (q >> 1) * 2) * BW
			+ m.mx * 4 + (q & 1) * 2;
		int8_t *w8 = &pl.wp8[((size_t)cy * W2 + cx) * 12];
		for (int l = 0; l < 2; l++) {
			int ref = pl.refpoc_idx[cell * 2 + l];
			if (ref < 0)
				continue;
			for (int c = 0; c < 3; c++) {
				w8[(l * 3 + c) * 2] = (int8_t)d.sh.weights[l][ref][c];
				w8[(l * 3 + c) * 2 + 1] = (int8_t)d.sh.offsets[l][ref][c];
			}
		}
	}
}

// ---------------------------------------------------------------------------
// ref_idx: truncated Exp-Golomb (te, §9.1.1)
static int parse_ref_idx_te(BitReader &gb, int max) {
	if (max == 0)
		return 0;
	if (max == 1)
		return gb.u1() ^ 1;
	return (int)gb.ue(max);
}

// P_Skip motion inference (§8.4.1.1)
static void decode_P_skip(Decoder &d, Decoder::MbCtx &m) {
	int gx = m.mx * 4, gy = m.my * 4;
	auto A = m.fetch_mv(gx - 1, gy, 0);
	auto B = m.fetch_mv(gx, gy - 1, 0);
	int mvx = 0, mvy = 0;
	if (A.avail && B.avail &&
	    !(A.ref == 0 && A.mvx == 0 && A.mvy == 0) &&
	    !(B.ref == 0 && B.mvx == 0 && B.mvy == 0)) {
		m.mvp_median(0, 0, 0, 0, 4, 4, 0, &mvx, &mvy);
	}
	m.store_mv(0, 0, 0, 4, 4, 0, d.sh.RefPicList[0][0], mvx, mvy);
	m.pl.mb_flags[m.mbi] = MBF_INTER | MBF_SKIP | MBF_PARSED;
	fill_wp(d, m);
	d.set_mb_qp(m);
}

// ---------------------------------------------------------------------------
int Decoder::parse_P_mb(MbCtx &m, int &skip_run) {
	Planes &pl = m.pl;

	if (skip_run < 0) {
		skip_run = (int)gb.ue(139264);
		logf("    mb_skip_run: %u\n", skip_run);
	}
	if (skip_run-- > 0) {
		decode_P_skip(*this, m);
		return 0;
	}
	skip_run = -1;

	int mb_type = gb.ue(30);
	logf("    mb_type: %u\n", mb_type);
	if (mb_type > 4) {
		int r = parse_I_mb(m, mb_type - 5);
		clear_inter_cells(m);
		return r;
	}

	int nrefs = sh.num_refs[0];
	int slot0 = -2;
	int refidx[4] = {0, 0, 0, 0};
	int sub_types[4] = {0, 0, 0, 0};

	if (mb_type <= 2) {
		// ---- large partitions: 16x16 / 16x8 / 8x16 ----------------------
		// partition list: (x4, y4, w4, h4, shape, ref-slot index)
		struct Part { int x4, y4, w4, h4, shape, ri; };
		Part parts16[1] = {{0, 0, 4, 4, 0, 0}};
		Part parts16x8[2] = {{0, 0, 4, 2, 1, 0}, {0, 2, 4, 2, 2, 2}};
		Part parts8x16[2] = {{0, 0, 2, 4, 3, 0}, {2, 0, 2, 4, 4, 1}};
		Part *parts = mb_type == 0 ? parts16
		            : mb_type == 1 ? parts16x8 : parts8x16;
		int n_parts = mb_type == 0 ? 1 : 2;

		logf("    ref_idx: {");
		for (int i = 0; i < n_parts; i++) {
			refidx[i] = 0;
			if (nrefs > 1) {
				refidx[i] = parse_ref_idx_te(gb, nrefs - 1);
				logf("\"%u\":%u,", parts[i].ri, refidx[i]);
			}
		}
		logf("}\n");
		logf("    mvds: [");
		for (int i = 0; i < n_parts; i++) {
			int mvdx = gb.se(-32768, 32767);
			int mvdy = gb.se(-32768, 32767);
			logf("[%d,%d],", mvdx, mvdy);
			Part &p = parts[i];
			int mvpx, mvpy;
			m.mvp_median(0, refidx[i], p.x4, p.y4, p.w4, p.h4, p.shape,
			             &mvpx, &mvpy);
			m.store_mv(0, p.x4, p.y4, p.w4, p.h4, refidx[i],
			           sh.RefPicList[0][refidx[i]], mvpx + mvdx, mvpy + mvdy);
		}
		logf("]\n");
	} else {
		// ---- P_8x8 / P_8x8ref0 ------------------------------------------
		logf("    sub_mb_types: [");
		for (int i = 0; i < 4; i++) {
			sub_types[i] = gb.ue(3);
			logf(i < 3 ? "%u," : "%u]\n", sub_types[i]);
		}
		logf("    ref_idx: {");
		for (int i = 0; i < 4; i++) {
			refidx[i] = 0;
			if (mb_type == 3 && nrefs > 1) {
				refidx[i] = parse_ref_idx_te(gb, nrefs - 1);
				logf("\"%u\":%u,", i, refidx[i]);
			}
		}
		logf("}\n");
		logf("    mvds: [");
		for (int i = 0; i < 4; i++) {
			int bx = (i & 1) * 2, by = (i >> 1) * 2;
			// sub partitions: 0=8x8, 1=8x4, 2=4x8, 3=4x4
			static const int subw[4] = {2, 2, 1, 1};
			static const int subh[4] = {2, 1, 2, 1};
			int w4 = subw[sub_types[i]], h4 = subh[sub_types[i]];
			for (int sy = 0; sy < 2; sy += h4) {
				for (int sx = 0; sx < 2; sx += w4) {
					int mvdx = gb.se(-32768, 32767);
					int mvdy = gb.se(-32768, 32767);
					logf("[%d,%d],", mvdx, mvdy);
					int mvpx, mvpy;
					m.mvp_median(0, refidx[i], bx + sx, by + sy, w4, h4, 0,
					             &mvpx, &mvpy);
					m.store_mv(0, bx + sx, by + sy, w4, h4, refidx[i],
					           sh.RefPicList[0][refidx[i]],
					           mvpx + mvdx, mvpy + mvdy);
				}
			}
		}
		logf("]\n");
	}
	(void)slot0;
	pl.mb_flags[m.mbi] = MBF_INTER | MBF_PARSED;
	fill_wp(*this, m);

	// ---- coded_block_pattern + residuals ---------------------------------
	int cbp = me_cbp_inter[gb.ue(47)];
	logf("    coded_block_pattern: %u\n", cbp);
	if (cbp & 15) {
		if (cpps->transform_8x8_mode)
			return E264T_ENOTSUP;   // TEMP: inter 8x8 lands with High profile
	}
	if (cbp) {
		int delta = gb.se(-26, 25);
		logf("    mb_qp_delta: %d\n", delta);
		int sum = m.qp + delta;
		m.qp = sum < 0 ? sum + 52 : sum >= 52 ? sum - 52 : sum;
	}
	set_mb_qp(m);
	parse_residuals(m, cbp, false);
	return 0;
}

int Decoder::parse_B_mb(MbCtx &m, int &skip_flag) {
	(void)m; (void)skip_flag;
	return E264T_ENOTSUP;   // B slices: next milestone
}

} // namespace e264t

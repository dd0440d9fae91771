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

Task::MbCtx::NbMv Task::MbCtx::fetch_mv(int gx, int gy, int list) const {
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
		if (nmb >= mbi || ld16(pl.slice_id[nmb]) != slice_id)
			return n;
		if (pl.mb_flags[nmb] & MBF_INTRA) {
			n.avail = 1;        // available but intra: ref -1, mv 0
			return n;
		}
	}
	n.avail = 1;
	size_t c = (size_t)gy * BW + gx;
	n.ref = pl.refpoc_idx[c * 2 + list];
	if (n.ref < 0)        // no list-X motion: mvLXN = 0 (§8.4.1.3.2) --
		return n;         // the plane cell may hold a stale vector
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
void Task::MbCtx::mvp_median(int list, int refIdx, int x4, int y4,
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

void Task::MbCtx::store_mv(int list, int x4, int y4, int w4, int h4,
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
void Decoder_clear_inter_cells(Task::MbCtx &m) {
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
void Decoder_fill_wp(Task &d, Task::MbCtx &m) {
	Planes &pl = m.pl;
	int8_t *wp = &pl.wp[m.mbi * 24];
	wp[0] = (int8_t)d.sh.weighted_bipred_idc;
	wp[1] = (int8_t)d.sh.luma_log2_weight_denom;
	wp[2] = (int8_t)d.sh.chroma_log2_weight_denom;
	int mode = d.sh.weighted_bipred_idc;
	if (mode != 1 && mode != 2)
		return;
	if (mode == 2)
		wp[1] = wp[2] = 5;      // implicit: logWD = 5, offsets 0 (§8.4.2.3.1)
	int BW = m.mbW * 4, W2 = m.mbW * 2;
	for (int q = 0; q < 4; q++) {
		int cx = m.mx * 2 + (q & 1), cy = m.my * 2 + (q >> 1);
		size_t cell = (size_t)(m.my * 4 + (q >> 1) * 2) * BW
			+ m.mx * 4 + (q & 1) * 2;
		int8_t *w8 = &pl.wp8[((size_t)cy * W2 + cx) * 12];
		if (mode == 1) {
			for (int l = 0; l < 2; l++) {
				int ref = pl.refpoc_idx[cell * 2 + l];
				if (ref < 0)
					continue;
				for (int c = 0; c < 3; c++) {
					w8[(l * 3 + c) * 2] = (int8_t)d.sh.weights[l][ref][c];
					w8[(l * 3 + c) * 2 + 1] = (int8_t)d.sh.offsets[l][ref][c];
				}
			}
			continue;
		}
		// implicit: weights from POC distances of the two referenced pictures
		int s0 = pl.refslot[cell * 2], s1 = pl.refslot[cell * 2 + 1];
		if (s0 < 0 || s1 < 0)
			continue;
		int w0 = 32, w1 = 32;
		uint32_t lt_only = d.curr_lt & ~d.curr_st;
		int poc0 = d.Poc[0][s0] < d.Poc[1][s0] ? d.Poc[0][s0] : d.Poc[1][s0];
		int poc1 = d.Poc[0][s1] < d.Poc[1][s1] ? d.Poc[0][s1] : d.Poc[1][s1];
		int poc_cur = d.Poc[0][d.curr] < d.Poc[1][d.curr]
			? d.Poc[0][d.curr] : d.Poc[1][d.curr];
		if (poc1 != poc0 && !(lt_only >> s0 & 1) && !(lt_only >> s1 & 1)) {
			auto c128 = [](int v) { return v < -128 ? -128 : v > 127 ? 127 : v; };
			int tb = c128(poc_cur - poc0);
			int td = c128(poc1 - poc0);
			int tx = (16384 + (td >= 0 ? td / 2 : -(td / 2))) / td;
			int dsf = (tb * tx + 32) >> 6;
			dsf = dsf < -1024 ? -1024 : dsf > 1023 ? 1023 : dsf;
			if (dsf >> 2 >= -64 && dsf >> 2 <= 128) {
				w1 = dsf >> 2;
				w0 = 64 - w1;
			}
		}
		for (int c = 0; c < 3; c++) {
			w8[(0 * 3 + c) * 2] = (int8_t)w0;
			w8[(0 * 3 + c) * 2 + 1] = 0;
			w8[(1 * 3 + c) * 2] = (int8_t)w1;
			w8[(1 * 3 + c) * 2 + 1] = 0;
		}
	}
}

// ---------------------------------------------------------------------------
// ref_idx: truncated Exp-Golomb (te, §9.1.1)
int parse_ref_idx_te(BitReader &gb, int max) {
	if (max == 0)
		return 0;
	if (max == 1)
		return gb.u1() ^ 1;
	return (int)gb.ue(max);
}

// P_Skip motion inference (§8.4.1.1)
void Decoder_P_skip(Task &d, Task::MbCtx &m) {
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
	Decoder_fill_wp(d, m);
	d.set_mb_qp(m);
}

// ---------------------------------------------------------------------------
int Task::parse_P_mb(MbCtx &m, int &skip_run) {
	Planes &pl = m.pl;

	if (skip_run < 0) {
		skip_run = (int)gb.ue(139264);
		logf("    mb_skip_run: %u\n", skip_run);
	}
	if (skip_run-- > 0) {
		Decoder_P_skip(*this, m);
		return 0;
	}
	skip_run = -1;

	int mb_type = gb.ue(30);
	logf("    mb_type: %u\n", mb_type);
	if (mb_type > 4) {
		int r = parse_I_mb(m, mb_type - 5);
		Decoder_clear_inter_cells(m);
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
	Decoder_fill_wp(*this, m);

	// ---- coded_block_pattern + residuals ---------------------------------
	int cbp = me_cbp_inter[gb.ue(47)];
	pl.cbp[m.mbi] = (uint8_t)cbp;
	logf("    coded_block_pattern: %u\n", cbp);
	bool t8_ok = mb_type <= 2 ||
		(sub_types[0] | sub_types[1] | sub_types[2] | sub_types[3]) == 0;
	if ((cbp & 15) && cpps->transform_8x8_mode && t8_ok) {
		if (gb.u1()) {
			pl.mb_flags[m.mbi] |= MBF_T8x8;
			logf("    transform_size_8x8_flag: 1\n");
		} else {
			logf("    transform_size_8x8_flag: 0\n");
		}
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

// ---------------------------------------------------------------------------
// B slices (§7.3.5.1/.2, §8.4.1.2): direct modes + per-list partitions.

static int clip3(int lo, int hi, int v) { return v < lo ? lo : v > hi ? hi : v; }

// PicOrderCnt of a frame (progressive: min of the two field counts)
static int poc_of(const Task &d, int slot) {
	int a = d.Poc[0][slot], b = d.Poc[1][slot];
	return a < b ? a : b;
}

// §8.4.1.2.2 spatial + §8.4.1.2.3 temporal direct prediction for the 8x8
// quadrants in quad_mask of the current mb.
void Decoder_direct_mv_pred(Task &d, Task::MbCtx &m, int quad_mask) {
	int colslot = d.sh.RefPicList[1][0];
	Planes &cp = d.planes[colslot < 0 ? 0 : colslot];
	int BW = m.mbW * 4;
	uint32_t lt_only = d.curr_lt & ~d.curr_st;
	// with direct_8x8_inference, each quadrant uses its corner 4x4 cell
	static const int corner_x[4] = {0, 3, 0, 3};
	static const int corner_y[4] = {0, 0, 3, 3};

	// fetch the co-located cell's refIdx / mv / ref slot
	auto col_info = [&](int cx, int cy, int &refIdxCol, int &mvx, int &mvy,
	                    int &colRefSlot) {
		size_t cell = (size_t)(m.my * 4 + cy) * BW + m.mx * 4 + cx;
		int r0 = colslot < 0 ? -1 : cp.refpoc_idx[cell * 2];
		int r1 = colslot < 0 ? -1 : cp.refpoc_idx[cell * 2 + 1];
		int l = r0 >= 0 ? 0 : 1;
		if (r0 >= 0 || r1 >= 0) {
			refIdxCol = l ? r1 : r0;
			mvx = cp.mvs[(cell * 2 + l) * 2];
			mvy = cp.mvs[(cell * 2 + l) * 2 + 1];
			colRefSlot = cp.refslot[cell * 2 + l];
		} else {              // intra or unparsed co-located block (§8.4.1.2.1):
			// refIdxCol = -1 keeps colZeroFlag false in spatial direct;
			// temporal maps refIdxCol < 0 to current refIdxL0 = 0.
			refIdxCol = -1;
			mvx = mvy = 0;
			colRefSlot = d.sh.RefPicList[0][0];
		}
	};

	if (d.sh.direct_spatial) {
		// reference-list-wide refIdx and mvp, computed once per mb
		int refL[2], mvpx[2] = {0, 0}, mvpy[2] = {0, 0};
		for (int l = 0; l < 2; l++) {
			int gx = m.mx * 4, gy = m.my * 4;
			auto A = m.fetch_mv(gx - 1, gy, l);
			auto B = m.fetch_mv(gx, gy - 1, l);
			auto C = m.fetch_mv(gx + 4, gy - 1, l);
			if (!C.avail)
				C = m.fetch_mv(gx - 1, gy - 1, l);
			int r = -1;
			for (auto &n : {A, B, C})
				if (n.avail && n.ref >= 0 && (r < 0 || n.ref < r))
					r = n.ref;
			refL[l] = r;
		}
		int zero_pred = refL[0] < 0 && refL[1] < 0;
		if (zero_pred)
			refL[0] = refL[1] = 0;
		else
			for (int l = 0; l < 2; l++)
				if (refL[l] >= 0)
					m.mvp_median(l, refL[l], 0, 0, 4, 4, 0,
					             &mvpx[l], &mvpy[l]);
		bool col_short = colslot >= 0 && !(lt_only >> colslot & 1);
		for (int q = 0; q < 4; q++) {
			if (!(quad_mask >> q & 1))
				continue;
			int refIdxCol = -1, cmx = 0, cmy = 0, colRefSlot = 0;
			if (d.sps.direct_8x8_inference)
				col_info(corner_x[q], corner_y[q], refIdxCol, cmx, cmy,
				         colRefSlot);
			for (int sy = 0; sy < 2; sy++) {
				for (int sx = 0; sx < 2; sx++) {
					int x4 = (q & 1) * 2 + sx, y4 = (q >> 1) * 2 + sy;
					if (!d.sps.direct_8x8_inference)
						col_info(x4, y4, refIdxCol, cmx, cmy, colRefSlot);
					bool colZero = col_short && refIdxCol == 0 &&
						cmx >= -1 && cmx <= 1 && cmy >= -1 && cmy <= 1;
					for (int l = 0; l < 2; l++) {
						if (refL[l] < 0)
							continue;
						int mx_ = mvpx[l], my_ = mvpy[l];
						if (zero_pred || (refL[l] == 0 && colZero))
							mx_ = my_ = 0;
						m.store_mv(l, x4, y4, 1, 1, refL[l],
						           d.sh.RefPicList[l][refL[l]], mx_, my_);
					}
				}
			}
		}
	} else {
		// temporal direct
		int poc_cur = poc_of(d, d.curr);
		int poc_col = colslot < 0 ? 0 : poc_of(d, colslot);
		for (int q = 0; q < 4; q++) {
			if (!(quad_mask >> q & 1))
				continue;
			int refIdxCol = -1, cmx = 0, cmy = 0, colRefSlot = 0;
			if (d.sps.direct_8x8_inference)
				col_info(corner_x[q], corner_y[q], refIdxCol, cmx, cmy,
				         colRefSlot);
			for (int sy = 0; sy < 2; sy++) {
				for (int sx = 0; sx < 2; sx++) {
					int x4 = (q & 1) * 2 + sx, y4 = (q >> 1) * 2 + sy;
					if (!d.sps.direct_8x8_inference)
						col_info(x4, y4, refIdxCol, cmx, cmy, colRefSlot);
					// map the col reference picture into current list 0
					int refL0 = 0;
					for (int i = 0; i < d.sh.num_refs[0]; i++) {
						if (d.sh.RefPicList[0][i] == colRefSlot) {
							refL0 = i;
							break;
						}
					}
					int l0slot = d.sh.RefPicList[0][refL0];
					int mv0x, mv0y, mv1x, mv1y;
					int td = clip3(-128, 127,
					               poc_col - (colRefSlot < 0 ? 0
					                          : poc_of(d, colRefSlot)));
					bool lt_ref = colRefSlot >= 0 &&
						(lt_only >> colRefSlot & 1);
					if (lt_ref || td == 0) {
						mv0x = cmx; mv0y = cmy;
						mv1x = mv1y = 0;
					} else {
						int tb = clip3(-128, 127,
						               poc_cur - (colRefSlot < 0 ? 0
						                          : poc_of(d, colRefSlot)));
						int tx = (16384 + (td >= 0 ? td / 2 : -(td / 2))) / td;
						int dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6);
						mv0x = (dsf * cmx + 128) >> 8;
						mv0y = (dsf * cmy + 128) >> 8;
						mv1x = mv0x - cmx;
						mv1y = mv0y - cmy;
					}
					m.store_mv(0, x4, y4, 1, 1, refL0, l0slot, mv0x, mv0y);
					m.store_mv(1, x4, y4, 1, 1, 0, d.sh.RefPicList[1][0],
					           mv1x, mv1y);
				}
			}
		}
	}
}

// sub_mb_type -> (list-use bitmask, sub width4, sub height4); 0 = direct
static const uint8_t b_sub_use[13] = {0, 1, 2, 3, 1, 1, 2, 2, 3, 3, 1, 2, 3};
static const uint8_t b_sub_w[13] = {2, 2, 2, 2, 2, 1, 2, 1, 2, 1, 1, 1, 1};
static const uint8_t b_sub_h[13] = {2, 2, 2, 2, 1, 2, 1, 2, 1, 2, 1, 1, 1};

int Task::parse_B_mb(MbCtx &m, int &skip_run) {
	Planes &pl = m.pl;

	if (skip_run < 0) {
		skip_run = (int)gb.ue(139264);
		logf("    mb_skip_run: %u\n", skip_run);
	}
	if (skip_run-- > 0) {        // B_Skip
		Decoder_direct_mv_pred(*this, m, 0xF);
		pl.mb_flags[m.mbi] = MBF_INTER | MBF_SKIP | MBF_DIRECT | MBF_PARSED;
		Decoder_fill_wp(*this, m);
		set_mb_qp(m);
		return 0;
	}
	skip_run = -1;

	int mb_type = gb.ue(48);
	logf("    mb_type: %u\n", mb_type);
	if (mb_type > 22) {
		int r = parse_I_mb(m, mb_type - 23);
		Decoder_clear_inter_cells(m);
		return r;
	}

	int nrefs[2] = {sh.num_refs[0], sh.num_refs[1]};
	int b_sub[4] = {1, 1, 1, 1};     // B_8x8 sub types (for t8 eligibility)
	int *sub = b_sub;
	if (mb_type == 0) {          // B_Direct_16x16
		Decoder_direct_mv_pred(*this, m, 0xF);
	} else if (mb_type < 22) {
		// large partitions
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
			if ((mb_type & 1) == 0) {   // 16x8
				parts[0] = {0, 0, 4, 2, 1, 0, pair_use[k][0]};
				parts[1] = {0, 2, 4, 2, 2, 2, pair_use[k][1]};
			} else {                     // 8x16
				parts[0] = {0, 0, 2, 4, 3, 0, pair_use[k][0]};
				parts[1] = {2, 0, 2, 4, 4, 1, pair_use[k][1]};
			}
		}
		int refidx[2][2] = {{0, 0}, {0, 0}};
		int mvd[2][2][2];
		logf("    ref_idx: {");
		for (int l = 0; l < 2; l++)
			for (int i = 0; i < n_parts; i++)
				if ((parts[i].use >> l & 1) && nrefs[l] > 1) {
					refidx[l][i] = parse_ref_idx_te(gb, nrefs[l] - 1);
					logf("\"%u\":%u,", parts[i].ri + l * 4, refidx[l][i]);
				}
		logf("}\n    mvds: [");
		for (int l = 0; l < 2; l++)
			for (int i = 0; i < n_parts; i++)
				if (parts[i].use >> l & 1) {
					mvd[l][i][0] = gb.se(-32768, 32767);
					mvd[l][i][1] = gb.se(-32768, 32767);
					logf("[%d,%d],", mvd[l][i][0], mvd[l][i][1]);
				}
		logf("]\n");
		// derive in partition order, both lists per partition
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
	} else {                     // B_8x8
		logf("    sub_mb_types: [");
		for (int q = 0; q < 4; q++) {
			sub[q] = gb.ue(12);
			logf(q < 3 ? "%u," : "%u]\n", sub[q]);
		}
		int refidx[2][4] = {{0, 0, 0, 0}, {0, 0, 0, 0}};
		int mvd[2][4][4][2];     // [list][quad][subpart][xy]
		logf("    ref_idx: {");
		for (int l = 0; l < 2; l++)
			for (int q = 0; q < 4; q++)
				if (sub[q] != 0 && (b_sub_use[sub[q]] >> l & 1) &&
				    nrefs[l] > 1) {
					refidx[l][q] = parse_ref_idx_te(gb, nrefs[l] - 1);
					logf("\"%u\":%u,", q + l * 4, refidx[l][q]);
				}
		logf("}\n    mvds: [");
		for (int l = 0; l < 2; l++)
			for (int q = 0; q < 4; q++) {
				if (sub[q] == 0 || !(b_sub_use[sub[q]] >> l & 1))
					continue;
				int w4 = b_sub_w[sub[q]], h4 = b_sub_h[sub[q]];
				int n = (2 / w4) * (2 / h4), k = 0;
				(void)n;
				for (int sy = 0; sy < 2; sy += h4)
					for (int sx = 0; sx < 2; sx += w4) {
						mvd[l][q][k][0] = gb.se(-32768, 32767);
						mvd[l][q][k][1] = gb.se(-32768, 32767);
						logf("[%d,%d],", mvd[l][q][k][0], mvd[l][q][k][1]);
						k++;
					}
			}
		logf("]\n");
		// derive in quadrant order
		for (int q = 0; q < 4; q++) {
			if (sub[q] == 0) {
				Decoder_direct_mv_pred(*this, m, 1 << q);
				continue;
			}
			int bx = (q & 1) * 2, by = (q >> 1) * 2;
			int w4 = b_sub_w[sub[q]], h4 = b_sub_h[sub[q]];
			int k = 0;
			for (int sy = 0; sy < 2; sy += h4)
				for (int sx = 0; sx < 2; sx += w4) {
					for (int l = 0; l < 2; l++) {
						if (!(b_sub_use[sub[q]] >> l & 1))
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

	pl.mb_flags[m.mbi] = MBF_INTER | MBF_PARSED | (mb_type == 0 ? MBF_DIRECT : 0);
	Decoder_fill_wp(*this, m);

	int cbp = me_cbp_inter[gb.ue(47)];
	pl.cbp[m.mbi] = (uint8_t)cbp;
	logf("    coded_block_pattern: %u\n", cbp);
	bool t8_ok;
	if (mb_type == 0) {
		t8_ok = sps.direct_8x8_inference;
	} else if (mb_type < 22) {
		t8_ok = true;
	} else {
		t8_ok = true;
		for (int q = 0; q < 4; q++) {
			if (b_sub[q] == 0)
				t8_ok = t8_ok && sps.direct_8x8_inference;
			else if (b_sub[q] > 3)
				t8_ok = false;     // smaller than 8x8 sub-partition
		}
	}
	if ((cbp & 15) && cpps->transform_8x8_mode && t8_ok) {
		if (gb.u1()) {
			pl.mb_flags[m.mbi] |= MBF_T8x8;
			logf("    transform_size_8x8_flag: 1\n");
		} else {
			logf("    transform_size_8x8_flag: 0\n");
		}
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

// ---------------------------------------------------------------------------
// Error recovery of an erroneous slice (recover_slice analog,
// edge264_headers.c:295-430): every mb already decoded by the slice gets a
// graded error probability -- CAVLC errors are equiprobable over the slice
// (uniform ramp); a CABAC error could have exited early at any
// end_of_slice_flag with p=2/383, giving the geometric model computed in
// the same 16-bit fixed point as the reference (ppow, :266-275).  P/B mbs
// above the 25% threshold are re-predicted as P_Skip / B_Direct with their
// residuals dropped (:399-428); I mbs are flagged for a device-side blend
// toward neighbour DC weighted by the probability (:316-396; the blend
// reads pre-blend neighbour pixels so it batches, a documented divergence
// from the reference's in-place raster blend).
static unsigned ppow16(unsigned p65536, unsigned k) {
	unsigned r = 65536;
	while (k) {
		if (k & 1)
			r = (r * p65536) >> 16;
		p65536 = (p65536 * p65536) >> 16;
		k >>= 1;
	}
	return r;
}

void Task::recover_slice(MbCtx &m, int end_mb) {
	unsigned first = sh.first_mb;
	if (end_mb <= (int)first)
		return;
	unsigned num = end_mb - first;
	bool cabac_mode = cpps->entropy_coding_mode;
	unsigned div = 65536 - ppow16(65194, num);
	for (unsigned i = 0; i < num; i++) {
		unsigned p12800 = !cabac_mode
			? ((i + 1) * 12800 + num - 1) / num
			: ((div - (65536 - ppow16(65194, num - 1 - i))) * 12800
			   + div - 1) / div;
		m.set_addr(first + i);
		m.pl.mb_errors[m.mbi] = (uint8_t)(p12800 >> 7);
		unsigned p128 = p12800 / 100;
		if (sh.slice_type == 2) {
			m.pl.mb_flags[m.mbi] |= MBF_BLEND;
		} else if (i > 0 && p128 >= 32) {   // 25% threshold (:398)
			m.pl.clear_mb_range(first + i, first + i + 1);
			if (sh.slice_type == 0) {
				Decoder_P_skip(*this, m);
			} else {
				m.pl.mb_flags[m.mbi] =
					MBF_INTER | MBF_SKIP | MBF_DIRECT | MBF_PARSED;
				Decoder_direct_mv_pred(*this, m, 0xF);
				Decoder_fill_wp(*this, m);
				set_mb_qp(m);
			}
		}
	}
}

} // namespace e264t

// Constant tables mandated by ISO/IEC 14496-10 (H.264).  All values are
// standard data, cited per spec section.
#include "e264t.h"

namespace e264t {

// Zig-zag scan for 4x4 blocks (§8.5.6, frame coding): scan position i maps
// to raster position zigzag4x4[i].
extern const uint8_t zigzag4x4[16] = {
	0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15
};

// Zig-zag scan for 8x8 blocks (§8.5.7, frame coding).
extern const uint8_t zigzag8x8[64] = {
	 0,  1,  8, 16,  9,  2,  3, 10,
	17, 24, 32, 25, 18, 11,  4,  5,
	12, 19, 26, 33, 40, 48, 41, 34,
	27, 20, 13,  6,  7, 14, 21, 28,
	35, 42, 49, 56, 57, 50, 43, 36,
	29, 22, 15, 23, 30, 37, 44, 51,
	58, 59, 52, 45, 38, 31, 39, 46,
	53, 60, 61, 54, 47, 55, 62, 63
};

// QPc as a function of qPI = Clip3(0, 51, QPy + chroma_qp_offset)
// (§8.5.8 Table 8-15; identity below 30).
static const int8_t qpc_tail[22] = {
	29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36,
	37, 37, 37, 38, 38, 38, 39, 39, 39, 39
};
int chroma_qp(int qpy, int offset) {
	int q = qpy + offset;
	q = q < 0 ? 0 : q > 51 ? 51 : q;
	return q < 30 ? q : qpc_tail[q - 30];
}

// coded_block_pattern mapped-Exp-Golomb tables (§9.1.1 Table 9-4,
// ChromaArrayType 1/2): codeNum -> coded_block_pattern, intra / inter.
extern const uint8_t me_cbp_intra[48] = {
	47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
	16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
	8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41
};
extern const uint8_t me_cbp_inter[48] = {
	0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
	14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
	17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41
};

// luma4x4BlkIdx -> (x, y) in 4-sample units within the mb (§6.4.3):
// blocks are raster within 2x2 quads, quads raster within the mb.
extern const uint8_t blk4_x[16] = {0,1,0,1, 2,3,2,3, 0,1,0,1, 2,3,2,3};
extern const uint8_t blk4_y[16] = {0,0,1,1, 0,0,1,1, 2,2,3,3, 2,2,3,3};

// Default scaling lists (§7.4.2.1.1.1 Tables 7-3/7-4), raster order
// (the spec lists them in zig-zag order; these are un-zigzagged).
extern const uint8_t default_4x4_intra[16] = {
	 6, 13, 20, 28,
	13, 20, 28, 32,
	20, 28, 32, 37,
	28, 32, 37, 42
};
extern const uint8_t default_4x4_inter[16] = {
	10, 14, 20, 24,
	14, 20, 24, 27,
	20, 24, 27, 30,
	24, 27, 30, 34
};
extern const uint8_t default_8x8_intra[64] = {
	 6, 10, 13, 16, 18, 23, 25, 27,
	10, 11, 16, 18, 23, 25, 27, 29,
	13, 16, 18, 23, 25, 27, 29, 31,
	16, 18, 23, 25, 27, 29, 31, 33,
	18, 23, 25, 27, 29, 31, 33, 36,
	23, 25, 27, 29, 31, 33, 36, 38,
	25, 27, 29, 31, 33, 36, 38, 40,
	27, 29, 31, 33, 36, 38, 40, 42
};
extern const uint8_t default_8x8_inter[64] = {
	 9, 13, 15, 17, 19, 21, 22, 24,
	13, 13, 17, 19, 21, 22, 24, 25,
	15, 17, 19, 21, 22, 24, 25, 27,
	17, 19, 21, 22, 24, 25, 27, 28,
	19, 21, 22, 24, 25, 27, 28, 30,
	21, 22, 24, 25, 27, 28, 30, 32,
	22, 24, 25, 27, 28, 30, 32, 33,
	24, 25, 27, 28, 30, 32, 33, 35
};
extern const uint8_t flat_16[16] = {
	16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,16
};
extern const uint8_t flat_64[64] = {
	16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,
	16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,
	16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,
	16,16,16,16,16,16,16,16,16,16,16,16,16,16,16,16
};

// MaxDpbMbs per level (§A.3.1 Table A-1), pairs of (level_idc, MaxDpbMbs).
extern const int level_max_dpb_mbs[][2] = {
	{10, 396}, {11, 900}, {12, 2376}, {13, 2376}, {20, 2376}, {21, 4752},
	{22, 8100}, {30, 8100}, {31, 18000}, {32, 20480}, {40, 32768},
	{41, 32768}, {42, 34816}, {50, 110400}, {51, 184320}, {52, 184320},
	{60, 696320}, {61, 1393664}, {62, 2785280}, {0, 0}
};

void Planes::resize(int w, int h) {
	mb_w = w; mb_h = h;
	size_t n = (size_t)w * h;
	mb_flags.assign(n, 0);
	qp.assign(n * 4, 0);
	i4_modes.assign(n * 16, 0xFF);
	pred_modes.assign(n * 16, 0xFF);
	i16_modes.assign(n, 0xFF);
	i8_modes.assign(n * 4, 0xFF);
	ch_modes.assign(n, 0xFF);
	nz_y.assign(n * 16, 0);
	nz_c.assign(n * 8, 0);
	coef_y.assign(n * 16 * 16, 0);
	coef_y8.assign(n * 4 * 64, 0);
	coef_y_dc.assign(n * 16, 0);
	coef_c_dc.assign(n * 8, 0);
	coef_cb.assign(n * 4 * 16, 0);
	coef_cr.assign(n * 4 * 16, 0);
	mvs.assign(n * 16 * 4, 0);
	refslot.assign(n * 16 * 2, -1);
	pcm_y.assign(n * 256, 0);
	pcm_c.assign(n * 128, 0);
	deblock.assign(n, 0);
	deblock_ab.assign(n * 2, 0);
	wp.assign(n * 24, 0);
	wp8.assign(n * 4 * 12, 0);
	refpoc_idx.assign(n * 32, -1);
	absmvd.assign(n * 64, 0);
	cbp.assign(n, 0);
	refnz.assign(n * 4, 0);
	slice_id.assign(n, 0xFFFF);   // 0xFFFF = unclaimed (mb claim word)
	mb_errors.assign(n, 0);
	memset(sm4, 16, sizeof(sm4));
	memset(sm8, 16, sizeof(sm8));
	dirty.clear();
	dirty.reserve(4096);
	dirty_all = false;
}

void Planes::clear_frame() {
	if (dirty_all) {
		resize(mb_w, mb_h);            // full re-zero
		return;
	}
	size_t n = (size_t)mb_w * mb_h;
	memset(mb_flags.data(), 0, n * 4);
	memset(qp.data(), 0, n * 4);
	memset(i4_modes.data(), 0xFF, n * 16);
	memset(pred_modes.data(), 0xFF, n * 16);
	memset(i16_modes.data(), 0xFF, n);
	memset(i8_modes.data(), 0xFF, n * 4);
	memset(ch_modes.data(), 0xFF, n);
	memset(nz_y.data(), 0, n * 16);
	memset(nz_c.data(), 0, n * 8);
	memset(absmvd.data(), 0, n * 64);
	memset(deblock.data(), 0, n);
	memset(deblock_ab.data(), 0, n * 2);
	memset(wp.data(), 0, n * 24);
	memset(wp8.data(), 0, n * 48);
	memset(cbp.data(), 0, n);
	memset(refnz.data(), 0, n * 4);
	memset(slice_id.data(), 0xFF, n * 2);   // reset claims to 0xFFFF
	memset(mb_errors.data(), 0, n);
	memset(sm4, 16, sizeof(sm4));
	memset(sm8, 16, sizeof(sm8));
	// refslot/refpoc_idx MUST reset to -1: a B partition predicted from
	// one list only never writes the other list's cells, and a stale
	// slot index from the slot's previous occupant would leak into
	// direct-mode/deblock reads (found via 8-GOP slot-reuse streams).
	// mvs need no clear (reads are gated on refslot >= 0).
	memset(refslot.data(), 0xFF, n * 32);
	memset(refpoc_idx.data(), 0xFF, n * 32);
	for (uint64_t e : dirty) {
		size_t off = e & ((1ULL << 48) - 1);
		switch ((int)(e >> 48)) {
		case DP_COEF_Y: memset(&coef_y[off], 0, 16 * 2); break;
		case DP_COEF_Y8: memset(&coef_y8[off], 0, 64 * 2); break;
		case DP_COEF_Y_DC: memset(&coef_y_dc[off], 0, 16 * 2); break;
		case DP_COEF_C_DC: memset(&coef_c_dc[off], 0, 4 * 2); break;
		case DP_COEF_CB: memset(&coef_cb[off], 0, 16 * 2); break;
		case DP_COEF_CR: memset(&coef_cr[off], 0, 16 * 2); break;
		}
	}
	dirty.clear();
}

// Zero one mb's residual data (recover_slice discards the residuals of
// re-predicted macroblocks, edge264_headers.c:399-404).
void Planes::clear_mb_range(int mb0, int mb1) {
	int W = mb_w;
	for (int mbi = mb0; mbi < mb1; mbi++) {
		int mx = mbi % W, my = mbi / W;
		for (int by = 0; by < 4; by++)
			for (int bx = 0; bx < 4; bx++) {
				size_t c = (size_t)(my * 4 + by) * (W * 4) + mx * 4 + bx;
				nz_y[c] = 0;
				memset(&coef_y[c * 16], 0, 16 * sizeof(int16_t));
			}
		for (int by = 0; by < 2; by++)
			for (int bx = 0; bx < 2; bx++) {
				size_t c8 = (size_t)(my * 2 + by) * (W * 2) + mx * 2 + bx;
				nz_c[c8 * 2] = nz_c[c8 * 2 + 1] = 0;
				memset(&coef_y8[c8 * 64], 0, 64 * sizeof(int16_t));
				memset(&coef_cb[c8 * 16], 0, 16 * sizeof(int16_t));
				memset(&coef_cr[c8 * 16], 0, 16 * sizeof(int16_t));
			}
		size_t i = (size_t)my * W + mx;
		memset(&coef_y_dc[i * 16], 0, 16 * sizeof(int16_t));
		memset(&coef_c_dc[i * 8], 0, 8 * sizeof(int16_t));
		cbp[i] = 0;
	}
	dirty_all = true;
}

} // namespace e264t

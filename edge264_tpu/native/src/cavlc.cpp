// CAVLC residual block decoding (ISO/IEC 14496-10 §9.2).
// Tables come from cavlc_tables.inc (canonical (len,value) pairs generated
// by tools/gen_tables.py); decoding is straightforward prefix matching on
// the MSB-aligned bit cache — our own scheme, unrelated to the reference's
// shift-register LUTs (edge264_slice.c:200-290 does the same job there).
#include "e264t.h"

namespace e264t {

#include "cavlc_tables.inc"

// Match one VLC code from a canonical (len,value) table of `n` symbols.
// Returns the symbol index, consuming its bits; -1 if no code matches
// (corrupt stream; caller substitutes a safe value, error deferred to the
// rbsp verdict like the reference's clamped reads).
static int vlc_match(BitReader &gb, const int16_t *lens, const int16_t *vals,
                     int n) {
	uint32_t window = gb.peek(24);
	for (int len = 1; len <= 16; len++) {
		uint32_t prefix = window >> (24 - len);
		for (int s = 0; s < n; s++) {
			if (lens[s] == len && (uint32_t)vals[s] == prefix) {
				gb.u(len);
				return s;
			}
		}
	}
	return -1;
}

// Direct-lookup VLC decode: lut[w] = (sym+1) | len<<8 over a peeked
// window (the linear scans above were ~30% of host parse time; kept as
// the build-time reference).
template <typename L, typename V>
static void build_vlc_lut(uint16_t *lut, int win_bits, const L *lens,
                          const V *vals, int n) {
	memset(lut, 0, sizeof(uint16_t) << win_bits);
	for (int s = 0; s < n; s++) {
		int len = (int)lens[s];
		if (len <= 0 || len > win_bits)
			continue;
		uint32_t lo = (uint32_t)vals[s] << (win_bits - len);
		uint32_t hi = lo + (1u << (win_bits - len));
		for (uint32_t w = lo; w < hi; w++)
			lut[w] = (uint16_t)((s + 1) | len << 8);
	}
}

static inline int vlc_lut16(BitReader &gb, const uint16_t *lut) {
	uint16_t e = lut[gb.peek(16)];
	if (!e)
		return -1;
	gb.u(e >> 8);
	return (e & 255) - 1;
}

static inline int vlc_lut9(BitReader &gb, const uint16_t *lut) {
	uint16_t e = lut[gb.peek(9)];
	if (!e)
		return -1;
	gb.u(e >> 8);
	return (e & 255) - 1;
}

static uint16_t g_ct_lut[4][1 << 16];          // coeff_token per class
static uint16_t g_tz4_lut[15][1 << 9];         // total_zeros 4x4
static uint16_t g_tz2_lut[3][1 << 9];          // total_zeros chroma DC 2x2
static uint16_t g_rb_lut[7][1 << 9];           // run_before zl 1..7
static bool g_luts_built = [] {
	for (int c = 0; c < 4; c++)
		build_vlc_lut(g_ct_lut[c], 16, kCoeffTokenLen[c],
		              kCoeffTokenVal[c], c == 3 ? 20 : 68);
	for (int t = 0; t < 15; t++)
		build_vlc_lut(g_tz4_lut[t], 9, kTotalZeros4x4Len[t],
		              kTotalZeros4x4Val[t], 16);
	for (int t = 0; t < 3; t++)
		build_vlc_lut(g_tz2_lut[t], 9, kTotalZeros2x2Len[t],
		              kTotalZeros2x2Val[t], 4);
	for (int t = 0; t < 7; t++)
		build_vlc_lut(g_rb_lut[t], 9, kRunBeforeLen[t],
		              kRunBeforeVal[t], 8);
	return true;
}();
template <typename L, typename V>
static int vlc_match8(BitReader &gb, const L *lens, const V *vals, int n) {
	uint32_t window = gb.peek(24);
	for (int len = 1; len <= 16; len++) {
		uint32_t prefix = window >> (24 - len);
		for (int s = 0; s < n; s++) {
			if (lens[s] == len && (uint32_t)vals[s] == prefix) {
				gb.u(len);
				return s;
			}
		}
	}
	return -1;
}

// coeff_token (§9.2.1): returns TotalCoeff<<2 | TrailingOnes.
// nC selects the table class; nC>=8 is a 6-bit FLC.
int parse_coeff_token(BitReader &gb, int nC) {
	if (nC >= 8) {
		uint32_t v = gb.u(6);
		if (v == 3) return 0;             // 000011 encodes (0,0)
		return (int)v + 4;                 // TotalCoeff<<2|T1 = value+4
	}
	int cls = nC < 0 ? 3 : nC < 2 ? 0 : nC < 4 ? 1 : 2;
	int s = vlc_lut16(gb, g_ct_lut[cls]);
	return s < 0 ? 0 : s;
}

// total_zeros (§9.2.3): tables per TotalCoeff and block size.
static int parse_total_zeros(BitReader &gb, int total_coeff, int max_coeff) {
	if (max_coeff == 4) {     // chroma DC 2x2
		int s = vlc_lut9(gb, g_tz2_lut[total_coeff - 1]);
		return s < 0 ? 0 : s;
	}
	if (max_coeff == 8) {     // chroma DC 2x4 (4:2:2)
		int s = vlc_match8(gb, kTotalZeros2x4Len[total_coeff - 1],
		                   kTotalZeros2x4Val[total_coeff - 1], 8);
		return s < 0 ? 0 : s;
	}
	int s = vlc_lut9(gb, g_tz4_lut[total_coeff - 1]);
	return s < 0 ? 0 : s;
}

// run_before (§9.2.3 Table 9-10).
static int parse_run_before(BitReader &gb, int zeros_left) {
	int zl = zeros_left < 7 ? zeros_left : 7;
	if (zl == 7) {
		// open-ended part: 3 leading zeros then 000..01 extends the run
		uint32_t three = gb.peek(3);
		if (three == 0) {
			gb.u(3);
			int run = 7;
			while (run < 14 && gb.peek(1) == 0) { gb.u(1); run++; }
			if (run < 14) gb.u(1);        // consume the closing 1
			else gb.u(1);
			return run <= zeros_left ? run : zeros_left;
		}
	}
	int s = vlc_lut9(gb, g_rb_lut[zl - 1]);
	return s < 0 ? 0 : (s <= zeros_left ? s : zeros_left);
}

// Parse one residual block (§9.2.2/9.2.3/9.2.4).
// scan:    scan-order -> output index map (length max_coeff entries,
//          already offset for AC blocks).
// out:     coefficient array indexed by scan[] values.
// Returns TotalCoeff.
int parse_residual_cavlc(BitReader &gb, int nC, int max_coeff,
                         const uint8_t *scan, int16_t *out) {
	int token = parse_coeff_token(gb, nC);
	int total_coeff = token >> 2;
	int trailing_ones = token & 3;
	if (total_coeff == 0)
		return 0;

	int32_t level[16];
	int suffix_length = (total_coeff > 10 && trailing_ones < 3) ? 1 : 0;
	for (int i = 0; i < total_coeff; i++) {
		if (i < trailing_ones) {
			level[i] = gb.u1() ? -1 : 1;
			continue;
		}
		// level_prefix: leading zeros before a 1 (§9.2.2.1 caps at 25)
		int level_prefix = 0;
		while (level_prefix < 25 && gb.peek(1) == 0) { gb.u(1); level_prefix++; }
		gb.u(1);
		int suffix_size = suffix_length;
		if (level_prefix >= 15)
			suffix_size = level_prefix - 3;
		else if (level_prefix == 14 && suffix_length == 0)
			suffix_size = 4;
		int32_t code = (level_prefix < 15 ? level_prefix : 15) << suffix_length;
		if (suffix_size)
			code += gb.u(suffix_size);
		if (level_prefix >= 15 && suffix_length == 0)
			code += 15;
		if (level_prefix >= 16)
			code += (1 << (level_prefix - 3)) - 4096;
		if (i == trailing_ones && trailing_ones < 3)
			code += 2;
		level[i] = (code & 1) ? -((code + 1) >> 1) : (code + 2) >> 1;
		if (suffix_length == 0)
			suffix_length = 1;
		if (level[i] > (3 << (suffix_length - 1)) ||
		    level[i] < -(3 << (suffix_length - 1)))
			if (suffix_length < 6)
				suffix_length++;
	}

	int total_zeros = 0;
	if (total_coeff < max_coeff)
		total_zeros = parse_total_zeros(gb, total_coeff, max_coeff);

	// place levels: level[0] is the highest-frequency coefficient
	int coeff_num = total_coeff + total_zeros - 1;
	int zeros_left = total_zeros;
	for (int i = 0; i < total_coeff; i++) {
		if (coeff_num < 0 || coeff_num >= max_coeff)
			break;                         // corrupt input, deferred error
		out[scan[coeff_num]] = level[i];
		if (i + 1 < total_coeff) {
			int run = zeros_left > 0 ? parse_run_before(gb, zeros_left) : 0;
			zeros_left -= run;
			coeff_num -= run + 1;
		}
	}
	return total_coeff;
}

} // namespace e264t

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
	int nsym = cls == 3 ? 20 : 68;         // chroma DC: TotalCoeff<=4
	int s = vlc_match(gb, kCoeffTokenLen[cls], kCoeffTokenVal[cls], nsym);
	return s < 0 ? 0 : s;
}

// total_zeros (§9.2.3): tables per TotalCoeff and block size.
static int parse_total_zeros(BitReader &gb, int total_coeff, int max_coeff) {
	if (max_coeff == 4) {     // chroma DC 2x2
		int s = vlc_match8(gb, kTotalZeros2x2Len[total_coeff - 1],
		                   kTotalZeros2x2Val[total_coeff - 1], 4);
		return s < 0 ? 0 : s;
	}
	if (max_coeff == 8) {     // chroma DC 2x4 (4:2:2)
		int s = vlc_match8(gb, kTotalZeros2x4Len[total_coeff - 1],
		                   kTotalZeros2x4Val[total_coeff - 1], 8);
		return s < 0 ? 0 : s;
	}
	int s = vlc_match8(gb, kTotalZeros4x4Len[total_coeff - 1],
	                   kTotalZeros4x4Val[total_coeff - 1], 16);
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
	int s = vlc_match8(gb, kRunBeforeLen[zl - 1], kRunBeforeVal[zl - 1], 8);
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

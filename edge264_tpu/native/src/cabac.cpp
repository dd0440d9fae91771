// CABAC arithmetic decoding engine (ISO/IEC 14496-10 §9.3).
//
// Fast formulation (see the struct comment in e264t.h): codIOffset lives
// in a 64-bit register with `bits` lookahead bitstream bits appended
// below it, so renormalization is a subtraction on `bits` and a batch of
// n bypass bins is one hardware division.  The reference reaches the
// same division insight with a different register layout
// (edge264_bitstream.c:256-347); this design is our own.  The per-bin
// hot methods (decode/bypass/bypass_n/refill) are inlined in e264t.h;
// this file keeps the cold control paths.  All methods keep byte-exact
// stream positions at the sync points that matter (terminating bins
// before I_PCM / end-of-slice) by handing unused lookahead bits back to
// the BitReader.
#include "e264t.h"

namespace e264t {

extern const int8_t CTX_INIT[4][1024][2];

// packed-state transition tables (§9.3.3.2.1.1 Table 9-45 folded with the
// valMPS flip at pStateIdx 0 and the <<1|valMPS packing)
uint8_t NEXT_MPS[128];
uint8_t NEXT_LPS[128];
static const int _next_init = [] {
	for (int p = 0; p < 64; p++) {
		for (int v = 0; v < 2; v++) {
			int s = (p << 1) | v;
			NEXT_MPS[s] = (uint8_t)((TRANS_MPS[p] << 1) | v);
			NEXT_LPS[s] = (uint8_t)((TRANS_LPS[p] << 1) |
			                        (p == 0 ? v ^ 1 : v));
		}
	}
	return 0;
}();

// §9.3.1.1: state[i] = pStateIdx << 1 | valMPS
void Cabac::init_contexts(int idc, int qp) {
	for (int i = 0; i < 1024; i++) {
		int m = CTX_INIT[idc][i][0], n = CTX_INIT[idc][i][1];
		int pre = ((m * qp) >> 4) + n;
		pre = pre < 1 ? 1 : pre > 126 ? 126 : pre;
		state[i] = pre <= 63 ? (uint8_t)((63 - pre) << 1)
		                     : (uint8_t)(((pre - 64) << 1) | 1);
	}
}

// hand the unused lookahead back: the BitReader lands exactly where a
// bit-at-a-time engine would sit (required before raw reads like I_PCM
// samples, and for the deferred-overrun verdict at slice end)
void Cabac::sync() {
	gb->seek_bits(gb->consumed() - bits);
	off >>= bits;
	bits = 0;
}

// §9.3.1.2: consume cabac_alignment_one_bit up to a byte boundary, then
// initialize the arithmetic decoder.  Returns nonzero if alignment bits
// were not all ones (corrupt stream).
int Cabac::start(BitReader *r) {
	gb = r;
	int bad = 0;
	while (r->consumed() & 7)
		bad |= r->u1() ^ 1;
	codIRange = 510;
	off = r->u(9);
	bits = 0;
	refill();
	return bad;
}

// §9.3.3.2.4 (end_of_slice_flag and I_PCM's terminating bin).  On a
// terminating bin the BitReader is synced so callers can switch to raw
// bit/byte reads (pcm alignment + samples, rbsp verdict).
int Cabac::terminate() {
	codIRange -= 2;
	if (off >= (uint64_t)codIRange << bits) {
		sync();
		return 1;
	}
	if (codIRange < 256) {
		codIRange <<= 1;
		bits -= 1;
		if (bits <= 23)
			refill();
	}
	return 0;
}

// §9.3.3.2.5: after a terminating bin of value 1 the engine reads 7 more
// bits, leaving the bitstream byte-aligned (encoder's flush guarantees it).
void Cabac::flush() {
	sync();
	off = (off << 7) | gb->u(7);
}

} // namespace e264t

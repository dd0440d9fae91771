// CABAC arithmetic decoding engine (ISO/IEC 14496-10 §9.3).
// Plain bit-at-a-time renormalization over the BitReader; reads past the
// RBSP feed zeros and set the deferred-error flag (same contract as the
// Exp-Golomb readers).  The reference achieves the same semantics with
// full-register caches and division-based bypass batching
// (edge264_bitstream.c:256-347); that optimization can land later behind
// this interface without touching the syntax layer.
#include "e264t.h"

namespace e264t {

extern const int8_t CTX_INIT[4][1024][2];
extern const uint8_t RANGE_LPS[64][4];
extern const uint8_t TRANS_MPS[64];
extern const uint8_t TRANS_LPS[64];

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

// §9.3.1.2: consume cabac_alignment_one_bit up to a byte boundary, then
// initialize the arithmetic decoder.  Returns nonzero if alignment bits
// were not all ones (corrupt stream).
int Cabac::start(BitReader *r) {
	gb = r;
	int bad = 0;
	while (r->consumed() & 7)
		bad |= r->u1() ^ 1;
	codIRange = 510;
	codIOffset = r->u(9);
	return bad;
}

// §9.3.3.2.1
int Cabac::decode(int ctxIdx) {
	int s = state[ctxIdx];
	int p = s >> 1, v = s & 1;
	uint32_t rlps = RANGE_LPS[p][(codIRange >> 6) & 3];
	codIRange -= rlps;
	int bin;
	if (codIOffset >= codIRange) {
		codIOffset -= codIRange;
		codIRange = rlps;
		bin = v ^ 1;
		state[ctxIdx] = (uint8_t)((TRANS_LPS[p] << 1) | (p == 0 ? v ^ 1 : v));
	} else {
		bin = v;
		state[ctxIdx] = (uint8_t)((TRANS_MPS[p] << 1) | v);
	}
	while (codIRange < 256) {
		codIRange <<= 1;
		codIOffset = (codIOffset << 1) | (uint32_t)gb->u1();
	}
	return bin;
}

// §9.3.3.2.3
int Cabac::bypass() {
	codIOffset = (codIOffset << 1) | (uint32_t)gb->u1();
	if (codIOffset >= codIRange) {
		codIOffset -= codIRange;
		return 1;
	}
	return 0;
}

uint32_t Cabac::bypass_n(int n) {
	uint32_t v = 0;
	while (n-- > 0)
		v = (v << 1) | (uint32_t)bypass();
	return v;
}

// §9.3.3.2.4 (end_of_slice_flag and I_PCM's terminating bin)
int Cabac::terminate() {
	codIRange -= 2;
	if (codIOffset >= codIRange)
		return 1;
	while (codIRange < 256) {
		codIRange <<= 1;
		codIOffset = (codIOffset << 1) | (uint32_t)gb->u1();
	}
	return 0;
}

// §9.3.3.2.5: after a terminating bin of value 1 the engine reads 7 more
// bits, leaving the bitstream byte-aligned (encoder's flush guarantees it).
void Cabac::flush() {
	codIOffset = (codIOffset << 7) | gb->u(7);
}

} // namespace e264t

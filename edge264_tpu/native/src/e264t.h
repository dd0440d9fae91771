// e264t — host-side H.264 syntax front end for the edge264_tpu decoder.
//
// This C++ library implements everything *bit-serial* in H.264 decoding:
// NAL unescaping, Exp-Golomb/CAVLC/CABAC entropy decoding, SPS/PPS/slice
// headers, POC, DPB bookkeeping, reference list construction, mb-layer
// syntax and motion-vector prediction.  It emits dense per-frame "syntax
// planes" (coefficients, modes, motion vectors, flags) that the JAX/Pallas
// back end consumes as batched tensors.  No pixel math happens here.
//
// Capability target mirrors tvlabs/edge264 (see SURVEY.md §2): Progressive
// High + MVC Stereo High, CAVLC+CABAC, I/P/B, 8x8 transforms, scaling
// matrices, 4:2:0 8-bit.  Behavioral contracts (errno codes, DPB bumping,
// clamped reads with deferred error checks) follow the reference, e.g.
// edge264_headers.c:953-1288 for the slice-header path.
#pragma once

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

#include <time.h>

namespace e264t {

// Process-CPU-relative microsecond clock for per-slice timing logs
// (the reference's get_relative_time_us, edge264_internal.h:1241-1252).
inline int64_t relative_time_us() {
	struct timespec t;
#ifdef CLOCK_PROCESS_CPUTIME_ID
	clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &t);
#else
	clock_gettime(CLOCK_MONOTONIC, &t);
#endif
	return (int64_t)t.tv_sec * 1000000 + t.tv_nsec / 1000;
}

// ---------------------------------------------------------------------------
// errno-style results (match reference contract, README.md:188-196)
enum { OK = 0 };
#define E264T_ENOTSUP 95
#define E264T_EBADMSG 74
#define E264T_ENOBUFS 105
#define E264T_ENODATA 61

// ---------------------------------------------------------------------------
// Bit reader over an unescaped RBSP buffer.  MSB-first 64-bit cache.
// Reads past the end feed zero bits and set `over`; errors are deferred to
// the rbsp_finished() verdict, mirroring the reference's "deferred error
// checking" design (edge264_internal.h:1168-1174).
struct BitReader {
	const uint8_t *buf = nullptr;
	size_t size = 0;      // bytes
	size_t pos = 0;       // next byte to load into cache
	uint64_t cache = 0;   // top `cnt` bits valid, MSB-aligned
	int cnt = 0;
	bool over = false;    // consumed bits beyond the RBSP

	void init(const uint8_t *b, size_t n) {
		buf = b; size = n; pos = 0; cache = 0; cnt = 0; over = false;
		refill();
	}
	void refill() {
		if (cnt >= 0 && pos + 8 <= size) {   // bulk: one 8-byte load
			uint64_t w;
			memcpy(&w, buf + pos, 8);
			w = __builtin_bswap64(w);
			int take = (63 - cnt) >> 3;      // whole bytes that fit
			if (take > 0) {
				w = (w >> (64 - 8 * take)) << (64 - 8 * take);
				cache |= w >> cnt;
				cnt += 8 * take;
				pos += (size_t)take;
			}
			return;
		}
		while (cnt <= 56) {
			uint64_t byte = pos < size ? buf[pos] : 0;
			if (pos >= size && cnt < 0) over = true;
			pos++;
			cache |= byte << (56 - cnt);
			cnt += 8;
		}
	}
	// total bits consumed so far
	int64_t consumed() const { return (int64_t)pos * 8 - cnt; }
	int64_t remaining_bits() const { return (int64_t)size * 8 - consumed(); }
	uint32_t u(int n) {           // read n bits (0..32)
		if (n == 0) return 0;
		uint32_t v = (uint32_t)(cache >> (64 - n));
		cache <<= n;
		cnt -= n;
		if (cnt <= 32) refill();
		return v;
	}
	uint32_t peek(int n) const { return n ? (uint32_t)(cache >> (64 - n)) : 0; }
	int u1() { return (int)u(1); }
	int clz_cache() const {       // leading zeros of the cache (capped 32)
		uint64_t c = cache | 1;   // avoid clz(0)
		int z = __builtin_clzll(c);
		return z > 32 ? 32 : z;
	}
	// Exp-Golomb, clamped to [0,upper] like the reference's get_ue16/32
	// (edge264_bitstream.c:127-165): the clamp keeps parser state sane on
	// corrupt input; the error verdict comes from rbsp_finished().
	uint32_t ue(uint32_t upper = 0xffffffffu) {
		int k = clz_cache();
		uint64_t v;
		if (k <= 15) {
			v = (cache >> (63 - 2 * k)) - 1;
			cache <<= 2 * k + 1;
			cnt -= 2 * k + 1;
			if (cnt <= 32) refill();
		} else {                   // long codes, read in two steps
			u(k);
			uint32_t low = u(k + 1 <= 32 ? k + 1 : 32);
			v = (uint64_t)low - 1;
		}
		return v > upper ? upper : (uint32_t)v;
	}
	int32_t se(int32_t lower, int32_t upper) {
		uint32_t c = ue();
		int32_t v = (c & 1) ? (int32_t)((c + 1) >> 1) : -(int32_t)(c >> 1);
		return v < lower ? lower : v > upper ? upper : v;
	}
	bool byte_aligned() const { return (consumed() & 7) == 0; }
	// more_rbsp_data(): true if there are RBSP bits beyond the stop bit
	bool more_rbsp() const {
		int64_t c = consumed();
		int64_t total = (int64_t)size * 8;
		if (c >= total) return false;
		// locate last set bit of the buffer (the rbsp_stop_one_bit)
		int64_t last = total - 1;
		while (last >= 0 && !(buf[last >> 3] >> (7 - (last & 7)) & 1)) last--;
		return c < last;
	}
	// verdict at NAL end: all bits consumed up to the stop bit, no overrun
	bool rbsp_finished() const {
		if (over) return false;
		int64_t c = consumed();
		int64_t total = (int64_t)size * 8;
		if (c > total) return false;
		int64_t last = total - 1;
		while (last >= 0 && !(buf[last >> 3] >> (7 - (last & 7)) & 1)) last--;
		return c == last;   // next unread bit is exactly the stop bit
	}
	// reposition to an absolute consumed-bit count (the CABAC engine uses
	// this to hand unused lookahead bits back before raw-byte reads)
	void seek_bits(int64_t c) {
		pos = (size_t)(c >> 3);
		cache = 0; cnt = 0;
		over = c > (int64_t)size * 8;
		refill();
		if (c & 7) u((int)(c & 7));
	}
};

// ---------------------------------------------------------------------------
// Parameter sets (fields per ISO/IEC 14496-10 §7.3.2; capability subset as
// in the reference's Edge264SeqParameterSet, edge264_internal.h:160-215)
struct SPS {
	uint8_t valid = 0;
	uint8_t profile_idc = 0;
	uint8_t level_idc = 0;
	uint8_t chroma_format_idc = 1;
	uint8_t bit_depth_luma = 8, bit_depth_chroma = 8;
	uint8_t qpprime_y_zero_transform_bypass = 0;
	int log2_max_frame_num = 4;
	int pic_order_cnt_type = 0;
	int log2_max_poc_lsb = 4;            // poc type 0
	uint8_t delta_pic_order_always_zero = 0; // poc type 1
	int32_t offset_for_non_ref_pic = 0;
	int32_t offset_for_top_to_bottom = 0;
	int num_ref_frames_in_poc_cycle = 0;
	int32_t poc_cycle_sum = 0;           // sum of offset_for_ref_frame
	int32_t offset_for_ref_frames[256] = {0};
	int max_num_ref_frames = 0;
	uint8_t gaps_allowed = 0;
	int mb_width = 0, mb_height = 0;     // PicWidthInMbs, FrameHeightInMbs
	uint8_t frame_mbs_only = 1;
	uint8_t direct_8x8_inference = 1;
	int crop_left = 0, crop_right = 0, crop_top = 0, crop_bottom = 0; // samples
	int max_dec_frame_buffering = 16;
	int max_num_reorder_frames = 16;
	uint8_t seq_scaling_matrix_present = 0;
	uint8_t weightScale4x4[6][16];       // raster order
	uint8_t weightScale8x8[6][64];
	uint8_t mvc = 0;                     // is subset-SPS with 2 views
	int DpbMaxFrames = 16;               // from level MaxDpbMbs
	// VUI/HRD fields retained for SEI interpretation (reference analog:
	// Edge264SeqParameterSet HRD members used by edge264_sei.c:1-84)
	uint8_t nal_hrd_cpb_cnt = 0, vcl_hrd_cpb_cnt = 0;
	uint8_t initial_cpb_removal_delay_length = 24;
	uint8_t cpb_removal_delay_length = 24;
	uint8_t dpb_output_delay_length = 24;
	uint8_t time_offset_length = 24;
	uint8_t pic_struct_present = 0;
	uint32_t num_units_in_tick = 0, time_scale = 0;
};

struct PPS {
	uint8_t valid = 0;
	int sps_id = 0;
	uint8_t entropy_coding_mode = 0;
	uint8_t bottom_field_pic_order_in_frame_present = 0;
	int num_ref_idx_active[2] = {1, 1};
	uint8_t weighted_pred_flag = 0;
	uint8_t weighted_bipred_idc = 0;
	int pic_init_qp = 26;
	int chroma_qp_index_offset = 0;
	int second_chroma_qp_index_offset = 0;
	uint8_t deblocking_filter_control_present = 0;
	uint8_t constrained_intra_pred = 0;
	uint8_t redundant_pic_cnt_present = 0;
	uint8_t transform_8x8_mode = 0;
	uint8_t pic_scaling_matrix_present = 0;
	uint8_t weightScale4x4[6][16];
	uint8_t weightScale8x8[6][64];
};

// ---------------------------------------------------------------------------
// Per-frame syntax planes.  All arrays raster-ordered; block grids:
// luma 4x4 grid  [mbH*4][mbW*4], chroma 4x4 grid [mbH*2][mbW*2].
// Coefficients are raw parsed levels, un-zigzagged to raster positions;
// the device does all scaling/transform math.
struct Planes {
	int mb_w = 0, mb_h = 0;
	std::vector<int32_t> mb_flags;    // [mbH*mbW]        MBF_* bits
	std::vector<int8_t>  qp;          // [mbH*mbW*4]      qpY,qpCb,qpCr,pad
	std::vector<uint8_t> i4_modes;    // [mbH*4*mbW*4]    mode|avail<<4; 0xFF none
	std::vector<uint8_t> i16_modes;   // [mbH*mbW]        mode|avail<<4; 0xFF none
	std::vector<uint8_t> i8_modes;    // [mbH*2*mbW*2]    8x8 intra; 0xFF none
	std::vector<uint8_t> ch_modes;    // [mbH*mbW]        mode|avail<<4
	std::vector<uint8_t> nz_y;        // [mbH*4*mbW*4]    luma total_coeff (or cbf)
	std::vector<uint8_t> nz_c;        // [mbH*2*mbW*2*2]  cb,cr interleaved last
	std::vector<int16_t> coef_y;      // [mbH*4*mbW*4*16] 4x4 luma levels (AC for I16)
	std::vector<int16_t> coef_y8;     // [mbH*2*mbW*2*64] 8x8 luma levels
	std::vector<int16_t> coef_y_dc;   // [mbH*mbW*16]     I16 luma DC
	std::vector<int16_t> coef_c_dc;   // [mbH*mbW*8]      chroma DC, cb 4 + cr 4
	std::vector<int16_t> coef_cb;     // [mbH*2*mbW*2*16]
	std::vector<int16_t> coef_cr;     // [mbH*2*mbW*2*16]
	std::vector<int16_t> mvs;         // [mbH*4*mbW*4*2*2] per 4x4, list, x/y
	std::vector<int8_t>  refslot;     // [mbH*4*mbW*4*2]  DPB slot per list, -1
	std::vector<uint8_t> pcm_y;       // [mbH*16*mbW*16]
	std::vector<uint8_t> pcm_c;       // [2*mbH*8*mbW*8]
	std::vector<uint8_t> deblock;     // [mbH*mbW]        DBF_* bits
	std::vector<int8_t>  deblock_ab;  // [mbH*mbW*2]      alpha/beta offsets
	std::vector<int8_t>  wp;          // [mbH*mbW*24]     [0]=mode,[1]=lumaLogWD,[2]=chromaLogWD
	std::vector<int8_t>  wp8;         // [mbH*2*mbW*2*2*3*2] per 8x8,list,comp: w,o
	std::vector<int8_t>  refpoc_idx;  // [mbH*4*mbW*4*2]  refIdx per cell (internal)
	std::vector<uint8_t> absmvd;      // [mbH*4*mbW*4*2*2] |mvd| per cell,list,comp
	                                  // clamped to 127 (CABAC mvd contexts)
	std::vector<uint8_t> cbp;         // [mbH*mbW] luma bits 0-3 | chroma<<4 (0/1/2)
	std::vector<uint8_t> refnz;       // [mbH*2*mbW*2] per-8x8: bit l set if that
	                                  // list's refIdx was parsed nonzero (CABAC ref ctx)
	std::vector<uint16_t> slice_id;   // [mbH*mbW]        slice index within frame
	std::vector<uint8_t> mb_errors;   // [mbH*mbW] concealment confidence (%)
	std::vector<uint8_t> pred_modes;  // [mbH*4*mbW*4] PARSED IntraNxN mode
	                                  // per 4x4 (0xFF none): §8.3.1.1 mode
	                                  // prediction reads these, while
	                                  // i4_modes/i8_modes carry the
	                                  // RESOLVED kernel enum (corrupt-mode
	                                  // fallback to no-neighbour DC, like
	                                  // the reference's Intra4x4Modes
	                                  // tables, edge264_slice.c:573-594)
	uint8_t sm4[6][16];               // resolved weightScale4x4 (last slice)
	uint8_t sm8[2][64];               // resolved 8x8 intra/inter lists

	// dirty-block bookkeeping: the big sparse coefficient planes are
	// cleared lazily -- only blocks written by the slot's PREVIOUS frame
	// are re-zeroed at frame start (a full 12MB memset per 1080p frame
	// was 50% of host parse time).  pcm planes need no clearing at all:
	// the device masks them by MBF_IPCM.
	enum { DP_COEF_Y, DP_COEF_Y8, DP_COEF_Y_DC, DP_COEF_C_DC,
	       DP_COEF_CB, DP_COEF_CR };
	std::vector<uint64_t> dirty;
	bool dirty_all = true;
	void mark(int id, size_t off) {
		dirty.push_back((uint64_t)id << 48 | off);
	}

	// arena-pack scratch (pack.cpp): per-tag sorted unique coded rows
	// and split-mb exception lists, filled by e264t_pack_probe and
	// consumed by e264t_pack_row.  Probe+pack run with the GIL released,
	// which keeps the Python main thread from starving the D2H fetcher.
	std::vector<int32_t> pack_rows[6];
	std::vector<int32_t> pack_exc[2];    // 0 = mvs, 1 = refslot
	bool pack_valid = false, pack_exc_valid = false;
	void resize(int w, int h);
	void clear_frame();
	void clear_mb_range(int mb0, int mb1);
};

// Corrupt-stream intra-mode fallback (§8.3 forbids signalling a mode
// whose needed neighbour is unavailable; the reference renders plain DC
// under the ACTUAL availability then — Intra16x16Modes/IntraChromaModes,
// edge264_slice.c:720-725, 874-877).  avail_bits: A<<4 | B<<5.
static inline int resolve_i16_mode(int mode, int avail_bits) {
	bool aA = avail_bits & 0x10, aB = avail_bits & 0x20;
	if ((mode == 0 && !aB) || (mode == 1 && !aA) ||
	    (mode == 3 && !(aA && aB)))
		return 2;
	return mode;
}
static inline int resolve_chroma_mode(int mode, int avail_bits) {
	bool aA = avail_bits & 0x10, aB = avail_bits & 0x20;
	if ((mode == 1 && !aA) || (mode == 2 && !aB) ||
	    (mode == 3 && !(aA && aB)))
		return 0;
	return mode;
}

// mb_flags bits
enum {
	MBF_INTRA    = 1 << 0,
	MBF_I16x16   = 1 << 1,
	MBF_IPCM     = 1 << 2,
	MBF_T8x8     = 1 << 3,
	MBF_SKIP     = 1 << 4,
	MBF_PARSED   = 1 << 5,   // availability marker during parse
	MBF_INTER    = 1 << 6,
	MBF_DIRECT   = 1 << 7,   // B_Skip / B_Direct_16x16 (CABAC mb_type ctx)
	MBF_BLEND    = 1 << 8,   // erroneous I mb: blend toward neighbour DC
	                         // with weight mb_errors*128/100 (recover_slice
	                         // I path, edge264_headers.c:316-396)
};
// deblock plane bits
enum {
	DBF_LEFT     = 1 << 0,   // filter the left mb edge
	DBF_TOP      = 1 << 1,   // filter the top mb edge
	DBF_INNER    = 1 << 2,   // filter internal edges
};

struct Event {
	int32_t kind;
	int32_t slot;
	int32_t a, b, c, d;
};
enum {
	EV_FORMAT = 1,    // a=mb_w, b=mb_h, c=num_slots, d=chroma_format
	EV_FRAME_START,   // a=frame_id, b=poc, c=is_idr
	EV_SLICE_DONE,    // a=first_mb, b=mb_count, c=slice_type, d=err
	EV_FRAME_DONE,    // frame `slot` fully parsed: device step can run
	EV_OUTPUT,        // output frame in `slot` (a=frame_id, b=non_base_slot|-1)
	EV_UNPIN,         // device may free/reuse slot's sample planes
};

struct SliceHeader {
	int slice_type = 0;          // 0 P, 1 B, 2 I (mod 5)
	int first_mb = 0;
	int pps_id = 0;
	int frame_num = 0;
	int idr_pic_id = 0;
	bool is_idr = false;
	bool is_ref = false;
	int qp = 26;
	int num_ref_idx[2] = {0, 0};
	int disable_deblocking_filter_idc = 0;
	int alpha_c0_offset = 0, beta_offset = 0;
	int cabac_init_idc = 0;
	bool sp_for_switch = false;
	bool direct_spatial = false;
	// derived
	int poc = 0, poc_bottom = 0;
	int8_t RefPicList[2][32];    // DPB slot per ref idx
	int num_refs[2] = {0, 0};
	// weighted prediction (§8.4.2.3): resolved weighted_bipred_idc and
	// explicit weights/offsets per list x refIdx x {Y,Cb,Cr}
	int weighted_bipred_idc = 0;
	int luma_log2_weight_denom = 0, chroma_log2_weight_denom = 0;
	int16_t weights[2][32][3] = {{{0}}};
	int16_t offsets[2][32][3] = {{{0}}};
};

struct Decoder;

// CABAC tables (cabac_tables.cpp; ISO/IEC 14496-10 Tables 9-44/9-45)
extern const uint8_t RANGE_LPS[64][4];
extern const uint8_t TRANS_MPS[64];
extern const uint8_t TRANS_LPS[64];
// packed-state transitions (derived in cabac.cpp from Table 9-45):
// NEXT_x[pStateIdx<<1|valMPS] -> next packed state
extern uint8_t NEXT_MPS[128];
extern uint8_t NEXT_LPS[128];

// shared inter helpers (mb_inter.cpp), used by both entropy layers

// CABAC engine state (ISO 9.3; layout of our own design).
//
// Throughput-oriented formulation: codIOffset is kept in a 64-bit
// register `off` with `bits` lookahead bitstream bits appended below it
// (off = codIOffset << bits | next_bits).  Renormalization then never
// touches the bitstream — it just decrements `bits` — and a batch of n
// bypass bins is ONE hardware division: the quotient of off by
// (codIRange << (bits - n)) is exactly the n bin values and the
// remainder the new offset.  (The reference reaches the same division
// insight with a different register layout, edge264_bitstream.c:282.)
struct Cabac {
	uint32_t codIRange = 0;   // 9-bit range, in [256, 511] after renorm
	uint64_t off = 0;         // codIOffset << bits | lookahead bits
	int bits = 0;             // lookahead bit count (0..55)
	BitReader *gb = nullptr;
	uint8_t state[1024];  // pStateIdx<<1 | valMPS
	void init_contexts(int idc, int qp);
	int start(BitReader *r);     // align + read 9 bits
	void sync();                 // push unused lookahead back into gb
	int terminate();
	void flush();                // §9.3.3.2.5 DecodeFlush (7 bits)

	// hot path inlined (~2M context bins per 1080p frame):
	// keep bits in (23, 39] so any op (renorm <= 7, bypass chunk <= 24)
	// stays non-negative and off < 2^10 << 39 never overflows
	inline void refill() {
		while (bits <= 23) {
			off = (off << 16) | gb->u(16);
			bits += 16;
		}
	}
	// §9.3.3.2.1 with multi-bit renormalization.  NEXT_MPS/NEXT_LPS are
	// precomputed over the packed state (pStateIdx<<1|valMPS), folding
	// the transIdx lookup, the valMPS flip at pStateIdx 0, and the
	// repacking into one byte load each.  The MPS-no-renorm case (the
	// common one) skips the clz/shift entirely.
	inline int decode(int ctxIdx) {
		int s = state[ctxIdx];
		uint32_t rlps = RANGE_LPS[s >> 1][(codIRange >> 6) & 3];
		codIRange -= rlps;
		uint64_t rs = (uint64_t)codIRange << bits;
		int bin;
		if (off >= rs) {
			off -= rs;
			codIRange = rlps;
			bin = (s & 1) ^ 1;
			state[ctxIdx] = NEXT_LPS[s];
			// LPS renorm: rlps in [2, 240] -> k in [1, 7]
			int k = 8 - (31 - __builtin_clz(codIRange));
			codIRange <<= k;
			bits -= k;
			if (bits <= 23)
				refill();
		} else {
			bin = s & 1;
			state[ctxIdx] = NEXT_MPS[s];
			if (codIRange < 256) {   // rare: rlps can reach 240
				int k = 8 - (31 - __builtin_clz(codIRange));
				codIRange <<= k;
				bits -= k;
				if (bits <= 23)
					refill();
			}
		}
		return bin;
	}
	// §9.3.3.2.3
	inline int bypass() {
		bits -= 1;
		uint64_t rs = (uint64_t)codIRange << bits;
		int bin = off >= rs;
		if (bin)
			off -= rs;
		if (bits <= 23)
			refill();
		return bin;
	}
	// batch of n bypass bins by ONE hardware division per <=24 bits:
	// off < codIRange << bits, so the quotient of off by
	// (codIRange << (bits-k)) is exactly the next k bin values and the
	// remainder the new offset
	inline uint32_t bypass_n(int n) {
		uint32_t v = 0;
		while (n > 0) {
			int k = n < 24 ? n : 24;  // bits >= 24 by the refill invariant
			bits -= k;
			uint64_t div = (uint64_t)codIRange << bits;
			uint64_t q = off / div;
			off -= q * div;
			v = (v << k) | (uint32_t)q;
			n -= k;
			if (bits <= 23)
				refill();
		}
		return v;
	}
};

// ---------------------------------------------------------------------------
// Task: immutable snapshot of everything the slice-data (macroblock) parse
// needs, decoupled from the Decoder so slices of DIFFERENT frames can parse
// concurrently on worker threads (the reference's Edge264Task,
// edge264_internal.h:219-261 + initialize_task edge264_headers.c:895-945).
// Member names intentionally mirror Decoder's so the mb layer reads the
// same either way.
struct Decoder;

struct Task {
	std::vector<uint8_t> rbsp;   // owned unescaped slice NAL payload
	BitReader gb;                // positioned after the slice header
	Cabac cab;
	SliceHeader sh;
	PPS pps_storage;
	const PPS *cpps = nullptr;
	SPS sps;
	int curr = -1;               // target DPB slot
	int32_t Poc[2][32];          // POC snapshot (temporal direct scaling)
	uint32_t curr_st = 0, curr_lt = 0;
	Planes *planes = nullptr;    // decoder's slot array (slot-disjoint writes)
	int32_t *remaining_mbs = nullptr;
	int mb_qp_delta_nz = 0;
	uint16_t slice_idx = 0;      // value written to the slice_id plane
	Decoder *logdec = nullptr;   // non-null only in synchronous mode
	bool log_mbs = false;
	// async scheduling state
	int dep_slot = -1;           // colocated slot this task waits on (B direct)
	int err = 0;
	// dirty-block records buffered task-locally: slices of ONE frame may
	// parse concurrently (disjoint mb ranges), so the shared
	// Planes::dirty vector is only merged under the pool mutex at task
	// completion
	std::vector<uint64_t> dirty_local;
	void mark(int id, size_t off) {
		dirty_local.push_back((uint64_t)id << 48 | off);
	}

	int run();                   // dispatch by entropy mode; returns errno
	int parse_slice_data_cavlc();
	int parse_slice_data_cabac();
	struct MbCtx;
	int parse_I_mb(MbCtx &m, int mb_type);
	int parse_P_mb(MbCtx &m, int &skip_run);
	int parse_B_mb(MbCtx &m, int &skip_flag);
	void parse_residuals(MbCtx &m, int cbp, bool is16);
	void set_mb_qp(MbCtx &m);
	int parse_I_mb_cabac(MbCtx &m, int ctx_base);
	int parse_P_mb_cabac(MbCtx &m);
	int parse_B_mb_cabac(MbCtx &m);
	void parse_residuals_cabac(MbCtx &m, int cbp, bool is16);
	int parse_chroma_mode_cabac(MbCtx &m);
	void recover_slice(MbCtx &m, int end_mb);
	void log_pcm_samples(MbCtx &m);   // reference schema edge264_slice.c:908
	template <typename... A> inline void logf(const char *fmt, A... a);
};

// Per-slice macroblock parse context (shared by the CAVLC/CABAC mb layers
// and the inter parser).
struct Task::MbCtx {
	Task &d;
	Planes &pl;
	int mbW, mbH;
	int mx = 0, my = 0;          // current mb coordinates
	size_t mbi = 0;              // my*mbW + mx
	uint16_t slice_id;
	int qp;                      // running SliceQPY
	bool availA = false, availB = false, availC = false, availD = false;
	uint32_t written = 0;        // 4x4 cells of the current mb with final mvs

	MbCtx(Task &t) : d(t), pl(t.planes[t.curr]),
		mbW(t.sps.mb_width), mbH(t.sps.mb_height),
		slice_id(t.slice_idx), qp(t.sh.qp) {}

	// Neighbour availability = same-slice membership via the slice_id
	// plane (§6.4.8-9): cross-slice mbs are never available, so the only
	// cross-THREAD reads when slices of one frame parse concurrently are
	// these claim words (relaxed atomics; any value != our id, stale or
	// torn, correctly reads as unavailable).
	static uint16_t ld16(const uint16_t &v) {
		return __atomic_load_n(&v, __ATOMIC_RELAXED);
	}

	void set_addr(int addr) {
		mx = addr % mbW;
		my = addr / mbW;
		mbi = (size_t)my * mbW + mx;
		written = 0;
		availA = mx > 0 && ld16(pl.slice_id[mbi - 1]) == slice_id;
		availB = my > 0 && ld16(pl.slice_id[mbi - mbW]) == slice_id;
		availC = my > 0 && mx + 1 < mbW &&
			ld16(pl.slice_id[mbi - mbW + 1]) == slice_id;
		availD = my > 0 && mx > 0 &&
			ld16(pl.slice_id[mbi - mbW - 1]) == slice_id;
	}

	// Atomically claim the current mb for this slice (the reference's
	// recovery_bits claim / duplicate-slice guard, edge264_slice.c:
	// 1686-1688): slices of one frame parse CONCURRENTLY into disjoint
	// mb ranges; losing a claim means duplicate coverage (an overrunning
	// erroneous slice or a redundant slice) -- the loser aborts with
	// EBADMSG and its parsed span goes to error recovery.
	bool claim_mb() {
		uint16_t expect = 0xFFFF;
		return __atomic_compare_exchange_n(&pl.slice_id[mbi], &expect,
		                                   slice_id, false,
		                                   __ATOMIC_ACQ_REL,
		                                   __ATOMIC_ACQUIRE);
	}

	// ---- luma 4x4 block helpers (block index 0..15, quad order) --------
	int gbx(int i) const;
	int gby(int i) const;
	size_t gblk(int i) const;
	bool blkA_avail(int i) const;
	bool blkB_avail(int i) const;
	bool blkC_avail(int i) const;
	bool blkD_avail(int i) const;
	int nC_luma(int i) const;
	int nC_chroma(int comp, int cx, int cy) const;
	int neighbor_mode_A(int i) const;
	int neighbor_mode_B(int i) const;

	// ---- inter helpers (mb_inter.cpp) ----------------------------------
	struct NbMv { int avail; int ref; int mvx, mvy; };
	NbMv fetch_mv(int gx, int gy, int list) const;
	void mvp_median(int list, int refIdx, int x4, int y4, int w4, int h4,
	                int shape, int *mvpx, int *mvpy) const;
	void store_mv(int list, int x4, int y4, int w4, int h4, int refIdx,
	              int slot, int mvx, int mvy);
};

// ---------------------------------------------------------------------------
// Decoder: whole-stream state machine.
struct Decoder {
	SPS sps;                 // active sequence parameter set
	SPS ssps;                // MVC subset SPS
	PPS pps[4];              // reference keeps 4 slots (edge264_headers.c:1421)
	std::vector<uint8_t> rbsp;   // unescape scratch
	BitReader gb;
	Task stask;              // synchronous-mode task storage

	// DPB bookkeeping: bitmask-per-state SoA with the same state machine as
	// the reference (design comment edge264_internal.h:355-386): committed_*
	// hold the reference state before the current frame; curr_* the state
	// that commits when the current frame completes (mmco staging).
	static const int MAX_SLOTS = 32;
	Planes planes[MAX_SLOTS];
	uint32_t committed_st = 0, committed_lt = 0;  // (1,1) = non-existing
	uint32_t curr_st = 0, curr_lt = 0;
	uint32_t to_get = 0;         // owned for output (not yet returned)
	uint32_t outputq = 0;        // bumped into the output FIFO
	uint32_t non_base = 0;       // MVC non-base-view frames
	int32_t FrameNums[MAX_SLOTS] = {0};
	int32_t FrameIds[MAX_SLOTS] = {0};
	int32_t Poc[2][MAX_SLOTS] = {{0}};   // top/bottom field order counts
	int8_t committed_lti[MAX_SLOTS];     // LongTermFrameIdx
	int8_t curr_lti[MAX_SLOTS];
	int8_t output_fifo[2][MAX_SLOTS + 1]; // -1-terminated, oldest last
	int32_t remaining_mbs[MAX_SLOTS] = {0};
	uint8_t complete[MAX_SLOTS] = {0};   // fully parsed (device step issued)
	uint16_t slice_count[MAX_SLOTS] = {0};

	int curr = -1;               // slot being decoded, -1 none
	int base_slot = -1;          // MVC: base-view frame of current AU
	int IdrPicFlag = 0;
	int32_t prev_frame_id = 0;
	int32_t FrameNum = 0;        // unwrapped, current frame
	int32_t PrevRefFrameNum[2] = {-1, -1};
	int32_t prevPicOrderCnt[2] = {0, 0};
	int32_t TopFOC = 0, BottomFOC = 0;
	int32_t last_idr_pic_id = -1;
	int32_t last_delta_poc0 = 0;
	int max_output_latency = 16; // reference default (edge264.c:151)

	// current slice context
	SliceHeader sh;
	const PPS *cpps = nullptr;
	int nal_ref_idc = 0, nal_unit_type = 0;
	int mvc_non_idr = 0;         // from the NAL-20 header extension
	uint32_t pinned = 0;         // slots whose samples the device must keep

	std::vector<Event> events;
	// log callback (YAML trace, reference-compatible field names)
	void (*log_cb)(const char *, void *) = nullptr;
	void *log_arg = nullptr;
	bool log_mbs = false;
	std::vector<char> logbuf;

	// ---- frame-task worker pool (the reference's thread pool analog:
	// worker_loop edge264_headers.c:450-603; slices of DIFFERENT frames
	// parse concurrently, B tasks gated on their colocated frame like
	// task_dependencies vs ready_frames, edge264_internal.h:1211-1226) ----
	// Bookkeeping for one in-flight frame (slot occupancy generation).
	struct FrameInflight {
		int slot = -1;
		int32_t frame_id = -1;
		int tasks_pending = 0;   // queued + running tasks
		bool sealed = false;     // finish_frame ran; no more slices coming
		bool finalized = false;  // all tasks done (+ concealment applied)
		// union of DPB slots any of this frame's slices reference: these
		// must stay PINNED (device/host pixel stores alive) until the
		// frame retires, or a worker still parsing could emit a
		// FRAME_DONE whose references were already unpinned by the main
		// thread's DPB bookkeeping (e.g. across an IDR)
		uint32_t dep_slots = 0;
		// seal-time snapshot for deferred concealment
		int conceal_qp = 26, conceal_cqpo = 0, conceal_cqpo2 = 0;
		int conceal_ref = -1;
		int32_t is_ref = 0;       // captured at seal time
		std::vector<Event> done_events;   // SLICE_DONE in slice order
	};
	int n_threads = 0;           // 0 = synchronous (deterministic reference)
	std::vector<std::thread> workers;
	std::mutex mu;
	std::condition_variable cv_ready;   // a task may have become runnable
	std::condition_variable cv_done;    // a frame finalized / retired
	std::deque<Task *> task_queue;      // not yet claimed by a worker
	std::vector<Task *> task_free;      // recycled task objects
	std::deque<FrameInflight> inflight; // frame instances in start order
	uint32_t entropy_done = 0;          // slots fully parsed + concealed
	bool stop_pool = false;
	bool async() const { return n_threads > 0 && log_cb == nullptr; }
	void set_threads(int n);            // 0 sync; <0 = hw concurrency, cap 16
	void worker_loop();
	void enqueue_task();                // snapshot current slice + queue it
	void task_finished(Task *t);        // under mu
	void maybe_finalize(FrameInflight &fi);  // under mu
	void retire_frames();               // under mu: emit events in order
	void drain_tasks();                 // block until all inflight finalized
	int wait_frame();                   // block until a frame is gettable
	~Decoder();

	// ---- entry points ----
	int decode_nal(const uint8_t *buf, size_t len);
	void flush();
	void end_of_stream();        // drain: bump all frames

	// ---- frame-set helpers (mirror edge264_internal.h:1228-1239) ----
	uint32_t dpb_frames() const {
		return committed_st | committed_lt | (to_get & ~outputq);
	}
	uint32_t unavail_frames() const {
		return committed_st | committed_lt | to_get | outputq;
	}
	uint32_t same_views(int non_base_view) const {
		return non_base_view ? non_base : ~non_base;
	}

	int get_frame(int *slot, int *slot_mvc);  // 0/ENOMSG/EAGAIN semantics
	void return_frame(int slot);

	// ---- internals ----
	int parse_sps(bool subset);
	int parse_sei();
	int parse_pps();
	int parse_slice();
	void parse_scaling_lists(uint8_t ws4[6][16], uint8_t ws8[6][64],
	                         bool transform8x8, const uint8_t fb4[6][16],
	                         const uint8_t fb8[6][64]);
	void init_task(Task &t);     // snapshot current slice state into a task
	void compute_poc();
	void init_ref_lists();
	void parse_ref_pic_list_modification();
	void parse_pred_weight_table();
	void parse_dec_ref_pic_marking();
	void sliding_window_marking();
	void handle_frame_gaps(int frame_num);
	int  find_free_slot();
	void finish_frame();         // currPic complete: emit events, marking
	void bump_frames(bool all);  // C.4.5 output bumping
	void conceal_frame();        // fill unparsed mbs (recover_slice analog)
	void conceal_frame_at(int slot, int qp, int cqpo, int cqpo2, int refslot);
	void logf_impl(const char *fmt, ...);
	// inline gate: the mb layer calls logf per syntax element, so the
	// disabled-logging path must not even pay the varargs call setup
	template <typename... A> inline void logf(const char *fmt, A... a) {
		if (__builtin_expect(log_cb != nullptr, 0))
			logf_impl(fmt, a...);
	}
};

// Task::logf forwards to the decoder's YAML logger; in asynchronous mode
// logdec is null and the call folds to nothing (threaded parsing is a
// non-logging configuration, like the reference's non-logs variants).
template <typename... A> inline void Task::logf(const char *fmt, A... a) {
	if (__builtin_expect(logdec != nullptr, 0))
		logdec->logf(fmt, a...);
}

// scan tables (ISO §8.5.6): zigzag for 4x4 and 8x8, raster destinations
extern const uint8_t zigzag4x4[16];
extern const uint8_t zigzag8x8[64];
extern const int8_t chroma_qp_table[52 + 36];  // QPc from clipped QPy+offset

} // namespace e264t

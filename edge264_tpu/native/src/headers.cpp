// NAL dispatch, parameter-set / slice-header parsing, POC, DPB bookkeeping.
//
// Behavior contracts (errno codes, bumping, new-frame detection, clamped
// reads) follow the reference decoder: parse_seq_parameter_set
// edge264_headers.c:1799-2059, parse_pic_parameter_set :1421-1502,
// parse_slice_layer_without_partitioning :953-1288, bump_frame :78-95,
// parse_dec_ref_pic_marking :611-701, parse_ref_pic_list_modification
// :758-888.  The code itself is written fresh for this project's host/TPU
// split: instead of dispatching worker tasks it fills syntax planes and
// emits events for the Python/JAX back end.
#include "e264t.h"
#include <cstdarg>

namespace e264t {

extern const uint8_t default_4x4_intra[16], default_4x4_inter[16];
extern const uint8_t default_8x8_intra[64], default_8x8_inter[64];
extern const uint8_t flat_16[16], flat_64[64];

void Decoder::logf_impl(const char *fmt, ...) {
	if (!log_cb) return;
	char buf[4096];
	va_list ap;
	va_start(ap, fmt);
	int n = vsnprintf(buf, sizeof(buf), fmt, ap);
	va_end(ap);
	if (n > 0)
		logbuf.insert(logbuf.end(), buf, buf + n);
}

static const char *ret_name(int ret) {
	switch (ret) {
	case 0: return "0";
	case E264T_ENOBUFS: return "ENOBUFS";
	case E264T_ENOTSUP: return "ENOTSUP";
	case E264T_EBADMSG: return "EBADMSG";
	case E264T_ENODATA: return "ENODATA";
	default: return "Unknown";
	}
}

// ---------------------------------------------------------------------------
// DPB helpers

static int popcount(uint32_t v) { return __builtin_popcount(v); }
static int ctz(uint32_t v) { return __builtin_ctz(v); }

// C.4.5 bumping: move the lowest-POC outputable frame to the output FIFO.
int Decoder_bump_frame(Decoder &d, int nbv, uint32_t ignored) {
	int pic = -1;
	int32_t lowest = INT32_MAX;
	uint32_t sv = d.same_views(nbv);
	for (uint32_t o = d.to_get & ~d.outputq & sv & ~ignored; o; o &= o - 1) {
		int i = ctz(o);
		if (d.Poc[0][i] < lowest) { lowest = d.Poc[0][i]; pic = i; }
	}
	if (pic < 0)
		return 0;
	d.outputq |= 1u << pic;
	// FIFO: insert at front, oldest drains from the back
	int8_t *q = d.output_fifo[nbv];
	for (int i = Decoder::MAX_SLOTS - 1; i > 0; i--)
		q[i] = q[i - 1];
	q[0] = pic;
	return 1;
}

void Decoder::bump_frames(bool all) {
	(void)all;
	while (Decoder_bump_frame(*this, 0, 0) | Decoder_bump_frame(*this, 1, 0)) {}
}

// unset_currPic: commit the staged reference state (edge264_headers.c:61-76)
void Decoder::finish_frame() {
	if (curr < 0) return;
	if (async()) {
		// Seal the frame: no more slices will arrive.  Task completions
		// finalize it (concealing holes from the seal snapshot) and
		// retirement emits its events in start order.
		std::unique_lock<std::mutex> lk(mu);
		for (auto it = inflight.begin(); it != inflight.end(); ++it) {
			if (it->slot != curr || it->finalized)
				continue;
			if (slice_count[curr] == 0) {
				// no slice data at all: discard (sync path below does
				// the DPB bookkeeping; drop the inflight entry here)
				entropy_done |= 1u << curr;
				inflight.erase(it);
				lk.unlock();
				goto discard_check;
			}
			it->sealed = true;
			// bit0 = reference; bit1 = MVC base view (kept for
			// inter-view prediction) -- mirrors the sync path's
			// EV_FRAME_DONE.b
			it->is_ref = (int32_t)((curr_st | curr_lt) >> curr & 1) |
				(ssps.valid && !(non_base >> curr & 1) ? 2 : 0);
			// concealment reference snapshot (conceal_frame()'s scan,
			// evaluated with the state current at seal time)
			{
				uint32_t sv = same_views(non_base >> curr & 1);
				uint32_t refs = (curr_st | curr_lt) & sv & ~(1u << curr);
				int refslot = -1, best = INT32_MIN;
				for (uint32_t r = refs; r; r &= r - 1) {
					int i = __builtin_ctz(r);
					if (FrameNums[i] > best) {
						best = FrameNums[i];
						refslot = i;
					}
				}
				it->conceal_ref = refslot;
			}
			maybe_finalize(*it);
			retire_frames();
			break;
		}
		int nbv_a = non_base >> curr & 1;
		if ((curr_st | curr_lt) & (1u << curr)) {
			uint32_t sv = same_views(nbv_a);
			PrevRefFrameNum[nbv_a] = FrameNums[curr];
			prevPicOrderCnt[nbv_a] = Poc[0][curr];
			committed_st = (committed_st & ~sv) | curr_st;
			committed_lt = (committed_lt & ~sv) | curr_lt;
			memcpy(committed_lti, curr_lti, sizeof(committed_lti));
		}
		if (!nbv_a)
			base_slot = curr;
		curr = -1;
		return;
	}
discard_check:
	if (!complete[curr] && remaining_mbs[curr] > 0) {
		int total = sps.mb_width * sps.mb_height;
		if (remaining_mbs[curr] >= total) {
			// no slice decoded at all: discard the frame entirely
			uint32_t bit = 1u << curr;
			to_get &= ~bit;
			outputq &= ~bit;
			curr_st &= ~bit;
			curr_lt &= ~bit;
			for (int v = 0; v < 2; v++) {
				int8_t *q = output_fifo[v];
				int w = 0;
				for (int i = 0; i < MAX_SLOTS; i++)
					if (q[i] != curr)
						q[w++] = q[i];
				while (w < MAX_SLOTS)
					q[w++] = -1;
			}
			curr = -1;
			return;
		}
		conceal_frame();        // partial frame: fill + flag the holes
	}
	if (!complete[curr] && remaining_mbs[curr] <= 0) {
		complete[curr] = 1;
		events.push_back({EV_FRAME_DONE, curr, FrameIds[curr],
		                  (int32_t)((curr_st | curr_lt) >> curr & 1), 0, 0});
	}
	int nbv = non_base >> curr & 1;
	if ((curr_st | curr_lt) & (1u << curr)) {
		uint32_t sv = same_views(nbv);
		PrevRefFrameNum[nbv] = FrameNums[curr];
		prevPicOrderCnt[nbv] = Poc[0][curr];
		committed_st = (committed_st & ~sv) | curr_st;
		committed_lt = (committed_lt & ~sv) | curr_lt;
		memcpy(committed_lti, curr_lti, sizeof(committed_lti));
	}
	if (!nbv)
		base_slot = curr;
	curr = -1;
}

void Decoder::end_of_stream() {
	finish_frame();
	drain_tasks();
	bump_frames(true);
}

void Decoder::flush() {
	// keep allocations, reset all decode state (clear_decoder,
	// edge264_headers.c:135-141: parameter sets are cleared too)
	finish_frame();
	drain_tasks();
	entropy_done = 0xFFFFFFFFu;
	sps = SPS();
	ssps = SPS();
	for (auto &p : pps) p = PPS();
	committed_st = committed_lt = curr_st = curr_lt = 0;
	to_get = outputq = non_base = 0;
	memset(FrameNums, 0, sizeof(FrameNums));
	memset(FrameIds, 0, sizeof(FrameIds));
	memset(Poc, 0, sizeof(Poc));
	memset(committed_lti, 0, sizeof(committed_lti));
	memset(curr_lti, 0, sizeof(curr_lti));
	memset(output_fifo, -1, sizeof(output_fifo));
	memset(remaining_mbs, 0, sizeof(remaining_mbs));
	memset(complete, 0, sizeof(complete));
	curr = base_slot = -1;
	prev_frame_id = -1;
	PrevRefFrameNum[0] = PrevRefFrameNum[1] = -1;
	prevPicOrderCnt[0] = prevPicOrderCnt[1] = 0;
	last_idr_pic_id = -1;
	last_delta_poc0 = 0;
	events.clear();
}

int Decoder::get_frame(int *slot, int *slot_mvc) {
	*slot = *slot_mvc = -1;
	// oldest entry = last non-(-1) in the FIFO
	int idx0 = -1, idx1 = -1;
	for (int i = 0; i < MAX_SLOTS; i++)
		if (output_fifo[0][i] >= 0) idx0 = i;
	for (int i = 0; i < MAX_SLOTS; i++)
		if (output_fifo[1][i] >= 0) idx1 = i;
	if (idx0 < 0)
		return -1;
	int pic0 = output_fifo[0][idx0];
	if (!complete[pic0])
		return -1;
	if (ssps.valid) {   // MVC: need the paired view too
		if (idx1 < 0 || !complete[output_fifo[1][idx1]])
			return -1;
	}
	output_fifo[0][idx0] = -1;
	to_get &= ~(1u << pic0);
	*slot = pic0;
	if (idx1 >= 0) {
		int pic1 = output_fifo[1][idx1];
		output_fifo[1][idx1] = -1;
		to_get &= ~(1u << pic1);
		*slot_mvc = pic1;
	}
	return 0;
}

void Decoder::return_frame(int slot) {
	outputq &= ~(1u << slot);
}

// ---------------------------------------------------------------------------
// Scaling lists (§7.3.2.1.1.1).  Zero rows in pps lists mean "inherit from
// the active SPS list" (fall-back rule B resolved at slice setup, same trick
// as the reference's initialize_task, edge264_headers.c:916-931).
static void parse_scaling_list(Decoder &d, uint8_t *ws, int n,
                               const uint8_t *fallback, const uint8_t *def,
                               const uint8_t *scan) {
	if (!d.gb.u1()) {               // scaling_list_present_flag
		memcpy(ws, fallback, n);
		return;
	}
	int lastScale = 8;
	int nextScale = (8 + d.gb.se(-128, 127)) & 255;
	if (nextScale == 0) {
		memcpy(ws, def, n);
		return;
	}
	for (int j = 0; j < n; j++) {
		ws[scan[j]] = nextScale ? nextScale : lastScale;
		if (nextScale)
			lastScale = nextScale;
		if (j + 1 < n && nextScale)
			nextScale = (lastScale + d.gb.se(-128, 127)) & 255;
		else if (j + 1 < n)
			nextScale = 0;
	}
}

void Decoder::parse_scaling_lists(uint8_t ws4[6][16], uint8_t ws8[6][64],
                                  bool transform8x8, const uint8_t fb4[6][16],
                                  const uint8_t fb8[6][64]) {
	// lists 0-5: 4x4 Y/Cb/Cr intra then inter
	for (int i = 0; i < 6; i++) {
		const uint8_t *fallback = i == 0 ? fb4[0] : i == 3 ? fb4[3] : ws4[i - 1];
		const uint8_t *def = i < 3 ? default_4x4_intra : default_4x4_inter;
		parse_scaling_list(*this, ws4[i], 16, fallback, def, zigzag4x4);
	}
	if (transform8x8) {
		// lists 6,7 (4:2:0): 8x8 intra/inter
		for (int i = 0; i < 2; i++) {
			const uint8_t *fallback = fb8[i];
			const uint8_t *def = i == 0 ? default_8x8_intra : default_8x8_inter;
			parse_scaling_list(*this, ws8[i], 64, fallback, def, zigzag8x8);
		}
	}
}

// ---------------------------------------------------------------------------
// VUI (§E.1.1) — parsed fully to keep bitstream position; only the DPB
// restriction fields are retained.
static int parse_hrd(Decoder &d, SPS &s) {
	int cpb_cnt = d.gb.ue(31) + 1;
	d.gb.u(8);                       // bit_rate_scale + cpb_size_scale
	for (int i = 0; i < cpb_cnt; i++) {
		d.gb.ue(4294967294u);
		d.gb.ue(4294967294u);
		d.gb.u1();
	}
	// the four delay lengths feed SEI parsing (E.1.2)
	s.initial_cpb_removal_delay_length = (uint8_t)(d.gb.u(5) + 1);
	s.cpb_removal_delay_length = (uint8_t)(d.gb.u(5) + 1);
	s.dpb_output_delay_length = (uint8_t)(d.gb.u(5) + 1);
	s.time_offset_length = (uint8_t)d.gb.u(5);
	return cpb_cnt;
}

// SEI messages (§7.3.2.3 / D.1) — log-variant parity with the
// reference's edge264_sei.c (buffering period, pic timing, pan-scan);
// payloads only affect the YAML log, never the decode.
int Decoder::parse_sei() {
	while (gb.remaining_bits() >= 16) {
		int type = 0, size = 0, b;
		do { b = gb.u(8); type += b; } while (b == 255);
		do { b = gb.u(8); size += b; } while (b == 255);
		int64_t end = gb.consumed() + (int64_t)size * 8;
		switch (type) {
		case 0: {                // buffering_period (D.1.2)
			gb.ue(31);           // seq_parameter_set_id
			if (!sps.valid)
				return E264T_EBADMSG;   // reference: edge264_sei.c:4-5
			logf("  buffering_period: {delay_bits: %u",
			     sps.initial_cpb_removal_delay_length);
			const char *names[2] = {", nal_hrd", ", vcl_hrd"};
			int cnts[2] = {sps.nal_hrd_cpb_cnt, sps.vcl_hrd_cpb_cnt};
			for (int h = 0; h < 2; h++) {
				if (!cnts[h])
					continue;
				logf("%s: [", names[h]);
				for (int i = 0; i < cnts[h]; i++) {
					unsigned delay =
						gb.u(sps.initial_cpb_removal_delay_length);
					unsigned offset =
						gb.u(sps.initial_cpb_removal_delay_length);
					logf(i ? ", {delay: %u, offset: %u}"
					       : "{delay: %u, offset: %u}", delay, offset);
				}
				logf("]");
			}
			logf("}\n");
			break;
		}
		case 1: {                // pic_timing (D.1.3)
			static const char *const pic_struct_names[9] = {
				"progressive frame", "top field", "bottom field",
				"top then bottom", "bottom then top",
				"top then bottom then top",
				"bottom then top then bottom", "frame doubling",
				"frame tripling"};
			if (!sps.valid)
				return E264T_EBADMSG;
			logf("  pic_timing:\n");
			if (sps.nal_hrd_cpb_cnt | sps.vcl_hrd_cpb_cnt) {
				unsigned crd = gb.u(sps.cpb_removal_delay_length);
				unsigned dod = gb.u(sps.dpb_output_delay_length);
				logf("    cpb_removal_delay: %u\n"
				     "    dpb_output_delay: %u\n", crd, dod);
			}
			if (sps.pic_struct_present) {
				unsigned ps = gb.u(4);
				// NumClockTS per pic_struct (Table D-1)
				int nts = 0x3be95 >> (ps * 2) & 3;
				logf("    pic_struct: %s (%u)\n",
				     ps < 9 ? pic_struct_names[ps] : "unknown", ps);
				logf("    clock_timestamps:\n");
				int hh = 0, mm = 0, ss = 0;
				while (nts--) {
					if (!gb.u1())    // clock_timestamp_flag
						continue;
					unsigned u = gb.u(19);  // ct_type..n_frames packed
					if (u & 1 << 10) {      // full_timestamp_flag
						unsigned v = gb.u(17);
						ss = v >> 11;
						mm = v >> 5 & 0x3f;
						hh = v & 0x1f;
					} else if (gb.u1()) {   // seconds_flag
						unsigned w = gb.u(7);
						ss = w >> 1;
						if (w & 1) {        // minutes_flag
							unsigned x = gb.u(7);
							mm = x >> 1;
							if (x & 1)      // hours_flag
								hh = (int)gb.u(5);
						}
					}
					int toff = 0;
					if (sps.time_offset_length)
						toff = (int)gb.u(sps.time_offset_length);
					logf("      - {scan_type: %u, discontinuity: %u, "
					     "clockTimestamp: \"%02u:%02u:%02u+%u/%u\"}\n",
					     u >> 17, u >> 9 & 1, hh, mm, ss,
					     (u & 0xff) * (sps.num_units_in_tick *
					                   (1 + (u >> 16 & 1))) + toff,
					     sps.time_scale);
				}
			}
			break;
		}
		case 2: {                // pan_scan_rect (D.1.4)
			unsigned id = gb.ue(255);
			int cancel = gb.u1();
			logf("  pan_scan_rect: {id: %u, cancel: %d", id, cancel);
			if (!cancel) {
				int cnt = gb.ue(2) + 1;
				for (int i = 0; i < cnt; i++) {
					int l = gb.se(-(1 << 16), 1 << 16);
					int r = gb.se(-(1 << 16), 1 << 16);
					int t = gb.se(-(1 << 16), 1 << 16);
					int bo = gb.se(-(1 << 16), 1 << 16);
					logf(", rect%d: [%d, %d, %d, %d]", i, l, r, t, bo);
				}
				gb.ue(1 << 16);  // repetition_period
			}
			logf("}\n");
			break;
		}
		case 6: {                // recovery_point (D.1.8)
			unsigned cnt = gb.ue(1 << 16);
			int exact = gb.u1();
			int broken = gb.u1();
			gb.u(2);             // changing_slice_group_idc
			logf("  recovery_point: {frame_cnt: %u, exact_match: %d, "
			     "broken_link: %d}\n", cnt, exact, broken);
			break;
		}
		default:
			logf("  sei: {type: %d, size: %d}\n", type, size);
			break;
		}
		// skip to declared payload end regardless of what we read
		while (gb.consumed() < end && gb.remaining_bits() > 0)
			gb.u1();
		// stop at rbsp trailing bits
		if (gb.remaining_bits() < 16)
			break;
	}
	return 0;
}

static void parse_vui(Decoder &d, SPS &s) {
	if (d.gb.u1()) {                 // aspect_ratio_info_present
		if (d.gb.u(8) == 255)
			d.gb.u(32);
	}
	if (d.gb.u1())                   // overscan_info_present
		d.gb.u1();
	if (d.gb.u1()) {                 // video_signal_type_present
		d.gb.u(4);
		if (d.gb.u1())               // colour_description_present
			d.gb.u(24);
	}
	if (d.gb.u1()) {                 // chroma_loc_info_present
		d.gb.ue(5);
		d.gb.ue(5);
	}
	if (d.gb.u1()) {                 // timing_info_present
		s.num_units_in_tick = d.gb.u(32);
		s.time_scale = d.gb.u(32);
		d.gb.u1();
	}
	int nal_hrd = d.gb.u1();
	if (nal_hrd) s.nal_hrd_cpb_cnt = (uint8_t)parse_hrd(d, s);
	int vcl_hrd = d.gb.u1();
	if (vcl_hrd) s.vcl_hrd_cpb_cnt = (uint8_t)parse_hrd(d, s);
	if (nal_hrd || vcl_hrd)
		d.gb.u1();                   // low_delay_hrd
	s.pic_struct_present = (uint8_t)d.gb.u1();
	if (d.gb.u1()) {                 // bitstream_restriction
		d.gb.u1();                   // motion_vectors_over_pic_boundaries
		d.gb.ue(16); d.gb.ue(16);    // max_bytes/bits denom
		d.gb.ue(16); d.gb.ue(16);    // log2 max mv lengths
		int reorder = d.gb.ue(16);
		int buffering = d.gb.ue(16);
		if (buffering >= s.max_num_ref_frames && buffering <= 16) {
			s.max_dec_frame_buffering = buffering;
			s.max_num_reorder_frames =
				reorder < buffering ? reorder : buffering;
		}
	}
	d.logf("  max_num_reorder_frames: %u\n  max_dec_frame_buffering: %u\n",
	       s.max_num_reorder_frames, s.max_dec_frame_buffering);
}

// ---------------------------------------------------------------------------
// SPS (§7.3.2.1)
extern const int level_max_dpb_mbs[][2];

static int max_dpb_mbs(int level_idc) {
	int best = 2785280;   // level 6.2 (and "no limit" above)
	for (int i = 0; level_max_dpb_mbs[i][1]; i++) {
		if (level_idc <= level_max_dpb_mbs[i][0])
			return level_max_dpb_mbs[i][1];
	}
	return best;
}

int Decoder::parse_sps(bool subset) {
	SPS s;
	int ret = 0;

	int profile_idc = gb.u(8);
	int constraint_set_flags = gb.u(8);
	int level_idc = gb.u(8);
	gb.ue(31);   // seq_parameter_set_id
	s.profile_idc = profile_idc;
	s.level_idc = level_idc;
	logf("  profile_idc: %u\n  constraint_set_flags: [%u,%u,%u,%u,%u,%u]\n"
	     "  level_idc: %.1f\n", profile_idc,
	     constraint_set_flags >> 7, constraint_set_flags >> 6 & 1,
	     constraint_set_flags >> 5 & 1, constraint_set_flags >> 4 & 1,
	     constraint_set_flags >> 3 & 1, constraint_set_flags >> 2 & 1,
	     level_idc / 10.0);
	if (subset && profile_idc != 118 && profile_idc != 128 && profile_idc != 134)
		ret = E264T_ENOTSUP;

	memset(s.weightScale4x4, 16, sizeof(s.weightScale4x4));
	memset(s.weightScale8x8, 16, sizeof(s.weightScale8x8));
	if (profile_idc != 66 && profile_idc != 77 && profile_idc != 88) {
		s.chroma_format_idc = gb.ue(3);
		logf("  chroma_format_idc: %u\n", s.chroma_format_idc);
		if (s.chroma_format_idc != 1) {
			ret = E264T_ENOTSUP;
			if (s.chroma_format_idc == 3)
				gb.u1();             // separate_colour_plane_flag
		}
		s.bit_depth_luma = 8 + gb.ue(6);
		s.bit_depth_chroma = 8 + gb.ue(6);
		if (s.bit_depth_luma > 8 || s.bit_depth_chroma > 8)
			ret = E264T_ENOTSUP;
		s.qpprime_y_zero_transform_bypass = gb.u1();
		if (s.qpprime_y_zero_transform_bypass)
			ret = E264T_ENOTSUP;
		logf("  bit_depth: {luma: %u, chroma: %u}\n"
		     "  qpprime_y_zero_transform_bypass_flag: %u\n",
		     s.bit_depth_luma, s.bit_depth_chroma,
		     s.qpprime_y_zero_transform_bypass);
		memset(s.weightScale4x4, 16, sizeof(s.weightScale4x4));
		memset(s.weightScale8x8, 16, sizeof(s.weightScale8x8));
		if (gb.u1()) {               // seq_scaling_matrix_present_flag
			s.seq_scaling_matrix_present = 1;
			// fall-back rule A: lists 0/3 default to the default matrices
			uint8_t fb4[6][16], fb8[6][64];
			memcpy(fb4[0], default_4x4_intra, 16);
			memcpy(fb4[3], default_4x4_inter, 16);
			memcpy(fb8[0], default_8x8_intra, 64);
			memcpy(fb8[1], default_8x8_inter, 64);
			parse_scaling_lists(s.weightScale4x4, s.weightScale8x8, true,
			                    fb4, fb8);
		}
	} else {
		logf("  chroma_format_idc: 1 # 4:2:0 # inferred\n"
		     "  bit_depth: {luma: 8, chroma: 8} # inferred\n");
	}

	s.log2_max_frame_num = gb.ue(12) + 4;
	s.pic_order_cnt_type = gb.ue(2);
	logf("  log2_max_frame_num: %u\n  pic_order_cnt_type: %u\n",
	     s.log2_max_frame_num, s.pic_order_cnt_type);
	if (s.pic_order_cnt_type == 0) {
		s.log2_max_poc_lsb = gb.ue(12) + 4;
		logf("  log2_max_pic_order_cnt_lsb: %u\n", s.log2_max_poc_lsb);
	} else if (s.pic_order_cnt_type == 1) {
		s.delta_pic_order_always_zero = gb.u1();
		s.offset_for_non_ref_pic = gb.se(-32768, 32767);
		s.offset_for_top_to_bottom = gb.se(-32768, 32767);
		s.num_ref_frames_in_poc_cycle = gb.ue(255);
		int32_t sum = 0;
		for (int i = 0; i < s.num_ref_frames_in_poc_cycle; i++) {
			sum += gb.se(-65535, 65535);
			s.offset_for_ref_frames[i] = sum;   // cumulative sums
		}
		s.poc_cycle_sum = sum;
	}

	int max_num_ref_frames = gb.ue(16);
	uint8_t gaps = gb.u1();
	s.gaps_allowed = gaps;
	s.mb_width = gb.ue(1022) + 1;
	int map_units = gb.ue(1055) + 1;
	s.frame_mbs_only = gb.u1();
	if (!s.frame_mbs_only)
		ret = E264T_ENOTSUP;
	s.mb_height = map_units << 1 >> s.frame_mbs_only;
	int MaxDpbFrames = max_dpb_mbs(level_idc) / (s.mb_width * s.mb_height);
	if (MaxDpbFrames > 16) MaxDpbFrames = 16;
	s.DpbMaxFrames = MaxDpbFrames;
	s.max_num_ref_frames =
		max_num_ref_frames < MaxDpbFrames ? max_num_ref_frames : MaxDpbFrames;
	bool intra_profile = profile_idc == 44 || profile_idc == 86 ||
		profile_idc == 100 || profile_idc == 110 || profile_idc == 122 ||
		profile_idc == 244;
	if (intra_profile && (constraint_set_flags & 1 << 4)) {
		s.max_num_reorder_frames = 0;
		s.max_dec_frame_buffering = s.max_num_ref_frames;
	} else {
		s.max_num_reorder_frames = s.max_dec_frame_buffering = MaxDpbFrames;
	}
	logf("  max_num_ref_frames: %u\n"
	     "  gaps_in_frame_num_value_allowed_flag: %u\n"
	     "  pic_size_in_mbs: {width: %u, height: %u}\n"
	     "  frame_mbs_only_flag: %u\n",
	     s.max_num_ref_frames, gaps, s.mb_width, s.mb_height, s.frame_mbs_only);
	if (!s.frame_mbs_only)
		gb.u1();                     // mb_adaptive_frame_field_flag
	s.direct_8x8_inference = gb.u1();
	logf("  direct_8x8_inference_flag: %u\n", s.direct_8x8_inference);

	if (gb.u1()) {                   // frame_cropping_flag
		int shiftX = s.chroma_format_idc == 1 || s.chroma_format_idc == 2;
		int shiftY = (s.chroma_format_idc == 1) + 1 - s.frame_mbs_only;
		int limX = (s.mb_width * 16 >> shiftX) - 1;
		int limY = (s.mb_height * 16 >> shiftY) - 1;
		s.crop_left = gb.ue(limX) << shiftX;
		s.crop_right = gb.ue(limX - (s.crop_left >> shiftX)) << shiftX;
		s.crop_top = gb.ue(limY) << shiftY;
		s.crop_bottom = gb.ue(limY - (s.crop_top >> shiftY)) << shiftY;
		logf("  frame_crop_offsets: {left: %u, right: %u, top: %u, bottom: %u}\n",
		     s.crop_left, s.crop_right, s.crop_top, s.crop_bottom);
	}
	if (gb.u1())                     // vui_parameters_present
		parse_vui(*this, s);
	else
		logf("  max_num_reorder_frames: %u # inferred\n"
		     "  max_dec_frame_buffering: %u # inferred\n",
		     s.max_num_reorder_frames, s.max_dec_frame_buffering);

	if (subset) {
		// §7.3.2.1.3 + H.7.3.2.1.4 seq_parameter_set_mvc_extension
		if (!gb.u1())                // bit_equal_to_one
			return E264T_EBADMSG;
		int num_views = (int)gb.ue(1023) + 1;
		logf("  view_ids: [");
		for (int i = 0; i < num_views; i++) {
			unsigned vid = gb.ue(1023);
			logf(i ? ",%u" : "%u", vid);
		}
		logf("]\n");
		if (num_views != 2)
			return E264T_ENOTSUP;    // Stereo High: exactly 2 views
		for (int k = 0; k < 4; k++) {   // (non-)anchor refs, both lists
			if (gb.ue(1))
				gb.ue(1023);
		}
		for (int i = (int)gb.ue(63); i >= 0; i--) {
			gb.u(8);                 // level_idc
			for (int j = (int)gb.ue(1023); j >= 0; j--) {
				gb.u(3);             // applicable_op_temporal_id
				for (int k = (int)gb.ue(1023); k >= 0; k--)
					gb.ue(1023);     // target view ids
				gb.ue(1023);         // applicable_op_num_views_minus1
			}
		}
		if (gb.u1())                 // mvc_vui_parameters_present
			return E264T_ENOTSUP;
		if (gb.u1()) {               // additional_extension2_flag
			while (gb.more_rbsp())
				gb.u1();
		}
		if (!gb.rbsp_finished())
			return E264T_EBADMSG;
		s.valid = 1;
		s.mvc = 1;
		// entering an MVC sequence: single-view frames queued from the
		// preceding sequence can never pair with a second view (the
		// paired-output protocol, edge264.c:373-399) — drain them first
		if (!ssps.valid && (to_get | outputq)) {
			finish_frame();
			bump_frames(true);
			if (to_get | outputq)
				return E264T_ENOBUFS;   // reparse this SSPS after drain
		}
		ssps = s;
		return 0;
	}

	if (!gb.rbsp_finished())
		ret = E264T_EBADMSG;
	if (ret == 0) {
		s.valid = 1;
		// frame-format change drains everything (edge264_headers.c:2012-2057)
		const SPS &cmp = sps.valid ? sps : ssps;
		bool format_change = !cmp.valid || cmp.mb_width != s.mb_width ||
			cmp.mb_height != s.mb_height ||
			cmp.chroma_format_idc != s.chroma_format_idc ||
			cmp.bit_depth_luma != s.bit_depth_luma ||
			cmp.crop_left != s.crop_left || cmp.crop_right != s.crop_right ||
			cmp.crop_top != s.crop_top || cmp.crop_bottom != s.crop_bottom;
		if (format_change) {
			finish_frame();
			bump_frames(true);
			if (to_get | outputq)
				return E264T_ENOBUFS;   // reparse this SPS after draining
			SPS keep_ssps = ssps;   // flush clears both
			flush();
			ssps = keep_ssps;
			events.push_back({EV_FORMAT, -1, s.mb_width, s.mb_height,
			                  MAX_SLOTS, s.chroma_format_idc});
		}
		sps = s;
	}
	return ret;
}

// ---------------------------------------------------------------------------
// PPS (§7.3.2.2)
int Decoder::parse_pps() {
	PPS p;
	int ret = 0;
	int id = gb.ue(255);
	if (id >= 4)
		ret = E264T_ENOTSUP;    // reference supports 4 PPS slots
	p.sps_id = gb.ue(31);
	p.entropy_coding_mode = gb.u1();
	p.bottom_field_pic_order_in_frame_present = gb.u1();
	int num_slice_groups = gb.ue(7) + 1;
	if (num_slice_groups > 1)
		ret = E264T_ENOTSUP;
	p.num_ref_idx_active[0] = gb.ue(31) + 1;
	p.num_ref_idx_active[1] = gb.ue(31) + 1;
	p.weighted_pred_flag = gb.u1();
	p.weighted_bipred_idc = gb.u(2);
	p.pic_init_qp = gb.se(-26, 25) + 26;
	gb.se(-26, 25);              // pic_init_qs
	p.second_chroma_qp_index_offset = p.chroma_qp_index_offset = gb.se(-12, 12);
	p.deblocking_filter_control_present = gb.u1();
	p.constrained_intra_pred = gb.u1();
	int redundant = gb.u1();
	if (p.constrained_intra_pred || redundant)
		ret = E264T_ENOTSUP;
	logf("  pic_parameter_set_id: %u\n  entropy_coding_mode_flag: %u\n"
	     "  bottom_field_pic_order_in_frame_present_flag: %u\n"
	     "  num_slice_groups: %u\n"
	     "  num_ref_idx_default_active: {l0: %u, l1: %u}\n"
	     "  weighted_pred_flag: %u\n  weighted_bipred_idc: %u\n"
	     "  pic_init_qp: %u\n  chroma_qp_index_offset: %d\n"
	     "  deblocking_filter_control_present_flag: %u\n"
	     "  constrained_intra_pred_flag: %u\n"
	     "  redundant_pic_cnt_present_flag: %u\n",
	     id, p.entropy_coding_mode, p.bottom_field_pic_order_in_frame_present,
	     num_slice_groups, p.num_ref_idx_active[0], p.num_ref_idx_active[1],
	     p.weighted_pred_flag, p.weighted_bipred_idc, p.pic_init_qp,
	     p.chroma_qp_index_offset, p.deblocking_filter_control_present,
	     p.constrained_intra_pred, redundant);
	memset(p.weightScale4x4, 0, sizeof(p.weightScale4x4));  // 0 = inherit SPS
	memset(p.weightScale8x8, 0, sizeof(p.weightScale8x8));
	if (gb.more_rbsp()) {
		p.transform_8x8_mode = gb.u1();
		logf("  transform_8x8_mode_flag: %u\n", p.transform_8x8_mode);
		p.pic_scaling_matrix_present = gb.u1();
		if (p.pic_scaling_matrix_present) {
			// fall-back rule B: lists 0/3 inherit the SPS lists; mark with
			// zeros, resolved at slice setup against the active SPS
			uint8_t fb4[6][16] = {{0}}, fb8[6][64] = {{0}};
			parse_scaling_lists(p.weightScale4x4, p.weightScale8x8,
			                    p.transform_8x8_mode, fb4, fb8);
		}
		p.second_chroma_qp_index_offset = gb.se(-12, 12);
		logf("  second_chroma_qp_index_offset: %d\n",
		     p.second_chroma_qp_index_offset);
	}
	if (!gb.rbsp_finished())
		ret = E264T_EBADMSG;
	if (ret == 0) {
		p.valid = 1;
		pps[id] = p;
	}
	return ret;
}

// ---------------------------------------------------------------------------
// NAL entry: unescape + dispatch
int Decoder::decode_nal(const uint8_t *buf, size_t len) {
	// async mode: events retired between calls (wait_frame/poll) are
	// still queued for the consumer -- only sync mode may reset here
	if (!async())
		events.clear();
	logbuf.clear();
	if (len == 0) {   // end-of-buffer: drain (edge264.c:328-333)
		end_of_stream();
		// BORROWED frames (outputq) are the caller's to return; they
		// must not hold the drain in ENOBUFS forever
		return to_get ? E264T_ENOBUFS : E264T_ENODATA;
	}
	nal_ref_idc = buf[0] >> 5;
	nal_unit_type = buf[0] & 31;
	logf("\n- nal_ref_idc: %u\n  nal_unit_type: %u\n",
	     nal_ref_idc, nal_unit_type);

	// unescape the RBSP (strip 00 00 03 emulation-prevention bytes)
	rbsp.clear();
	rbsp.reserve(len);
	size_t i = 1;
	while (i < len) {
		if (i + 2 < len && buf[i] == 0 && buf[i + 1] == 0 && buf[i + 2] == 3) {
			rbsp.push_back(0);
			rbsp.push_back(0);
			i += 3;
		} else {
			rbsp.push_back(buf[i]);
			i++;
		}
	}
	gb.init(rbsp.data(), rbsp.size());

	int ret;
	switch (nal_unit_type) {
	case 1: case 5:
		ret = parse_slice();
		break;
	case 7:
		ret = parse_sps(false);
		break;
	case 15:
		ret = parse_sps(true);
		break;
	case 8:
		ret = parse_pps();
		break;
	case 6:
		ret = parse_sei();
		break;
	case 9: case 11: case 12:
		ret = 0;                 // ignored NALs (edge264.c:165)
		break;
	case 14:                     // MVC prefix NAL: view info for the base
		ret = 0;                 // slice; nothing the decode needs
		break;
	case 20: {                   // coded slice extension (H.7.3.1)
		if (gb.u1()) {           // svc_extension_flag
			ret = E264T_ENOTSUP;
			break;
		}
		int non_idr = gb.u1();
		gb.u(6);                 // priority_id
		unsigned view_id = gb.u(10);
		gb.u(3);                 // temporal_id
		int anchor = gb.u1();
		gb.u1();                 // inter_view_flag
		gb.u1();                 // reserved_one_bit
		logf("  mvc_extension: {non_idr: %d, view_id: %u, anchor: %d}\n",
		     non_idr, view_id, anchor);
		if (!ssps.valid) {
			ret = E264T_EBADMSG;
			break;
		}
		mvc_non_idr = non_idr;
		ret = parse_slice();
		break;
	}
	case 10:                     // end of sequence: drain + reset
		if (!gb.rbsp_finished() && rbsp.size() > 0)
			ret = E264T_EBADMSG;
		else {
			end_of_stream();
			if (to_get)          // borrowed frames don't block the reset
				return E264T_ENOBUFS;
			flush();
			ret = 0;
		}
		break;
	default:
		ret = E264T_ENOTSUP;
	}
	logf("  decode_NAL_result: %s\n", ret_name(ret));

	// device memory bookkeeping: slots no longer referenced, queued or
	// borrowed can release their sample planes (the analog of the
	// reference's borrow bitmask bookkeeping, edge264.c:389-402)
	uint32_t now = committed_st | committed_lt | curr_st | curr_lt |
		to_get | outputq | (curr >= 0 ? 1u << curr : 0) |
		(base_slot >= 0 ? 1u << base_slot : 0);
	if (async()) {
		// unretired in-flight frames (and their references) must stay
		// pinned: a worker may still be parsing them, and their
		// FRAME_DONE has not reached the consumer yet
		std::unique_lock<std::mutex> lk(mu);
		for (auto &fi : inflight) {
			now |= 1u << fi.slot | fi.dep_slots;
			if (fi.conceal_ref >= 0)
				now |= 1u << fi.conceal_ref;
		}
	}
	uint32_t freed = pinned & ~now;
	for (uint32_t f = freed; f; f &= f - 1)
		events.push_back({EV_UNPIN, __builtin_ctz(f), 0, 0, 0, 0});
	pinned = now;
	return ret;
}

} // namespace e264t

// Slice-layer parsing: header (§7.3.3), POC (§8.2.1), gaps (§8.2.5.2),
// reference lists (§8.2.4), marking (§8.2.5), DPB insertion (C.4.5).
// Behavior mirrors parse_slice_layer_without_partitioning
// (edge264_headers.c:953-1288) minus the task machinery: slice data is
// parsed synchronously into syntax planes and events notify the device side.
#include "e264t.h"

namespace e264t {

int Decoder_bump_frame(Decoder &d, int nbv, uint32_t ignored);
int chroma_qp(int qpy, int offset);

static int popcount(uint32_t v) { return __builtin_popcount(v); }
static int ctz32(uint32_t v) { return __builtin_ctz(v); }
template <typename T> static T minv(T a, T b) { return a < b ? a : b; }

// 8.2.5 marking, applied to the staged curr_* state
// (mirrors parse_dec_ref_pic_marking, edge264_headers.c:611-701)
void Decoder::parse_dec_ref_pic_marking() {
	int nbv = nal_unit_type == 20;
	if (IdrPicFlag) {
		int no_output_of_prior_pics = gb.u1();
		int long_term_flag = gb.u1();
		curr_st = (long_term_flag ^ 1) << curr;
		curr_lt = (uint32_t)long_term_flag << curr;
		memset(curr_lti, 0, sizeof(curr_lti));
		logf("  no_output_of_prior_pics_flag: %d\n"
		     "  long_term_reference_flag: %d\n",
		     no_output_of_prior_pics, long_term_flag);
		while (Decoder_bump_frame(*this, nbv, 1u << curr)) {}
		return;
	}

	int long_term_current = 0;
	if (gb.u1()) {   // adaptive_ref_pic_marking_mode_flag
		logf("  memory_management_control_operations:\n");
		int mmco, guard = 32;
		while ((mmco = gb.ue(6)) != 0 && guard-- > 0) {
			int target = curr, opFrameNum = 0, lti = 0;
			if (mmco == 1 || mmco == 3) {
				opFrameNum = FrameNum - 1 - (int)gb.ue(4294967294u);
				for (uint32_t r = curr_st; r; r &= r - 1) {
					int j = ctz32(r);
					if (FrameNums[j] == opFrameNum) {
						target = j;
						curr_st ^= 1u << j;
						curr_lt &= ~(1u << j);
					}
				}
			}
			if (mmco == 2 || mmco == 3 || mmco == 4 || mmco == 6) {
				lti = gb.ue(sps.max_num_ref_frames - (mmco != 4));
				int up = (mmco == 4) ? INT32_MAX : lti;
				for (uint32_t r = curr_lt & ~curr_st; r; r &= r - 1) {
					int j = ctz32(r);
					if (curr_lti[j] >= lti && curr_lti[j] <= up)
						curr_lt ^= 1u << j;
				}
				if (mmco == 3 || mmco == 6) {
					curr_lti[target] = lti;
					if (mmco == 6)
						long_term_current = 1;
					else if (target != curr)
						curr_lt |= 1u << target;
				}
			}
			if (mmco == 5) {
				curr_st = curr_lt = 0;
				FrameNums[curr] = 0;
				memset(curr_lti, 0, sizeof(curr_lti));
				int tmp = minv(TopFOC, BottomFOC);
				Poc[0][curr] = TopFOC - tmp;
				Poc[1][curr] = BottomFOC - tmp;
				while (Decoder_bump_frame(*this, nbv, 1u << curr)) {}
			}
			logf("  - {mmco: %d}\n", mmco);
		}
	}

	// 8.2.5.3 sliding window
	if (popcount(curr_st | curr_lt) >= sps.max_num_ref_frames) {
		int best = INT32_MAX, next = 0;
		for (uint32_t r = curr_st; r; r &= r - 1) {
			int i = ctz32(r);
			if (FrameNums[i] < best) { best = FrameNums[i]; next = i; }
		}
		curr_st ^= 1u << next;
		curr_lt &= ~(1u << next);
	}
	if (long_term_current)
		curr_lt |= 1u << curr;
	else
		curr_st |= 1u << curr;
}

// 8.2.4 initial lists + ref_pic_list_modification
// (mirrors parse_ref_pic_list_modification, edge264_headers.c:758-888)
void Decoder::init_ref_lists() {
	memset(sh.RefPicList, -1, sizeof(sh.RefPicList));
	int count[3] = {0, 0, 0};
	int size = 0;
	if (!IdrPicFlag) {
		const int32_t *values = sh.slice_type == 0 ? FrameNums : Poc[0];
		int32_t pic_value = sh.slice_type == 0 ? FrameNum : TopFOC;
		uint32_t refs = (sh.slice_type != 0 && sps.pic_order_cnt_type == 0)
			? (curr_st ^ curr_lt) : (curr_st | curr_lt);
		while (refs) {
			int best = INT32_MAX, next = 0;
			for (uint32_t r = refs; r; r &= r - 1) {
				int i = ctz32(r);
				int diff = values[i] - pic_value;
				int stn = diff <= 0 ? -diff : 0x10000 + diff;
				int ltn = committed_lti[i] + 0x20000;
				int v = (curr_st & 1u << i) ? stn : ltn;
				if (v < best) { best = v; next = i; }
			}
			refs ^= 1u << next;
			sh.RefPicList[0][size++] = next;
			count[best >> 16]++;
		}
	}
	if (nal_unit_type == 20)
		sh.RefPicList[0][size++] = base_slot;   // MVC inter-view ref

	// L1 = before/after swapped
	for (int src = 0; src < size; src++) {
		int dst = src < count[0] ? src + count[1]
		        : src < count[0] + count[1] ? src - count[0] : src;
		sh.RefPicList[1][dst] = sh.RefPicList[0][src];
	}
	if (sh.RefPicList[0][1] >= 0 && sh.RefPicList[0][0] == sh.RefPicList[1][0]) {
		sh.RefPicList[1][0] = sh.RefPicList[0][1];
		sh.RefPicList[1][1] = sh.RefPicList[0][0];
	}
}

void Decoder::parse_ref_pic_list_modification() {
	for (int l = 0; l <= (sh.slice_type == 1 ? 1 : 0); l++) {
		uint32_t picNumLX = FrameNum;
		if (!gb.u1())   // ref_pic_list_modification_flag_lX
			continue;
		logf("  ref_pic_list_modifications_l%u: [", l);
		int idc;
		for (int refIdx = 0; (idc = gb.ue(5)) != 3 && refIdx < 32; refIdx++) {
			uint32_t num = gb.ue(4294967294u);
			int pic = base_slot;    // for idc 4/5 (MVC inter-view)
			if (idc < 2) {
				picNumLX = idc == 0 ? picNumLX - (num + 1) : picNumLX + (num + 1);
				uint32_t mask = (1u << sps.log2_max_frame_num) - 1;
				for (uint32_t r = curr_st; r; r &= r - 1) {
					pic = ctz32(r);
					if (!((FrameNums[pic] ^ picNumLX) & mask))
						break;
				}
			} else if (idc == 2) {
				for (uint32_t r = curr_lt & ~curr_st; r; r &= r - 1) {
					pic = ctz32(r);
					if (committed_lti[pic] == (int)num)
						break;
				}
			}
			// insert `pic` at refIdx, shifting the rest down
			int buf = pic, cIdx = refIdx;
			do {
				int swap = sh.RefPicList[l][cIdx];
				sh.RefPicList[l][cIdx] = buf;
				buf = swap;
			} while (++cIdx < sh.num_refs[l] && buf != pic);
		}
		logf("]\n");
	}
	if (log_cb) {
		for (int l = 0; l <= (sh.slice_type == 1 ? 1 : 0); l++) {
			logf(l == 0 ? "  RefPicLists: [[" : "], [");
			for (int i = 0; i < sh.num_refs[l]; i++)
				logf(i == 0 ? "%d" : ",%d", FrameIds[sh.RefPicList[l][i]]);
		}
		logf("]]\n");
	}
}

// §7.4.3.2 explicit weighted prediction
void Decoder::parse_pred_weight_table() {
	int wbi = cpps->weighted_bipred_idc;
	if (sh.slice_type == 0)
		wbi = cpps->weighted_pred_flag;
	sh.weighted_bipred_idc = wbi;
	if (wbi != 1)
		return;
	sh.luma_log2_weight_denom = gb.ue(7);
	sh.chroma_log2_weight_denom = gb.ue(7);
	for (int l = 0; l <= (sh.slice_type == 1 ? 1 : 0); l++) {
		for (int i = 0; i < sh.num_refs[l]; i++) {
			if (gb.u1()) {
				sh.weights[l][i][0] = gb.se(-128, 127);
				sh.offsets[l][i][0] = gb.se(-128, 127);
			} else {
				sh.weights[l][i][0] = 1 << sh.luma_log2_weight_denom;
				sh.offsets[l][i][0] = 0;
			}
			if (gb.u1()) {
				for (int c = 1; c < 3; c++) {
					sh.weights[l][i][c] = gb.se(-128, 127);
					sh.offsets[l][i][c] = gb.se(-128, 127);
				}
			} else {
				sh.weights[l][i][1] = sh.weights[l][i][2] =
					1 << sh.chroma_log2_weight_denom;
				sh.offsets[l][i][1] = sh.offsets[l][i][2] = 0;
			}
		}
	}
}

// 8.2.5.2 gaps in frame_num
void Decoder::handle_frame_gaps(int) {
	int nbv = nal_unit_type == 20;
	uint32_t sv = same_views(nbv);
	int gap = FrameNum - PrevRefFrameNum[nbv];
	if (gap <= 1)
		return;
	int sref_slots = sps.max_num_ref_frames -
		popcount(sv & committed_lt & ~committed_st);
	int non_existing = minv(gap - 1, sref_slots);
	for (int n = non_existing + popcount(sv & committed_st); n > sref_slots; n--) {
		int unref = 0, lowest = INT32_MAX;
		for (uint32_t r = sv & committed_st; r; r &= r - 1) {
			int i = ctz32(r);
			if (FrameNums[i] < lowest) { lowest = FrameNums[i]; unref = i; }
		}
		committed_st &= ~(1u << unref);
		committed_lt &= ~(1u << unref);
	}
	while (non_existing + popcount(dpb_frames() & sv) >
	       sps.max_dec_frame_buffering &&
	       Decoder_bump_frame(*this, nbv, 0)) {}
	uint32_t unavail = unavail_frames();
	for (int fn = FrameNum - non_existing; fn < FrameNum; fn++) {
		if (popcount(unavail) >= 32)
			break;                      // can't happen after ENOBUFS gate
		int i = ctz32(~unavail);
		unavail |= 1u << i;
		committed_st |= 1u << i;
		committed_lt |= 1u << i;        // (1,1) marks non-existing
		non_base = (non_base & ~(1u << i)) | (uint32_t)nbv << i;
		FrameNums[i] = PrevRefFrameNum[nbv] = fn;
		FrameIds[i] = ++prev_frame_id;
		int poc = 0;
		if (sps.pic_order_cnt_type == 2) {
			poc = fn * 2;
		} else if (sps.pic_order_cnt_type == 1 &&
		           sps.num_ref_frames_in_poc_cycle > 0) {
			int n = sps.num_ref_frames_in_poc_cycle;
			poc = (fn / n) * sps.poc_cycle_sum +
				(fn % n ? sps.offset_for_ref_frames[fn % n - 1] : 0);
		}
		Poc[0][i] = Poc[1][i] = poc;
		remaining_mbs[i] = 0;
		complete[i] = 1;                // never decoded; treated as ready
	}
}

// ---------------------------------------------------------------------------
int Decoder::parse_slice() {
	static const char *const type_names[5] = {"P", "B", "I", "SP", "SI"};
	int nbv = nal_unit_type == 20;
	uint32_t sv = same_views(nbv);
	IdrPicFlag = nal_unit_type == 5 || (nbv && !mvc_non_idr);
	sh = SliceHeader();

	sh.first_mb = gb.ue(139263);
	int slice_type = gb.ue(9);
	sh.slice_type = slice_type < 5 ? slice_type : slice_type - 5;
	int ppsid = gb.ue(255);
	logf("  first_mb_in_slice: %u\n  slice_type: %u # %s\n"
	     "  pic_parameter_set_id: %u\n",
	     sh.first_mb, slice_type, type_names[sh.slice_type], ppsid);
	if (sh.slice_type > 2 || ppsid >= 4)
		return E264T_ENOTSUP;
	if (!sps.valid || !pps[ppsid].valid)
		return E264T_EBADMSG;
	cpps = &pps[ppsid];
	sh.pps_id = ppsid;
	sh.num_refs[0] = cpps->num_ref_idx_active[0];
	sh.num_refs[1] = cpps->num_ref_idx_active[1];

	int frame_num = gb.u(sps.log2_max_frame_num);
	frame_num = IdrPicFlag ? 0 : frame_num;
	int idr_pic_id = -1;
	if (IdrPicFlag) {
		idr_pic_id = gb.ue(65535);
		logf("  idr_pic_id: %u\n", idr_pic_id);
	}

	// 7.4.1.2.4 new-frame detection, part 1
	int fn_mask = (1 << sps.log2_max_frame_num) - 1;
	if (curr >= 0 && (frame_num != (FrameNum & fn_mask) ||
	    (nal_ref_idc > 0) != ((curr_st | curr_lt) >> curr & 1) ||
	    (nal_unit_type == 20) != (non_base >> curr & 1) ||
	    idr_pic_id != last_idr_pic_id)) {
		finish_frame();
	}
	last_idr_pic_id = idr_pic_id;

	// 8.2.1 POC
	if (sps.pic_order_cnt_type == 0) {
		int lsb = gb.u(sps.log2_max_poc_lsb);
		int shift = 32 - sps.log2_max_poc_lsb;
		if (curr >= 0 &&
		    lsb != (int)((uint32_t)((uint32_t)TopFOC << shift) >> shift))
			finish_frame();
		int prfn = PrevRefFrameNum[nbv];
		FrameNum = prfn + 1 + ((frame_num - prfn - 1) & fn_mask);
		int prev = prevPicOrderCnt[nbv];
		int inc = (int32_t)((uint32_t)(lsb - prev) << shift) >> shift;
		BottomFOC = TopFOC = prev + inc;
		logf("  pic_order_cnt: {type: 0, bits: %u, absolute: %d",
		     sps.log2_max_poc_lsb, TopFOC);
		if (cpps->bottom_field_pic_order_in_frame_present) {
			BottomFOC += gb.se(INT32_MIN + 1, INT32_MAX);
			logf(", bottom: %d", BottomFOC);
		}
		logf("}\n");
	} else if (sps.pic_order_cnt_type == 1) {
		int delta0 = 0, delta1 = 0;
		if (!sps.delta_pic_order_always_zero) {
			delta0 = gb.se(INT32_MIN + 1, INT32_MAX);
			if (cpps->bottom_field_pic_order_in_frame_present)
				delta1 = gb.se(INT32_MIN + 1, INT32_MAX);
		}
		if (curr >= 0 && delta0 != last_delta_poc0)
			finish_frame();
		last_delta_poc0 = delta0;
		int prfn = PrevRefFrameNum[nbv];
		FrameNum = prfn + 1 + ((frame_num - prfn - 1) & fn_mask);
		int n = sps.num_ref_frames_in_poc_cycle;
		int absFrameNum = n > 0 ? FrameNum : 0;
		absFrameNum -= (nal_ref_idc == 0 && absFrameNum > 0);
		TopFOC = delta0 + (nal_ref_idc ? 0 : sps.offset_for_non_ref_pic);
		if (absFrameNum > 0) {
			TopFOC += ((absFrameNum - 1) / n) * sps.poc_cycle_sum +
				sps.offset_for_ref_frames[(absFrameNum - 1) % n];
		}
		BottomFOC = TopFOC + sps.offset_for_top_to_bottom + delta1;
		logf("  pic_order_cnt: {type: 1, absolute: %d}\n", TopFOC);
	} else {
		int prfn = PrevRefFrameNum[nbv];
		FrameNum = prfn + 1 + ((frame_num - prfn - 1) & fn_mask);
		TopFOC = BottomFOC = FrameNum * 2 + (nal_ref_idc != 0) - 1;
		logf("  pic_order_cnt: {type: 2, absolute: %d}\n", TopFOC);
	}
	logf("  frame_num: {bits: %u, absolute: %u}\n",
	     sps.log2_max_frame_num, FrameNum);

	// gaps in frame_num
	if (FrameNum - PrevRefFrameNum[nbv] > 1) {
		if (curr < 0 &&
		    popcount(unavail_frames()) + (FrameNum - PrevRefFrameNum[nbv] - 1) > 32)
			return E264T_ENOBUFS;
		handle_frame_gaps(frame_num);
	}

	// pick/allocate a slot for the current frame
	if (curr < 0) {
		if (popcount(unavail_frames()) == 32 ||
		    output_fifo[nbv][max_output_latency] >= 0)
			return E264T_ENOBUFS;
		curr = ctz32(~unavail_frames());
		Planes &pl = planes[curr];
		if (pl.mb_w != sps.mb_width || pl.mb_h != sps.mb_height)
			pl.resize(sps.mb_width, sps.mb_height);
		else
			pl.clear_frame();
		non_base = (non_base & ~(1u << curr)) | (uint32_t)nbv << curr;
		FrameIds[curr] = ++prev_frame_id;
		FrameNums[curr] = FrameNum;
		Poc[0][curr] = TopFOC;
		Poc[1][curr] = BottomFOC;
		remaining_mbs[curr] = sps.mb_width * sps.mb_height;
		complete[curr] = 0;
		slice_count[curr] = 0;
		events.push_back({EV_FRAME_START, curr, FrameIds[curr], TopFOC,
		                  IdrPicFlag, 0});
		if (async()) {
			std::unique_lock<std::mutex> lk(mu);
			FrameInflight fi;
			fi.slot = curr;
			fi.frame_id = FrameIds[curr];
			inflight.push_back(std::move(fi));
			entropy_done &= ~(1u << curr);
		}
		logf("  FrameId: %u\n", FrameIds[curr]);
	}

	// staged reference state resets per slice
	curr_st = committed_st & sv;
	curr_lt = committed_lt & sv;
	memcpy(curr_lti, committed_lti, sizeof(curr_lti));

	// P/B-specific header parts
	if (sh.slice_type < 2) {
		if (sh.slice_type == 1) {
			sh.direct_spatial = gb.u1();
			logf("  direct_spatial_mv_pred_flag: %u\n", sh.direct_spatial);
		}
		if (gb.u1()) {   // num_ref_idx_active_override_flag
			sh.num_refs[0] = gb.ue(15) + 1;
			if (sh.slice_type == 1)
				sh.num_refs[1] = gb.ue(15) + 1;
		} else {
			sh.num_refs[0] = minv(sh.num_refs[0], 16);
			sh.num_refs[1] = minv(sh.num_refs[1], 16);
		}
		logf(sh.slice_type ? "  num_ref_idx_active: {l0: %u, l1: %u}\n"
		                   : "  num_ref_idx_active: {l0: %u}\n",
		     sh.num_refs[0], sh.num_refs[1]);
		init_ref_lists();
		parse_ref_pic_list_modification();
		parse_pred_weight_table();
		// a P/B slice whose reference list came up empty (IDR P slices,
		// max_num_ref_frames 0, lost refs) cannot be decoded
		if (sh.RefPicList[0][0] < 0 ||
		    (sh.slice_type == 1 && sh.RefPicList[1][0] < 0) ||
		    (sps.max_num_ref_frames == 0 && nal_unit_type != 20))
			return E264T_EBADMSG;
	}

	if (nal_ref_idc)
		parse_dec_ref_pic_marking();

	sh.cabac_init_idc = 0;
	if (cpps->entropy_coding_mode && sh.slice_type != 2) {
		sh.cabac_init_idc = 1 + gb.ue(2);
		logf("  cabac_init_idc: %u\n", sh.cabac_init_idc - 1);
	}
	sh.qp = cpps->pic_init_qp +
		gb.se(-cpps->pic_init_qp, 51 - cpps->pic_init_qp);
	logf("  slice_qp_delta: %d\n", sh.qp - cpps->pic_init_qp);

	if (cpps->deblocking_filter_control_present) {
		sh.disable_deblocking_filter_idc = gb.ue(2);
		if (sh.disable_deblocking_filter_idc != 1) {
			sh.alpha_c0_offset = gb.se(-6, 6) * 2;
			sh.beta_offset = gb.se(-6, 6) * 2;
		}
		logf("  disable_deblocking_filter_idc: %u\n",
		     sh.disable_deblocking_filter_idc);
	} else {
		sh.disable_deblocking_filter_idc = 0;
		sh.alpha_c0_offset = sh.beta_offset = 0;
	}

	// C.4.5: insert the current frame into the DPB, bumping as needed
	if (!(to_get & 1u << curr)) {
		int max_bump = sps.max_num_ref_frames;
		if (!nal_ref_idc) {
			max_bump = 0;
			for (uint32_t o = to_get & ~outputq & sv; o; o &= o - 1)
				max_bump += Poc[0][ctz32(o)] < TopFOC;
		}
		while (popcount(dpb_frames() & sv) >= sps.max_dec_frame_buffering &&
		       max_bump-- > 0)
			Decoder_bump_frame(*this, nbv, 0);
		to_get |= 1u << curr;
		if (max_bump < 0) {
			outputq |= 1u << curr;
			int8_t *q = output_fifo[nbv];
			for (int i = MAX_SLOTS - 1; i > 0; i--)
				q[i] = q[i - 1];
			q[0] = curr;
		} else if (popcount(to_get & ~outputq & sv) >
		           sps.max_num_reorder_frames) {
			Decoder_bump_frame(*this, nbv, 0);
		}
		if (log_cb) {
			logf("  DecodedPictureBuffer:\n");
			uint32_t srefs = (committed_st & ~sv) | curr_st;
			uint32_t lrefs = (committed_lt & ~sv) | curr_lt;
			uint32_t outable = to_get & ~outputq;
			uint32_t all = srefs | lrefs | outable;
			for (int i = 0; (all >> i) != 0 && i < 32; i++) {
				if (!(all >> i & 1))
					continue;
				logf("  - {id: %u", FrameIds[i]);
				if ((srefs | lrefs) & 1u << i)
					logf(!(lrefs & 1u << i) ? ", sref: %u"
					     : !(srefs & 1u << i) ? ", lref: %u" : ", nref: %u",
					     srefs & 1u << i ? FrameNums[i] : curr_lti[i]);
				if (outable & 1u << i)
					logf(", poc: %d", minv(Poc[0][i], Poc[1][i]));
				logf("}\n");
			}
		}
	}

	// resolve the effective scaling matrices for this slice (§7.4.2.1.1.1
	// fall-back rule B: absent PPS lists chain to the previous list, with
	// lists 0/3 inheriting the active SPS lists)
	{
		Planes &pl = planes[curr];
		if (!cpps->pic_scaling_matrix_present) {
			// no PPS matrices: the SPS lists apply as-is
			memcpy(pl.sm4, sps.weightScale4x4, sizeof(pl.sm4));
			memcpy(pl.sm8[0], sps.weightScale8x8[0], 64);
			memcpy(pl.sm8[1], sps.weightScale8x8[1], 64);
		} else
		for (int i = 0; i < 6; i++) {
			const uint8_t *src = cpps->weightScale4x4[i];
			bool absent = true;
			for (int j = 0; j < 16 && absent; j++)
				absent = src[j] == 0;
			if (!absent)
				memcpy(pl.sm4[i], src, 16);
			else if (i == 0 || i == 3)
				memcpy(pl.sm4[i], sps.weightScale4x4[i], 16);
			else
				memcpy(pl.sm4[i], pl.sm4[i - 1], 16);
		}
		if (cpps->pic_scaling_matrix_present)
		for (int i = 0; i < 2; i++) {
			const uint8_t *src = cpps->weightScale8x8[i];
			bool absent = true;
			for (int j = 0; j < 64 && absent; j++)
				absent = src[j] == 0;
			if (!absent)
				memcpy(pl.sm8[i], src, 64);
			else
				memcpy(pl.sm8[i], sps.weightScale8x8[i], 64);
		}
	}

	// parse the slice data into the syntax planes (via a Task snapshot,
	// the reference's initialize_task analog, edge264_headers.c:895-945)
	slice_count[curr]++;
	logf(cpps->entropy_coding_mode ? "  macroblocks_cabac:\n"
	                               : "  macroblocks_cavlc:\n");
	if (async()) {
		enqueue_task();          // worker threads parse; events at retirement
		return 0;
	}
	init_task(stask);
	int64_t t_start = relative_time_us();
	int err = stask.run();
	int64_t t_end = relative_time_us();
	rbsp.swap(stask.rbsp);       // reclaim the buffer for the next NAL
	{	// merge task-buffered dirty-block records (kept task-local so
		// concurrent slices of one frame never touch the shared list)
		auto &dirty = planes[curr].dirty;
		dirty.insert(dirty.end(), stask.dirty_local.begin(),
		             stask.dirty_local.end());
		stask.dirty_local.clear();
	}
	// per-slice timing block, reference log parity
	// (edge264_headers.c:571-583; consumed by tools/analysis/to_trace_event.py)
	logf("  slice_timing:\n    thread_id: 0\n    frame_id: %u\n"
	     "    slice_type: %u\n    first_mb_in_slice: %u\n"
	     "    approx_byte_size: %u\n    decoding_start_us: %lld\n"
	     "    decoding_end_us: %lld\n",
	     FrameIds[curr], sh.slice_type, sh.first_mb,
	     (unsigned)((stask.gb.consumed() + 7) / 8),
	     (long long)t_start, (long long)t_end);
	events.push_back({EV_SLICE_DONE, curr, sh.first_mb, 0, sh.slice_type, err});
	if (remaining_mbs[curr] <= 0 && !complete[curr]) {
		complete[curr] = 1;
		// b bit0 = is-reference; bit1 = MVC base-view frame (the paired
		// non-base view may inter-view reference it even when non-ref,
		// edge264_headers.c:784-785) -- consumers keep b!=0 frames in
		// their device reference stores
		int32_t keep = (int32_t)((curr_st | curr_lt) >> curr & 1) |
			(ssps.valid && !(non_base >> curr & 1) ? 2 : 0);
		events.push_back({EV_FRAME_DONE, curr, FrameIds[curr], keep,
		                  0, 0});
	}
	return 0;
}

// Snapshot everything the slice-data parse needs.  The bitstream buffer
// moves into the task (swap — the heap block keeps its address, so the
// copied BitReader's pointers stay valid).
void Decoder::init_task(Task &t) {
	t.sh = sh;
	t.pps_storage = *cpps;
	t.cpps = &t.pps_storage;
	t.sps = sps;
	t.curr = curr;
	memcpy(t.Poc, Poc, sizeof(Poc));
	t.curr_st = curr_st;
	t.curr_lt = curr_lt;
	t.planes = planes;
	t.remaining_mbs = remaining_mbs;
	t.mb_qp_delta_nz = 0;
	// ids 0xFFFE/0xFFFF are reserved (concealment pseudo-slice / the
	// unclaimed sentinel); a >65533-slice frame saturates and its tail
	// slices abort as duplicates, which only loses pathological streams
	t.slice_idx = slice_count[curr] < 0xFFFE ? slice_count[curr] : 0xFFFD;
	t.logdec = log_cb ? this : nullptr;
	t.dirty_local.clear();
	t.log_mbs = log_mbs;
	t.dep_slot = sh.slice_type == 1 ? sh.RefPicList[1][0] : -1;
	t.err = 0;
	t.rbsp.swap(rbsp);
	t.gb = gb;
}

int Task::run() {
	return cpps->entropy_coding_mode ? parse_slice_data_cabac()
	                                 : parse_slice_data_cavlc();
}


// ---------------------------------------------------------------------------
// Error concealment (recover_slice analog, edge264_headers.c:295-430):
// unparsed macroblocks of a partially decoded frame are reconstructed as
// temporal copies (Skip with zero motion from the closest reference) or
// intra DC when no reference exists, and flagged in the mb_errors plane.
void Decoder::conceal_frame() {
	uint32_t sv = same_views(non_base >> curr & 1);
	uint32_t refs = (curr_st | curr_lt) & sv & ~(1u << curr);
	int refslot = -1, best = INT32_MIN;
	for (uint32_t r = refs; r; r &= r - 1) {
		int i = __builtin_ctz(r);
		if (FrameNums[i] > best) { best = FrameNums[i]; refslot = i; }
	}
	conceal_frame_at(curr, sh.qp, cpps ? cpps->chroma_qp_index_offset : 0,
	                 cpps ? cpps->second_chroma_qp_index_offset : 0, refslot);
}

// Parameterized body, callable after the fact from the task pool (the
// seal-time snapshot supplies what sh/cpps held when the frame was current).
void Decoder::conceal_frame_at(int slot, int qp, int cqpo, int cqpo2,
                               int refslot) {
	Planes &pl = planes[slot];
	pl.dirty_all = true;   // concealment writes planes wholesale
	int W = pl.mb_w, H = pl.mb_h;
	int BW = W * 4;
	for (int my = 0; my < H; my++) {
		for (int mx = 0; mx < W; mx++) {
			size_t mbi = (size_t)my * W + mx;
			if (pl.mb_flags[mbi] & MBF_PARSED)
				continue;
			pl.mb_errors[mbi] = 100;
			pl.qp[mbi * 4] = (int8_t)qp;
			pl.qp[mbi * 4 + 1] = (int8_t)chroma_qp(qp, cqpo);
			pl.qp[mbi * 4 + 2] = (int8_t)chroma_qp(qp, cqpo2);
			pl.deblock[mbi] = 0;
			pl.slice_id[mbi] = 0xFFFE;     // concealment pseudo-slice
			if (refslot >= 0) {
				pl.mb_flags[mbi] = MBF_INTER | MBF_SKIP | MBF_PARSED;
				for (int dy = 0; dy < 4; dy++)
					for (int dx = 0; dx < 4; dx++) {
						size_t c = (size_t)(my * 4 + dy) * BW + mx * 4 + dx;
						pl.refslot[c * 2] = (int8_t)refslot;
						pl.refpoc_idx[c * 2] = 0;
						pl.mvs[c * 2 * 2] = 0;
						pl.mvs[c * 2 * 2 + 1] = 0;
					}
			} else {
				pl.mb_flags[mbi] = MBF_INTRA | MBF_I16x16 | MBF_PARSED;
				int aA = mx > 0;     // raster neighbours reconstruct first
				int aB = my > 0;
				pl.i16_modes[mbi] = (uint8_t)(2 | aA << 4 | aB << 5);
				pl.ch_modes[mbi] = (uint8_t)(0 | aA << 4 | aB << 5);
			}
			remaining_mbs[slot]--;
		}
	}
	if (remaining_mbs[slot] < 0)
		remaining_mbs[slot] = 0;
}

} // namespace e264t

// Native arena pack: the host->device syntax-plane arena is assembled in
// C++ with the GIL released (ctypes drops it for the call duration), so
// the lockstep driver's main thread no longer starves the background D2H
// fetcher that drives device execution (the reference's analogous
// pipelining: deblock trailing parse "while in cache",
// edge264_slice.c:1810-1820; here the pipelined resource is the tunnel).
//
// Mirrors edge264_tpu/ops/jaxdec.py pack_into() byte-for-byte:
//   dense   entries copy a whole plane (optionally narrowing int16->int8
//           for the coefficient planes when every level fits, ~37% less
//           H2D volume)
//   gat     entries ship only CODED rows: a U-bit little-endian bitmap +
//           a [rows, row_elems] table, indexed from the entropy pass's
//           dirty-block records (lazy-clear bookkeeping, so free)
//   baseexc entries ship per-4x4-cell planes (mvs/refslot) as a per-mb
//           base (cell 0) + full exception rows for mbs whose cells are
//           not uniform (sub-mb partitions)
#include "e264t.h"

#include <algorithm>
#include <cstring>

using namespace e264t;

namespace {

const int ROW_ELEMS[6] = {16, 64, 16, 8, 16, 16};   // DP_* tag -> elems

struct Src {
	const void *ptr;
	int item;          // source element bytes
	int64_t elems;
};

// key order MUST match jaxdec.PLANE_KEYS
Src plane_src(Planes &p, int key) {
	switch (key) {
	case 0:  return {p.mb_flags.data(), 4, (int64_t)p.mb_flags.size()};
	case 1:  return {p.qp.data(), 1, (int64_t)p.qp.size()};
	case 2:  return {p.i4_modes.data(), 1, (int64_t)p.i4_modes.size()};
	case 3:  return {p.i16_modes.data(), 1, (int64_t)p.i16_modes.size()};
	case 4:  return {p.i8_modes.data(), 1, (int64_t)p.i8_modes.size()};
	case 5:  return {p.ch_modes.data(), 1, (int64_t)p.ch_modes.size()};
	case 6:  return {p.coef_y.data(), 2, (int64_t)p.coef_y.size()};
	case 7:  return {p.coef_y8.data(), 2, (int64_t)p.coef_y8.size()};
	case 8:  return {p.coef_y_dc.data(), 2, (int64_t)p.coef_y_dc.size()};
	case 9:  return {p.coef_c_dc.data(), 2, (int64_t)p.coef_c_dc.size()};
	case 10: return {p.coef_cb.data(), 2, (int64_t)p.coef_cb.size()};
	case 11: return {p.coef_cr.data(), 2, (int64_t)p.coef_cr.size()};
	case 12: return {p.pcm_y.data(), 1, (int64_t)p.pcm_y.size()};
	case 13: return {p.pcm_c.data(), 1, (int64_t)p.pcm_c.size()};
	case 14: return {p.nz_y.data(), 1, (int64_t)p.nz_y.size()};
	case 15: return {p.refslot.data(), 1, (int64_t)p.refslot.size()};
	case 16: return {p.mvs.data(), 2, (int64_t)p.mvs.size()};
	case 17: return {p.deblock.data(), 1, (int64_t)p.deblock.size()};
	case 18: return {p.deblock_ab.data(), 1, (int64_t)p.deblock_ab.size()};
	case 19: return {p.wp.data(), 1, (int64_t)p.wp.size()};
	case 20: return {p.wp8.data(), 1, (int64_t)p.wp8.size()};
	case 21: return {p.mb_errors.data(), 1, (int64_t)p.mb_errors.size()};
	case 22: return {p.slice_id.data(), 2, (int64_t)p.slice_id.size()};
	}
	return {nullptr, 0, 0};
}

// copy n elements, narrowing int16 -> int8 when dst_item < src_item
// (only the coefficient planes take this path; the caller has verified
// every level fits via the probe's coef8_ok)
void copy_elems(uint8_t *dst, const void *src, int64_t n, int src_item,
                int dst_item) {
	if (src_item == dst_item) {
		memcpy(dst, src, (size_t)n * src_item);
	} else {                                     // 2 -> 1
		const int16_t *s = (const int16_t *)src;
		for (int64_t i = 0; i < n; i++)
			dst[i] = (uint8_t)(int8_t)s[i];
	}
}

}  // namespace

extern "C" {

struct E264tPackEntry {
	int32_t key;        // PLANE_KEYS index
	int32_t kind;       // 0 dense, 2 gathered, 3 base+exception
	int32_t dst_item;   // destination element bytes
	int32_t be;         // base+exc: elements per 4x4 cell
	int64_t off;        // dense: destination byte offset
	int64_t bm_off, tab_off, base_off;
	int64_t rows, row_elems, U;
};

struct E264tPackProbe {
	int64_t gat_counts[6];
	int64_t exc_counts[2];     // mvs, refslot (-1 when not scanned)
	int32_t coef8_ok;
	int32_t dirty_all;
};

// Scan the dirty list into per-tag sorted unique row lists (cached on
// the slot), range-check the coded coefficient rows for int8, and (when
// want_exc) find split macroblocks for the base+exception planes.
int e264t_pack_probe(void *h, int slot, int want_exc,
                     E264tPackProbe *out) {
	Decoder *d = (Decoder *)h;
	if (slot < 0 || slot >= Decoder::MAX_SLOTS)
		return -1;
	Planes &p = d->planes[slot];
	memset(out, 0, sizeof(*out));
	out->dirty_all = p.dirty_all ? 1 : 0;
	out->exc_counts[0] = out->exc_counts[1] = -1;
	if (p.dirty_all) {
		// no row list to trust (a recovery cleared ranges wholesale):
		// caller packs dense, but coef8 can still be decided by a full
		// scan here (C speed; the planes are about to be read anyway)
		p.pack_valid = p.pack_exc_valid = false;
		const std::vector<int16_t> *all[6] = {
			&p.coef_y, &p.coef_y8, &p.coef_y_dc, &p.coef_c_dc,
			&p.coef_cb, &p.coef_cr};
		int ok = 1;
		for (int t = 0; t < 6 && ok; t++)
			for (int16_t v : *all[t])
				if (v < -128 || v > 127) {
					ok = 0;
					break;
				}
		out->coef8_ok = ok;
		return 0;
	}
	for (int t = 0; t < 6; t++)
		p.pack_rows[t].clear();
	for (uint64_t rec : p.dirty) {
		int tag = (int)(rec >> 48);
		int64_t off = (int64_t)(rec & ((1ULL << 48) - 1));
		if (tag >= 0 && tag < 6)
			p.pack_rows[tag].push_back((int32_t)(off / ROW_ELEMS[tag]));
	}
	const int16_t *coef[6] = {p.coef_y.data(), p.coef_y8.data(),
	                          p.coef_y_dc.data(), p.coef_c_dc.data(),
	                          p.coef_cb.data(), p.coef_cr.data()};
	int coef8 = 1;
	for (int t = 0; t < 6; t++) {
		auto &v = p.pack_rows[t];
		std::sort(v.begin(), v.end());
		v.erase(std::unique(v.begin(), v.end()), v.end());
		out->gat_counts[t] = (int64_t)v.size();
		if (coef8) {
			for (int32_t r : v) {
				const int16_t *row = coef[t] + (int64_t)r * ROW_ELEMS[t];
				for (int i = 0; i < ROW_ELEMS[t]; i++) {
					if (row[i] < -128 || row[i] > 127) {
						coef8 = 0;
						break;
					}
				}
				if (!coef8)
					break;
			}
		}
	}
	out->coef8_ok = coef8;
	p.pack_valid = true;
	p.pack_exc_valid = false;
	if (want_exc) {
		int W = p.mb_w, H = p.mb_h;
		// mvs: [4H][4W][2][2] int16 -> 8 bytes per 4x4 cell
		p.pack_exc[0].clear();
		const uint64_t *mv = (const uint64_t *)p.mvs.data();
		for (int my = 0; my < H; my++) {
			for (int mx = 0; mx < W; mx++) {
				uint64_t c0 = mv[(int64_t)(my * 4) * (4 * W) + mx * 4];
				bool uni = true;
				for (int cy = 0; cy < 4 && uni; cy++) {
					const uint64_t *row =
						mv + (int64_t)(my * 4 + cy) * (4 * W) + mx * 4;
					uni = row[0] == c0 && row[1] == c0 &&
					      row[2] == c0 && row[3] == c0;
				}
				if (!uni)
					p.pack_exc[0].push_back(my * W + mx);
			}
		}
		// refslot: [4H][4W][2] int8 -> 2 bytes per cell
		p.pack_exc[1].clear();
		const uint16_t *rs = (const uint16_t *)p.refslot.data();
		for (int my = 0; my < H; my++) {
			for (int mx = 0; mx < W; mx++) {
				uint16_t c0 = rs[(int64_t)(my * 4) * (4 * W) + mx * 4];
				bool uni = true;
				for (int cy = 0; cy < 4 && uni; cy++) {
					const uint16_t *row =
						rs + (int64_t)(my * 4 + cy) * (4 * W) + mx * 4;
					uni = row[0] == c0 && row[1] == c0 &&
					      row[2] == c0 && row[3] == c0;
				}
				if (!uni)
					p.pack_exc[1].push_back(my * W + mx);
			}
		}
		out->exc_counts[0] = (int64_t)p.pack_exc[0].size();
		out->exc_counts[1] = (int64_t)p.pack_exc[1].size();
		p.pack_exc_valid = true;
	}
	return 0;
}

// Execute a pack plan (entries in ascending-offset layout order) into
// one arena row.  Gap bytes between entries are zeroed exactly like
// jaxdec.pack_into.
int e264t_pack_row(void *h, int slot, const E264tPackEntry *es, int n,
                   uint8_t *out, int64_t out_len) {
	Decoder *d = (Decoder *)h;
	if (slot < 0 || slot >= Decoder::MAX_SLOTS)
		return -1;
	Planes &p = d->planes[slot];
	int64_t prev_end = 0;
	for (int i = 0; i < n; i++) {
		const E264tPackEntry &e = es[i];
		Src s = plane_src(p, e.key);
		if (!s.ptr)
			return -2;
		if (e.kind == 0) {                     // dense
			if (e.off > prev_end)
				memset(out + prev_end, 0, (size_t)(e.off - prev_end));
			copy_elems(out + e.off, s.ptr, s.elems, s.item, e.dst_item);
			prev_end = e.off + s.elems * e.dst_item;
		} else if (e.kind == 2) {              // gathered rows
			if (!p.pack_valid)
				return -3;
			int tag = -1;
			switch (e.key) {
			case 6: tag = 0; break;
			case 7: tag = 1; break;
			case 8: tag = 2; break;
			case 9: tag = 3; break;
			case 10: tag = 4; break;
			case 11: tag = 5; break;
			default: return -4;
			}
			auto &rows = p.pack_rows[tag];
			if ((int64_t)rows.size() > e.rows)
				return -5;
			if (e.bm_off > prev_end)
				memset(out + prev_end, 0, (size_t)(e.bm_off - prev_end));
			memset(out + e.bm_off, 0, (size_t)(e.tab_off - e.bm_off));
			for (int32_t r : rows)
				out[e.bm_off + (r >> 3)] |= (uint8_t)(1 << (r & 7));
			uint8_t *tab = out + e.tab_off;
			int64_t rb = e.row_elems * e.dst_item;
			for (size_t k = 0; k < rows.size(); k++)
				copy_elems(tab + (int64_t)k * rb,
				           (const uint8_t *)s.ptr +
				               (int64_t)rows[k] * e.row_elems * s.item,
				           e.row_elems, s.item, e.dst_item);
			prev_end = e.tab_off + e.rows * rb;
			memset(tab + (int64_t)rows.size() * rb, 0,
			       (size_t)((e.rows - (int64_t)rows.size()) * rb));
		} else if (e.kind == 3) {              // base + exception rows
			if (!p.pack_exc_valid)
				return -3;
			int xi = e.key == 16 ? 0 : e.key == 15 ? 1 : -1;
			if (xi < 0)
				return -4;
			auto &exc = p.pack_exc[xi];
			if ((int64_t)exc.size() > e.rows)
				return -5;
			int W = p.mb_w, H = p.mb_h;
			int64_t cell_b = (int64_t)e.be * s.item;   // src == dst dtype
			if (e.base_off > prev_end)
				memset(out + prev_end, 0,
				       (size_t)(e.base_off - prev_end));
			uint8_t *base = out + e.base_off;
			const uint8_t *src = (const uint8_t *)s.ptr;
			for (int my = 0; my < H; my++)
				for (int mx = 0; mx < W; mx++)
					memcpy(base + ((int64_t)my * W + mx) * cell_b,
					       src + ((int64_t)(my * 4) * (4 * W) + mx * 4) *
					           cell_b,
					       (size_t)cell_b);
			int64_t base_end = e.base_off + (int64_t)H * W * cell_b;
			memset(out + base_end, 0, (size_t)(e.bm_off - base_end));
			memset(out + e.bm_off, 0, (size_t)(e.tab_off - e.bm_off));
			for (int32_t m : exc)
				out[e.bm_off + (m >> 3)] |= (uint8_t)(1 << (m & 7));
			uint8_t *tab = out + e.tab_off;
			int64_t mb_b = 16 * cell_b;
			for (size_t k = 0; k < exc.size(); k++) {
				int my = exc[k] / W, mx = exc[k] % W;
				for (int cy = 0; cy < 4; cy++)
					memcpy(tab + (int64_t)k * mb_b +
					           (int64_t)cy * 4 * cell_b,
					       src + ((int64_t)(my * 4 + cy) * (4 * W) +
					              mx * 4) * cell_b,
					       (size_t)(4 * cell_b));
			}
			prev_end = e.tab_off + e.rows * mb_b;
			memset(tab + (int64_t)exc.size() * mb_b, 0,
			       (size_t)((e.rows - (int64_t)exc.size()) * mb_b));
		} else {
			return -6;
		}
		if (prev_end > out_len)
			return -7;
	}
	return 0;
}

}  // extern "C"

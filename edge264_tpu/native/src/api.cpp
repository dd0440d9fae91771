// C ABI for the ctypes binding (edge264_tpu/native/__init__.py).
// Mirrors the reference's public entry points (edge264.h:64-70) at the
// syntax level; sample memory lives on the device, so get_frame returns a
// DPB slot index instead of plane pointers.
#include "e264t.h"

using namespace e264t;

extern "C" {

struct E264tEvent {
	int32_t kind, slot, a, b, c, d;
};

// plane pointer/size table filled by e264t_planes
struct E264tPlanes {
	int32_t mb_w, mb_h;
	void *mb_flags, *qp, *i4_modes, *i16_modes, *i8_modes, *ch_modes;
	void *nz_y, *nz_c;
	void *coef_y, *coef_y8, *coef_y_dc, *coef_c_dc, *coef_cb, *coef_cr;
	void *mvs, *refslot, *pcm_y, *pcm_c, *deblock, *deblock_ab, *wp;
	void *slice_id, *wp8, *sm4, *sm8, *mb_errors;
};

void *e264t_alloc(void) {
	Decoder *d = new Decoder();
	d->flush();
	return d;
}

void e264t_free(void *h) { delete (Decoder *)h; }

void e264t_flush(void *h) { ((Decoder *)h)->flush(); }

int e264t_decode_nal(void *h, const uint8_t *buf, size_t len) {
	return ((Decoder *)h)->decode_nal(buf, len);
}

// configure the frame-task worker pool (before the first decode_nal):
// 0 synchronous, n>1 = n worker threads, <0 = one per hw thread (cap 16)
void e264t_set_threads(void *h, int n) {
	((Decoder *)h)->set_threads(n);
}

// block until the oldest queued output frame is complete (ENOBUFS retry
// path with the task pool); 0 = a frame should be gettable, -1 = no tasks
// in flight (the stall is not task-related)
int e264t_wait_frame(void *h) {
	return ((Decoder *)h)->wait_frame();
}

// drain one pending event; returns 1 if an event was written
int e264t_poll(void *h, E264tEvent *ev) {
	Decoder *d = (Decoder *)h;
	if (d->async()) {
		std::unique_lock<std::mutex> lk(d->mu);
		d->retire_frames();
	}
	if (d->events.empty())
		return 0;
	Event e = d->events.front();
	d->events.erase(d->events.begin());
	ev->kind = e.kind; ev->slot = e.slot;
	ev->a = e.a; ev->b = e.b; ev->c = e.c; ev->d = e.d;
	return 1;
}

int e264t_planes(void *h, int slot, E264tPlanes *out) {
	Decoder *d = (Decoder *)h;
	if (slot < 0 || slot >= Decoder::MAX_SLOTS)
		return -1;
	Planes &p = d->planes[slot];
	out->mb_w = p.mb_w; out->mb_h = p.mb_h;
	out->mb_flags = p.mb_flags.data();
	out->qp = p.qp.data();
	out->i4_modes = p.i4_modes.data();
	out->i16_modes = p.i16_modes.data();
	out->i8_modes = p.i8_modes.data();
	out->ch_modes = p.ch_modes.data();
	out->nz_y = p.nz_y.data();
	out->nz_c = p.nz_c.data();
	out->coef_y = p.coef_y.data();
	out->coef_y8 = p.coef_y8.data();
	out->coef_y_dc = p.coef_y_dc.data();
	out->coef_c_dc = p.coef_c_dc.data();
	out->coef_cb = p.coef_cb.data();
	out->coef_cr = p.coef_cr.data();
	out->mvs = p.mvs.data();
	out->refslot = p.refslot.data();
	out->pcm_y = p.pcm_y.data();
	out->pcm_c = p.pcm_c.data();
	out->deblock = p.deblock.data();
	out->deblock_ab = p.deblock_ab.data();
	out->wp = p.wp.data();
	out->slice_id = p.slice_id.data();
	out->wp8 = p.wp8.data();
	out->sm4 = p.sm4;
	out->sm8 = p.sm8;
	out->mb_errors = p.mb_errors.data();
	return 0;
}

// Expose one frame's dirty-block records (tag<<48 | element offset, one
// per coded coefficient block — the entropy pass records them for lazy
// clearing, so this is free).  Valid until the slot's planes are
// cleared at its next reuse.  *all_out = 1 when the list is unreliable
// (dirty_all: a recovery cleared ranges wholesale) — callers must then
// treat every block as potentially coded.
int e264t_dirty(void *h, int slot, const uint64_t **ptr, size_t *len,
                int *all_out) {
	Decoder *d = (Decoder *)h;
	if (slot < 0 || slot >= Decoder::MAX_SLOTS)
		return -1;
	Planes &p = d->planes[slot];
	*ptr = p.dirty.data();
	*len = p.dirty.size();
	*all_out = p.dirty_all ? 1 : 0;
	return 0;
}

// frame geometry of the active SPS: [mb_w, mb_h, crop l/r/t/b, chroma_idc,
// num_units_in_tick, time_scale] (VUI timing, 0 when absent)
void e264t_format(void *h, int32_t *out9) {
	Decoder *d = (Decoder *)h;
	out9[0] = d->sps.mb_width;
	out9[1] = d->sps.mb_height;
	out9[2] = d->sps.crop_left;
	out9[3] = d->sps.crop_right;
	out9[4] = d->sps.crop_top;
	out9[5] = d->sps.crop_bottom;
	out9[6] = d->sps.chroma_format_idc;
	out9[7] = (int32_t)d->sps.num_units_in_tick;
	out9[8] = (int32_t)d->sps.time_scale;
}

// returns 0 and fills slot/slot_mvc/frame ids, or -1 if no frame ready
int e264t_get_frame(void *h, int borrow, int32_t *out4) {
	Decoder *d = (Decoder *)h;
	int slot, slot_mvc;
	if (d->get_frame(&slot, &slot_mvc) != 0)
		return -1;
	out4[0] = slot;
	out4[1] = slot_mvc;
	out4[2] = slot >= 0 ? d->FrameIds[slot] : -1;
	out4[3] = slot_mvc >= 0 ? d->FrameIds[slot_mvc] : -1;
	if (!borrow) {
		if (slot >= 0) d->return_frame(slot);
		if (slot_mvc >= 0) d->return_frame(slot_mvc);
	}
	return 0;
}

void e264t_return_frame(void *h, int slot) {
	((Decoder *)h)->return_frame(slot);
}

// retrieve and clear the YAML log accumulated by the last decode_nal
size_t e264t_get_log(void *h, char *buf, size_t cap) {
	Decoder *d = (Decoder *)h;
	size_t n = d->logbuf.size() < cap ? d->logbuf.size() : cap;
	memcpy(buf, d->logbuf.data(), n);
	d->logbuf.clear();    // consumed: the next poll must not re-deliver
	return n;
}

void e264t_set_logging(void *h, int enable, int mbs) {
	Decoder *d = (Decoder *)h;
	// the callback pointer doubles as an "enabled" flag
	d->log_cb = enable ? (void (*)(const char *, void *))1 : nullptr;
	d->log_mbs = mbs != 0;
}

// per-slot metadata: poc, frame_num, complete, used_as_ref
void e264t_slot_info(void *h, int slot, int32_t *out4) {
	Decoder *d = (Decoder *)h;
	out4[0] = d->Poc[0][slot];
	out4[1] = d->FrameNums[slot];
	out4[2] = d->complete[slot];
	out4[3] = ((d->committed_st | d->committed_lt) >> slot) & 1;
}

} // extern "C"

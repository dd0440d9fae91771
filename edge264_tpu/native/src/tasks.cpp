// Frame-task worker pool: slices of different frames entropy-decode
// concurrently on worker threads, mirroring the reference's task scheduler
// (worker_loop edge264_headers.c:450-603) with its dependency gating
// (task_dependencies vs ready_frames, edge264_internal.h:1211-1226).
//
// The TPU build needs only ENTROPY dependencies here (pixels are decoded on
// the device from completed syntax planes), so the dependency graph is much
// sparser than the reference's: P/I slices depend on nothing, a B slice's
// task waits only for its colocated frame (RefPicList[1][0]) whose mv/ref
// planes temporal/spatial direct prediction reads (§8.4.1.2.2-3).
//
// Event ordering contract: EV_SLICE_DONE / EV_FRAME_DONE are emitted at
// frame RETIREMENT, in frame-start order, so the consumer sees the exact
// event sequence of synchronous mode and reference-frame pixels are always
// reconstructed before their dependents' device steps are issued.
#include "e264t.h"

namespace e264t {

void Decoder::set_threads(int n) {
	if (n < 0) {
		unsigned hw = std::thread::hardware_concurrency();
		n = hw ? (int)hw : 1;
	}
	if (n > 16)
		n = 16;          // reference cap (edge264.c:230)
	if (n == n_threads || !workers.empty())
		return;          // no dynamic resizing once started
	n_threads = n;
	if (n_threads <= 1) {  // 1 worker buys nothing over sync: stay sync
		n_threads = n_threads < 0 ? 0 : n_threads;
		if (n_threads == 1)
			n_threads = 0;
		return;
	}
	workers.reserve(n_threads);
	for (int i = 0; i < n_threads; i++)
		workers.emplace_back([this] { worker_loop(); });
}

Decoder::~Decoder() {
	{
		std::unique_lock<std::mutex> lk(mu);
		stop_pool = true;
	}
	cv_ready.notify_all();
	for (auto &w : workers)
		w.join();
	for (Task *t : task_free)
		delete t;
	for (Task *t : task_queue)
		delete t;
}

// Claim + run tasks until shutdown.  A task is runnable when its
// colocated dependency, if any, is fully parsed.  Slices of ONE frame run
// CONCURRENTLY (the reference's intra-frame slice parallelism,
// edge264_headers.c:539-568): their mb ranges are disjoint by
// first_mb_in_slice, per-mb ownership is enforced by the atomic slice_id
// claim (MbCtx::claim_mb), and entropy contexts never cross slices.
void Decoder::worker_loop() {
	std::unique_lock<std::mutex> lk(mu);
	while (true) {
		Task *t = nullptr;
		for (auto it = task_queue.begin(); it != task_queue.end(); ++it) {
			Task *c = *it;
			if (c->dep_slot >= 0 && !(entropy_done >> c->dep_slot & 1))
				continue;
			t = c;
			task_queue.erase(it);
			break;
		}
		if (!t) {
			if (stop_pool)
				return;
			cv_ready.wait(lk);
			continue;
		}
		lk.unlock();
		t->err = t->run();
		lk.lock();
		// merge the task-buffered dirty-block records into the slot's
		// shared list (concurrent same-slot tasks may not touch it live)
		auto &dirty = planes[t->curr].dirty;
		dirty.insert(dirty.end(), t->dirty_local.begin(),
		             t->dirty_local.end());
		t->dirty_local.clear();
		task_finished(t);
		// another queued task may have been unblocked by this completion
		cv_ready.notify_all();
		cv_done.notify_all();
	}
}

// under mu
void Decoder::task_finished(Task *t) {
	for (auto &fi : inflight) {
		if (fi.slot == t->curr && !fi.finalized) {
			fi.tasks_pending--;
			// concurrent slices finish in any order: keep the event list
			// sorted by first_mb so consumers see the synchronous order
			Event e{EV_SLICE_DONE, t->curr, t->sh.first_mb, 0,
			        t->sh.slice_type, t->err};
			auto pos = fi.done_events.begin();
			while (pos != fi.done_events.end() && pos->a <= e.a)
				++pos;
			fi.done_events.insert(pos, e);
			task_free.push_back(t);
			maybe_finalize(fi);
			return;
		}
	}
	task_free.push_back(t);   // frame was discarded (shouldn't happen)
}

// under mu: all tasks done + sealed -> conceal holes, publish entropy_done
// (B dependencies may proceed; events wait for in-order retirement)
void Decoder::maybe_finalize(FrameInflight &fi) {
	if (fi.finalized || !fi.sealed || fi.tasks_pending > 0)
		return;
	if (remaining_mbs[fi.slot] > 0)
		conceal_frame_at(fi.slot, fi.conceal_qp, fi.conceal_cqpo,
		                 fi.conceal_cqpo2, fi.conceal_ref);
	fi.finalized = true;
	entropy_done |= 1u << fi.slot;
	cv_done.notify_all();
}

// under mu: emit the head frames' events in start order
void Decoder::retire_frames() {
	while (!inflight.empty() && inflight.front().finalized) {
		FrameInflight &fi = inflight.front();
		for (const Event &e : fi.done_events)
			events.push_back(e);
		complete[fi.slot] = 1;
		events.push_back({EV_FRAME_DONE, fi.slot, fi.frame_id,
		                  fi.is_ref, 0, 0});
		inflight.pop_front();
	}
}

// Snapshot the current slice into a pooled task and queue it.
void Decoder::enqueue_task() {
	std::unique_lock<std::mutex> lk(mu);
	Task *t;
	if (!task_free.empty()) {
		t = task_free.back();
		task_free.pop_back();
	} else {
		t = new Task();
	}
	lk.unlock();
	init_task(*t);               // swaps rbsp; main-thread state only
	lk.lock();
	for (auto &fi : inflight) {
		if (fi.slot == curr && !fi.finalized) {
			fi.tasks_pending++;
			for (int l = 0; l < 2; l++)
				for (int r = 0; r < sh.num_refs[l]; r++)
					if (sh.RefPicList[l][r] >= 0)
						fi.dep_slots |= 1u << sh.RefPicList[l][r];
			// refresh the seal snapshot: concealment uses the LAST
			// slice's header state, like sync mode's conceal_frame()
			fi.conceal_qp = sh.qp;
			fi.conceal_cqpo = cpps->chroma_qp_index_offset;
			fi.conceal_cqpo2 = cpps->second_chroma_qp_index_offset;
			break;
		}
	}
	task_queue.push_back(t);
	cv_ready.notify_one();
	retire_frames();
}

// Block until every in-flight frame finalized, then retire them (stream
// drain / flush / shutdown path).
void Decoder::drain_tasks() {
	if (!n_threads)
		return;
	std::unique_lock<std::mutex> lk(mu);
	cv_done.wait(lk, [&] {
		for (auto &fi : inflight)
			if (!fi.finalized)
				return false;
		return true;
	});
	retire_frames();
}

// Block until the oldest output-queue frame is complete (ENOBUFS retry
// path).  Returns 0 when a frame should now be gettable, -1 when nothing
// is in flight (caller's stall is not task-related).
int Decoder::wait_frame() {
	if (!n_threads)
		return -1;
	std::unique_lock<std::mutex> lk(mu);
	while (true) {
		retire_frames();
		int idx0 = -1;
		for (int i = 0; i < MAX_SLOTS; i++)
			if (output_fifo[0][i] >= 0)
				idx0 = i;
		if (idx0 >= 0 && complete[output_fifo[0][idx0]])
			return 0;
		bool busy = false;
		for (auto &fi : inflight)
			if (!fi.finalized)
				busy = true;
		if (!busy)
			return -1;
		cv_done.wait(lk);
	}
}

} // namespace e264t

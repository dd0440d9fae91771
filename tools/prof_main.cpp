// Standalone profiling driver for the native front end: decodes an
// Annex-B file through the C ABI in a loop (gprof/instruction-level
// profiling target; not part of the Python package).
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <ctime>
#include <vector>

extern "C" {
void *e264t_alloc(void);
void e264t_free(void *);
int e264t_decode_nal(void *, const uint8_t *, size_t);
struct E264tEvent { int32_t kind, slot, a, b, c, d; };
int e264t_poll(void *, E264tEvent *);
int e264t_get_frame(void *, int, int32_t *);
}

int main(int argc, char **argv) {
	if (argc < 2) { fprintf(stderr, "usage: %s file.264 [reps]\n", argv[0]); return 1; }
	FILE *f = fopen(argv[1], "rb");
	fseek(f, 0, SEEK_END);
	long n = ftell(f);
	fseek(f, 0, SEEK_SET);
	std::vector<uint8_t> data(n);
	if (fread(data.data(), 1, n, f) != (size_t)n) return 1;
	fclose(f);
	int reps = argc > 2 ? atoi(argv[2]) : 1;
	// split at 00 00 01
	std::vector<std::pair<size_t, size_t>> nals;
	size_t pos = 0;
	auto find_sc = [&](size_t from) -> size_t {
		for (size_t i = from; i + 2 < data.size(); i++)
			if (data[i] == 0 && data[i+1] == 0 && data[i+2] == 1)
				return i;
		return data.size();
	};
	pos = find_sc(0) + 3;
	while (pos < data.size()) {
		size_t end = find_sc(pos);
		nals.push_back({pos, end - pos});
		pos = end + 3;
	}
	long frames = 0;
	double best = 1e30;
	for (int r = 0; r < reps; r++) {
		struct timespec t0, t1;
		clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &t0);
		long ff = 0;
		void *h = e264t_alloc();
		E264tEvent ev;
		for (auto &nl : nals) {
			int ret = e264t_decode_nal(h, data.data() + nl.first, nl.second);
			while (e264t_poll(h, &ev))
				ff += ev.kind == 4;
			int32_t out[4];
			while (e264t_get_frame(h, 0, out) == 0) {}
			if (ret == 105) {   // ENOBUFS: retry after draining
				e264t_decode_nal(h, data.data() + nl.first, nl.second);
				while (e264t_poll(h, &ev))
					ff += ev.kind == 4;
			}
		}
		e264t_free(h);
		clock_gettime(CLOCK_PROCESS_CPUTIME_ID, &t1);
		double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
		if (dt < best) best = dt;
		frames = ff;
	}
	printf("%ld frames, best %.3fs cpu = %.2f ms/frame\n",
	       frames, best, best * 1e3 / (frames ? frames : 1));
	return 0;
}

// Standalone host front-end driver: decode an Annex-B file through the
// C ABI with a null pixel backend.  Used for profiling (gprof/perf) and
// host-side throughput measurement independent of Python.
//   g++ -O3 -march=native tools/native_bench.cpp edge264_tpu/native/src/*.cpp -o /tmp/native_bench
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>

extern "C" {
void *e264t_alloc(void);
void e264t_free(void *);
int e264t_decode_nal(void *, const uint8_t *, size_t);
struct E264tEvent { int32_t kind, slot, a, b, c, d; };
int e264t_poll(void *, E264tEvent *);
int e264t_get_frame(void *, int, int32_t *);
void e264t_set_threads(void *, int);
int e264t_wait_frame(void *);
}

static size_t find_sc(const uint8_t *p, size_t n, size_t pos) {
    for (size_t i = pos; i + 2 < n; i++)
        if (p[i] == 0 && p[i + 1] == 0 && p[i + 2] == 1) return i;
    return n;
}

int main(int argc, char **argv) {
    const char *path = argc > 1 ? argv[1]
        : "/tmp/e264t_bench_cabac_ipb_120x68_61f_v1.264";
    int reps = argc > 2 ? atoi(argv[2]) : 1;
    int n_tasks = argc > 3 ? atoi(argv[3]) : 0;
    FILE *f = fopen(path, "rb");
    if (!f) { perror("open"); return 1; }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, n, f) != (size_t)n) return 1;
    fclose(f);

    for (int r = 0; r < reps; r++) {
        void *h = e264t_alloc();
        if (n_tasks)
            e264t_set_threads(h, n_tasks);
        struct timespec t0, t1;
        clock_gettime(CLOCK_MONOTONIC, &t0);
        size_t pos = find_sc(buf.data(), n, 0);
        int frames = 0;
        while (pos < (size_t)n) {
            size_t end = find_sc(buf.data(), n, pos + 3);
            int rc = e264t_decode_nal(h, buf.data() + pos + 3, end - pos - 3);
            E264tEvent ev;
            while (e264t_poll(h, &ev))
                if (ev.kind == 4) frames++;      // EV_FRAME_DONE
            int32_t fr[4];
            while (e264t_get_frame(h, 0, fr) == 0) {}
            if (rc == 105) {                     // ENOBUFS: wait + retry NAL
                e264t_wait_frame(h);
                continue;
            }
            pos = end;
        }
        for (int drain = 0; drain < 64; drain++) {   // EOS drain
            int rc = e264t_decode_nal(h, nullptr, 0);
            E264tEvent ev;
            while (e264t_poll(h, &ev))
                if (ev.kind == 4) frames++;
            int32_t fr[4];
            while (e264t_get_frame(h, 0, fr) == 0) {}
            if (rc != 105) break;                    // != ENOBUFS
        }
        clock_gettime(CLOCK_MONOTONIC, &t1);
        double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
        printf("%d frames in %.3fs = %.1f ms/frame\n", frames, dt,
               dt / frames * 1e3);
        e264t_free(h);
    }
    return 0;
}

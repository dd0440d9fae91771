// Sanitizer fuzz driver for the native syntax front end (the analog of the
// reference's guard-page memory-safety harness, edge264_check.c:112-165,
// with ASan/UBSan doing the page-guard work):
//   g++ -std=c++17 -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=all \
//       tools/fuzz_native.cpp edge264_tpu/native/src/*.cpp -o /tmp/fuzz_native
//   /tmp/fuzz_native stream.264 [...]
// Decodes every Annex-B file given, incl. the EOS drain, exercising the
// full NAL/header/slice/mb parse under the sanitizers.  Exit code 0 means
// no memory error, overflow, or UB was detected.
#include <cstdint>
#include <cstdio>
#include <cstring>
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
void e264t_set_logging(void *, int, int);
size_t e264t_get_log(void *, char *, size_t);
}

static size_t find_sc(const uint8_t *p, size_t n, size_t pos) {
    for (size_t i = pos; i + 2 < n; i++)
        if (p[i] == 0 && p[i + 1] == 0 && p[i + 2] == 1) return i;
    return n;
}

static int run(const uint8_t *buf, size_t n, int n_tasks, int logs) {
    void *h = e264t_alloc();
    if (n_tasks)
        e264t_set_threads(h, n_tasks);
    if (logs)
        e264t_set_logging(h, 1, 1);
    std::vector<char> logbuf(1 << 20);
    size_t pos = find_sc(buf, n, 0);
    int frames = 0, stall = 0;
    while (pos < n) {
        size_t end = find_sc(buf, n, pos + 3);
        int rc = e264t_decode_nal(h, buf + pos + 3, end - pos - 3);
        E264tEvent ev;
        while (e264t_poll(h, &ev))
            if (ev.kind == 4) frames++;
        int32_t fr[4];
        int got = 0;
        while (e264t_get_frame(h, 0, fr) == 0) got++;
        if (logs)
            e264t_get_log(h, logbuf.data(), logbuf.size());
        if (rc == 105 && stall++ < 64) {     // ENOBUFS
            e264t_wait_frame(h);
            continue;
        }
        stall = 0;
        pos = end;
    }
    for (int drain = 0; drain < 64; drain++) {
        int rc = e264t_decode_nal(h, nullptr, 0);
        E264tEvent ev;
        while (e264t_poll(h, &ev))
            if (ev.kind == 4) frames++;   // reorder backlog completes here
        int32_t fr[4];
        while (e264t_get_frame(h, 0, fr) == 0) {}
        if (rc != 105) break;
    }
    e264t_free(h);
    return frames;
}

int main(int argc, char **argv) {
    int n_tasks = 0, logs = 0, argi = 1;
    for (; argi < argc && argv[argi][0] == '-'; argi++) {
        if (!strcmp(argv[argi], "-m")) n_tasks = 4;
        if (!strcmp(argv[argi], "-v")) logs = 1;
    }
    for (; argi < argc; argi++) {
        FILE *f = fopen(argv[argi], "rb");
        if (!f) { perror(argv[argi]); return 1; }
        fseek(f, 0, SEEK_END);
        long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        std::vector<uint8_t> buf(n > 0 ? n : 1);
        if (n > 0 && fread(buf.data(), 1, n, f) != (size_t)n) return 1;
        fclose(f);
        int frames = run(buf.data(), n, n_tasks, logs);
        printf("%s: %d frames\n", argv[argi], frames);
    }
    return 0;
}

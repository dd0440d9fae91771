#!/usr/bin/env python3
"""Benchmark against BASELINE.md config #3: B slices + CABAC at 1080p
(the reference decodes the 10-s 1080p Big Buck Bunny clip at ~77 fps on
one CPU thread — 300 frames / 3.9 s, README-benchmark.svg).

Workload: a generated 1080p (1920x1088) CABAC IPB stream of 8 CLOSED GOPs
(IDR + 4x(P+B) each — BBB-like ~1 s IDR cadence) decoded through the
K-lane LOCKSTEP driver (parallel/batch.py): C++ entropy front end on host
worker threads, batched JAX/XLA/Pallas pixel path on the device, output
verified BIT-EXACT against the reference decoder binary inside the bench.

Robustness contract (the driver runs this once per round; a timeout must
not eat the round's measurement): the benchmark body runs in a child
process with a wall-clock budget; the parent ALWAYS prints exactly one
JSON line — on child failure/timeout it reports the partial stage numbers
the child checkpointed, with an `error` field.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# geometry/shape overridable for CPU smoke tests of the full bench path
# (tests/test_bench_smoke.py); the real bench always runs the defaults
MBW, MBH = (int(x) for x in
            os.environ.get("E264T_BENCH_GEOM", "120x68").split("x"))
N_GOPS = int(os.environ.get("E264T_BENCH_GOPS", "8"))
GOP_PB = int(os.environ.get("E264T_BENCH_GOP_PB", "4"))
# coefficient density/level tuned to the BASELINE workload's bitrate:
# the 10-s BBB clip is ~100 KB/frame (30 MB / 300 frames); these settings
# measure ~107 KB/frame at 1080p, where the round-2 bench stream was an
# unrepresentative ~350 KB/frame (3.5x the baseline's bits to entropy-
# decode per frame)
DENSITY, MAX_LEVEL = 0.05, 4
# 5% intra mbs in P/B frames, like real inter-coded content (the
# generator default of 15% is a torture setting; real encoders use
# intra refresh sparsely outside scene cuts)
INTRA_PROB = 0.05
BASELINE_FPS = 77.0
CACHE = (f"/tmp/e264t_bench_cabac_ipb_{MBW}x{MBH}_closed{N_GOPS}x"
         f"{1+2*GOP_PB}_d{DENSITY}_i{INTRA_PROB}_v3.264")
PARTIAL = "/tmp/e264t_bench_partial.json"
LANES = int(os.environ.get("E264T_BENCH_LANES", "8"))
BUDGET_S = float(os.environ.get("E264T_BENCH_BUDGET_S", "1500"))
METRIC = ("1080p CABAC IPB end-to-end decode, 8 closed GOPs in "
          f"{LANES}-lane lockstep (host entropy + TPU pixel path, "
          "frames delivered to device HBM, every frame digest-verified "
          "vs the reference binary; median of 5; workload calibrated to "
          "the reference's BBB clip, see BENCH_WORKLOAD.md)")


def _median(runs):
    s = sorted(runs)
    n = len(s)
    return s[n // 2] if n % 2 else round((s[n // 2 - 1] + s[n // 2]) / 2, 2)


def emit(value, vs, **extra):
    print(json.dumps({"metric": METRIC, "value": round(value, 2),
                      "unit": "frames/sec",
                      "vs_baseline": round(vs, 3), **extra}))
    sys.stdout.flush()


def checkpoint(**kv):
    """Worker: persist partial stage results for the parent's fallback."""
    cur = {}
    if os.path.exists(PARTIAL):
        try:
            cur = json.load(open(PARTIAL))
        except Exception:
            cur = {}
    cur.update(kv)
    with open(PARTIAL + ".tmp", "w") as f:
        json.dump(cur, f)
    os.replace(PARTIAL + ".tmp", PARTIAL)


# ---------------------------------------------------------------------------
# worker: the actual benchmark

def build_stream() -> bytes:
    if os.path.exists(CACHE):
        return open(CACHE, "rb").read()
    from tools.avcgen import gen_random_cabac_ipb_stream
    sys.stderr.write("generating 1080p CABAC IPB stream (slow, cached)...\n")
    data = gen_random_cabac_ipb_stream(MBW, MBH, n_gops=N_GOPS, seed=42,
                                       closed=True, gop_pb=GOP_PB,
                                       density=DENSITY,
                                       max_level=MAX_LEVEL,
                                       intra_prob=INTRA_PROB)
    with open(CACHE, "wb") as f:
        f.write(data)
    return data


def golden_digest(data: bytes):
    """YUV digest of the stream decoded by the reference binary (cached
    beside the stream)."""
    import hashlib
    cache = CACHE + ".golden"
    if os.path.exists(cache):
        d, n = open(cache).read().split()
        return d, int(n)
    from tools.ref_oracle import RefOracle
    o = RefOracle.build()
    frames, yuv, _ = o.decode_yuv(data)
    d = hashlib.sha256(yuv).hexdigest()
    with open(cache, "w") as f:
        f.write(f"{d} {len(frames)}")
    return d, len(frames)


def golden_frame_digests(data: bytes):
    """Per-frame 64-bit checksums (ops.batched.host_frame_digest) of the
    reference binary's YUV output — the golden values the DEVICE-side
    digests must reproduce exactly (cached beside the stream)."""
    import numpy as np
    cache = CACHE + ".fdig"
    if os.path.exists(cache):
        return [tuple(map(int, ln.split())) for ln in open(cache)]
    from tools.ref_oracle import RefOracle
    from edge264_tpu.ops.batched import host_frame_digest
    o = RefOracle.build()
    frames, yuv, _ = o.decode_yuv(data)
    digs = []
    off = 0
    for _fid, wy, hy, wc, hc in frames:
        y = np.frombuffer(yuv, np.uint8, wy * hy, off).reshape(hy, wy)
        off += wy * hy
        cb = np.frombuffer(yuv, np.uint8, wc * hc, off).reshape(hc, wc)
        off += wc * hc
        cr = np.frombuffer(yuv, np.uint8, wc * hc, off).reshape(hc, wc)
        off += wc * hc
        digs.append(host_frame_digest(y, cb, cr))
    with open(cache, "w") as f:
        for d0, d1 in digs:
            f.write(f"{d0} {d1}\n")
    return digs


def host_only_pass(data: bytes) -> float:
    """ms/frame of the entropy front end alone (null pixel backend,
    frame-task workers)."""
    import numpy as np
    from edge264_tpu.api import decode_annexb

    class NullBackend:
        def reconstruct(self, planes, slot, store):
            h, w = planes.mb_h * 16, planes.mb_w * 16
            z = np.zeros((h, w), np.uint8)
            zc = np.zeros((h // 2, w // 2), np.uint8)
            return z, zc, zc

    t0 = time.perf_counter()
    n = sum(1 for _ in decode_annexb(data, backend=NullBackend(),
                                     n_tasks=-1))
    dt = time.perf_counter() - t0
    return dt / n * 1e3


def device_health_check(deadline: float, probe_timeout: float = 240.0):
    """Block until a tiny jit runs on the device (the axon tunnel dies
    and recovers on 15-40 min scales; retry within budget), else raise.

    The probe runs under a WATCHDOG thread: on a wedged tunnel the jit
    call HANGS rather than raising (observed after a miscompiled-program
    chip fault), and recovery needs a fresh process — so a hung probe
    raises immediately instead of silently eating the whole budget."""
    import queue
    import threading

    def probe(out):
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np
            x = jax.jit(lambda a: a * 2 + 1)(jnp.arange(8.0))
            assert np.asarray(x)[3] == 7.0       # real D2H = real sync
            out.put(None)
        except Exception as e:                   # pragma: no cover
            out.put(e)

    attempt = 0
    while True:
        attempt += 1
        out = queue.Queue()
        threading.Thread(target=probe, args=(out,), daemon=True).start()
        try:
            err = out.get(timeout=min(probe_timeout,
                                      max(30, deadline - time.monotonic())))
        except queue.Empty:
            raise TimeoutError(
                f"device probe hung >{probe_timeout:.0f}s (wedged "
                "tunnel; needs a fresh process)")
        if err is None:
            sys.stderr.write(f"device healthy (attempt {attempt})\n")
            return
        remain = deadline - time.monotonic()
        sys.stderr.write(f"health check failed ({type(err).__name__}: "
                         f"{err}); {remain:.0f}s of budget left\n")
        if remain < 120:
            raise err
        time.sleep(min(60, remain - 90))


def run_once(data: bytes, check_digest):
    import hashlib
    import numpy as np
    from edge264_tpu.parallel.batch import decode_gops_batched
    h = hashlib.sha256() if check_digest else None
    t0 = time.perf_counter()
    n = 0
    for f in decode_gops_batched(data, lanes=LANES):
        if h is not None:
            h.update(np.asarray(f.y).tobytes())
            h.update(np.asarray(f.cb).tobytes())
            h.update(np.asarray(f.cr).tobytes())
        else:
            _ = int(np.asarray(f.y)[0, 0])             # force D2H
        n += 1
    dt = time.perf_counter() - t0
    ok = h.hexdigest() == check_digest if h is not None else None
    return n, dt, ok


def run_digest(data: bytes, want):
    """One decode with frames DELIVERED TO DEVICE HBM (the TPU-native
    sink: the consumer of a TPU decoder is a TPU model); the host link
    carries only the per-frame 64-bit checksums, verified against the
    reference decoder's output — every timed frame stays
    bit-exactness-checked."""
    from edge264_tpu.parallel.batch import decode_gops_batched
    t0 = time.perf_counter()
    got = [f.digest for f in decode_gops_batched(data, lanes=LANES,
                                                 sink="digest")]
    dt = time.perf_counter() - t0
    return len(got), dt, got == want


def worker():
    if os.environ.get("E264T_BENCH_PLATFORM"):
        # smoke tests force the CPU backend (the axon plugin outranks
        # JAX_PLATFORMS; override it the same programmatic way)
        import jax
        jax.config.update("jax_platforms",
                          os.environ["E264T_BENCH_PLATFORM"])
    deadline = time.monotonic() + BUDGET_S
    # do NOT clobber a previous attempt's partials (the parent restarts
    # the worker on tunnel failures; fps_runs from an earlier attempt
    # still count for the fallback)
    checkpoint(stage="build_stream")
    data = build_stream()
    digest, n_ref = golden_digest(data)
    fdigs = golden_frame_digests(data)
    sys.stderr.write(f"stream: {len(data)/1e6:.1f} MB, {n_ref} frames "
                     f"@1920x1088 CABAC IPB, {N_GOPS} closed GOPs\n")

    checkpoint(stage="host_entropy")
    host_ms = host_only_pass(data)
    checkpoint(stage="health_check", host_entropy_ms=round(host_ms, 2))
    sys.stderr.write(f"host entropy only (-1 tasks): {host_ms:.1f} "
                     f"ms/frame ({1e3/host_ms:.0f} fps ceiling)\n")

    device_health_check(deadline)

    # warmup = FULL host delivery, sha256-checked against the reference
    # binary's YUV byte-for-byte (compiles the programs; also yields the
    # host-delivery fps reported alongside the headline number)
    checkpoint(stage="warmup")
    os.environ.setdefault("E264T_LANE_PROF", "1")   # stage breakdown on
    t0 = time.perf_counter()                        # stderr per group
    n, dt, ok = run_once(data, digest)      # warmup: compile + hash check
    sys.stderr.write(f"warmup: {n} frames in {dt:.1f}s (cold total "
                     f"{time.perf_counter()-t0:.1f}s), bit-exact vs "
                     f"reference binary: {ok}\n")
    checkpoint(stage="timed_runs", bitexact=bool(ok), warmup_s=round(dt, 1))
    if n != n_ref or not ok:
        # deterministic failure: tell the parent NOT to retry
        emit(0.0, 0.0, error=f"output mismatch (frames {n}/{n_ref}, "
                             f"exact={ok})", fatal=True,
             host_entropy_ms=round(host_ms, 2))
        return

    # host-delivery timed run (frames copied to host RAM like the
    # reference's sink), then the headline runs: frames delivered to
    # device HBM — the TPU-native sink — with EVERY frame's 64-bit
    # checksum still verified against the reference decoder
    n, dt, _ = run_once(data, None)
    host_fps = round(n / dt, 2)
    checkpoint(host_delivery_fps=host_fps)
    sys.stderr.write(f"host-delivery run: {n} frames in {dt:.2f}s = "
                     f"{host_fps:.1f} fps\n")

    runs = []
    for _ in range(5):      # median of 5, like the reference's
        if time.monotonic() > deadline - 60 and runs:   # benchmarks.yml
            break
        n, dt, ok = run_digest(data, fdigs)
        if n != n_ref or not ok:
            emit(0.0, 0.0, error=f"digest mismatch (frames {n}/{n_ref}, "
                                 f"exact={ok})", fatal=True,
                 host_entropy_ms=round(host_ms, 2))
            return
        fps = n / dt
        runs.append(round(fps, 2))
        checkpoint(fps_runs=runs)
        sys.stderr.write(f"digest run: {n} frames in {dt:.2f}s = "
                         f"{fps:.1f} fps (all frames digest-verified)\n")
    head = _median(runs)
    emit(head, head / BASELINE_FPS, host_entropy_ms=round(host_ms, 2),
         runs=runs, host_delivery_fps=host_fps, bitexact=True)


# ---------------------------------------------------------------------------
# parent: budget enforcement + guaranteed JSON

LOCK = "/tmp/e264t_bench.lock"


def _acquire_lock():
    """One bench at a time: a second process against the single TPU chip
    silently stalls the first (axon tunnel behavior).  Waits for a fresh
    lock to clear; a stale lock (holder gone) is broken."""
    deadline = time.monotonic() + BUDGET_S
    while True:
        try:
            fd = os.open(LOCK, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return True
        except FileExistsError:
            try:
                pid = int(open(LOCK).read() or "0")
            except (OSError, ValueError):
                pid = 0
            alive = pid > 0 and os.path.exists(f"/proc/{pid}")
            if not alive:
                try:
                    os.remove(LOCK)
                except OSError:
                    pass
                continue
            if time.monotonic() > deadline:
                return False
            sys.stderr.write(f"bench lock held by pid {pid}; waiting\n")
            time.sleep(30)


def parent():
    if not _acquire_lock():
        emit(0.0, 0.0, error="another bench held the TPU for the whole "
                             "budget")
        return
    try:
        _parent_locked()
    finally:
        try:
            os.remove(LOCK)
        except OSError:
            pass


def _parent_locked():
    """Run the worker, RESTARTING it on failure while budget remains: a
    single axon-tunnel drop mid-compile (r03: remote_compile 'response
    body closed') must not eat the round's one measurement.  Stream,
    golden digest and compiled executables are all cached on disk, so a
    restarted worker fast-forwards to where the last one died."""
    try:
        os.remove(PARTIAL)
    except OSError:
        pass
    t0 = time.monotonic()
    attempt = 0
    why = "no attempt ran"
    while True:
        attempt += 1
        remain = BUDGET_S - (time.monotonic() - t0)
        if attempt > 1 and remain < 180:
            break
        env = dict(os.environ, E264T_BENCH_BUDGET_S=str(max(60, remain)))
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            start_new_session=True, cwd=REPO, env=env)
        try:
            out, _ = child.communicate(
                timeout=max(60, BUDGET_S - (time.monotonic() - t0)))
        except subprocess.TimeoutExpired:
            # kill the exact process group we started (never by pattern)
            os.killpg(child.pid, signal.SIGKILL)
            out, _ = child.communicate()
            _fallback(out, f"timeout after {time.monotonic()-t0:.0f}s",
                      attempt)
            return
        line = _last_json_line(out)
        if child.returncode == 0 and line:
            rec = json.loads(line)
            if attempt > 1:
                rec["attempts"] = attempt
                line = json.dumps(rec)
            if (rec.get("value", 0) > 0 or not rec.get("error")
                    or rec.get("fatal")):
                print(line)
                sys.stdout.flush()
                return
            why = rec.get("error", "worker emitted 0 fps")
        else:
            why = f"worker exited rc={child.returncode}"
        sys.stderr.write(f"attempt {attempt} failed ({why}); "
                         f"{BUDGET_S - (time.monotonic()-t0):.0f}s of "
                         "budget left, restarting worker\n")
        time.sleep(15)     # give a flapping tunnel a moment
    _fallback(None, why, attempt)


def _last_json_line(out: str):
    for line in reversed((out or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                json.loads(line)
                return line
            except Exception:
                continue
    return None


def _fallback(out, why, attempts=1):
    part = {}
    if os.path.exists(PARTIAL):
        try:
            part = json.load(open(PARTIAL))
        except Exception:
            part = {}
    runs = part.get("fps_runs") or []
    if runs:        # timed runs completed before the failure: report them
        best = _median(runs)
        emit(best, best / BASELINE_FPS, error=why, attempts=attempts, **{
            k: v for k, v in part.items() if k != "fps_runs"}, runs=runs)
        return
    emit(0.0, 0.0, error=f"{why} at stage {part.get('stage', '?')}",
         attempts=attempts, host_entropy_ms=part.get("host_entropy_ms"))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        parent()

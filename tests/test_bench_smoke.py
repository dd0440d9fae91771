"""End-to-end smoke test of bench.py's FULL path (parent process, budget
lock, worker, stream build, reference-binary golden digest, health check,
K-lane lockstep decode, bit-exactness hash, timed runs, JSON emission) on
a tiny CPU-sized geometry — the round-2 failure mode was the bench
breaking in ways only discoverable on the one real-TPU run."""

import json
import os
import subprocess
import sys


def test_bench_end_to_end_tiny(ref_oracle, tmp_path):
    env = dict(os.environ)
    env.update(
        E264T_BENCH_GEOM="8x6",
        E264T_BENCH_GOPS="4",
        E264T_BENCH_GOP_PB="1",
        E264T_BENCH_LANES="4",
        E264T_BENCH_BUDGET_S="240",
        E264T_BENCH_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
    )
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, timeout=300, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines()
            if l.strip().startswith("{")]
    assert line, (r.stdout, r.stderr[-1000:])
    d = json.loads(line[-1])
    assert d["unit"] == "frames/sec"
    assert d.get("bitexact") is True, d
    assert d["value"] > 0, d
    assert "runs" in d and len(d["runs"]) >= 1

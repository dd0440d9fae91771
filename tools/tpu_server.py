"""Persistent TPU job server: keeps ONE warm JAX process attached to the
axon chip (process init costs 2-10 min) and executes Python job files
dropped into a spool directory, serially, in-process.

Usage:   python tools/tpu_server.py [spool_dir]     (default /tmp/e264t_spool)
Submit:  write <name>.py into the spool dir; the server runs it with
         globals {'jax': jax, 'OUT': open log} and writes <name>.out
         (stdout+stderr+traceback) then <name>.done (exit marker).
Stop:    drop a file named `quit` (empty) into the spool dir.

Jobs share the process: a chip-wedging fault kills the server's utility —
restart it (and expect the tunnel to need recovery time).  Only one
process may use the TPU at a time; the server respects the bench lock by
convention (don't run bench.py while the server is up).
"""
import io
import os
import sys
import time
import traceback

SPOOL = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e264t_spool"
os.makedirs(SPOOL, exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

print("importing jax...", flush=True)
t0 = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

dev = jax.devices()
print(f"devices={dev} in {time.time()-t0:.1f}s", flush=True)
# touch the chip once so init cost is paid now
x = np.asarray(jax.jit(lambda a: a + 1)(jnp.zeros((8, 128), jnp.int32)))
print(f"probe ok in {time.time()-t0:.1f}s total", flush=True)
open(os.path.join(SPOOL, "ready"), "w").write(str(dev))
STASH = {}      # persistent cross-job state (e.g. the built bench stream)

while True:
    jobs = sorted(f for f in os.listdir(SPOOL) if f.endswith(".py")
                  and not os.path.exists(os.path.join(SPOOL, f + ".done")))
    if os.path.exists(os.path.join(SPOOL, "quit")):
        print("quit requested", flush=True)
        break
    if not jobs:
        time.sleep(0.5)
        continue
    name = jobs[0]
    path = os.path.join(SPOOL, name)
    print(f"=== running {name}", flush=True)
    buf = io.StringIO()
    old_out, old_err = sys.stdout, sys.stderr

    class Tee:
        def __init__(self, *ws):
            self.ws = ws

        def write(self, s):
            for w in self.ws:
                w.write(s)

        def flush(self):
            for w in self.ws:
                w.flush()

    sys.stdout = sys.stderr = Tee(buf, old_out)
    t0 = time.time()
    try:
        src = open(path).read()
        g = {"jax": jax, "jnp": jnp, "np": np, "STASH": STASH,
             "__name__": "__tpu_job__"}
        exec(compile(src, path, "exec"), g)
        status = "ok"
    except BaseException:
        traceback.print_exc()
        status = "error"
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    dt = time.time() - t0
    open(path + ".out", "w").write(buf.getvalue())
    open(path + ".done", "w").write(f"{status} {dt:.1f}s\n")
    print(f"=== {name}: {status} in {dt:.1f}s", flush=True)

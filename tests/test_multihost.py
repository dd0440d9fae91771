"""Two-process jax.distributed decode: each process takes its contiguous
GOP share (parallel/distributed.py) and the union must equal the serial
decode — the N-host scaling story run for real on one machine
(BASELINE.md scaling row)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from edge264_tpu.api import decode_annexb
from tools.avcgen import gen_random_ipb_stream

WORKER = r"""
import os, pickle, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=int(sys.argv[2]),
                           process_id=int(sys.argv[3]))
sys.path.insert(0, sys.argv[4])
from edge264_tpu.parallel.distributed import decode_stream_multihost
import numpy as np
data = open(sys.argv[5], "rb").read()
frames = [(np.asarray(f.y), np.asarray(f.cb), np.asarray(f.cr))
          for f in decode_stream_multihost(data, lanes=2, use_mesh=False)]
with open(sys.argv[6], "wb") as fh:
    pickle.dump(frames, fh)
"""


@pytest.mark.slow
def test_two_process_distributed_decode(tmp_path):
    data = b"".join(gen_random_ipb_stream(5, 3, n_gops=1, seed=s)
                    for s in range(4))
    stream = tmp_path / "s.264"
    stream.write_bytes(data)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = "127.0.0.1:29876"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = [tmp_path / f"out{r}.pkl" for r in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, "2", str(r), repo,
         str(stream), str(outs[r])],
        env={**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": ""})
        for r in range(2)]
    for p in procs:
        assert p.wait(timeout=600) == 0
    got = []
    for o in outs:
        got += pickle.load(open(o, "rb"))
    serial = [(np.asarray(f.y), np.asarray(f.cb), np.asarray(f.cr))
              for f in decode_annexb(data, backend="numpy")]
    assert len(got) == len(serial)
    for (ya, ca, ra), (yb, cb_, rb) in zip(serial, got):
        assert np.array_equal(ya, yb)
        assert np.array_equal(ca, cb_)
        assert np.array_equal(ra, rb)

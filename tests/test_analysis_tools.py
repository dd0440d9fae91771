"""Analysis tooling end-to-end: the YAML log's per-slice timing block
feeds tools/analysis/to_trace_event.py (the reference's
to_trace_event_format.py pipeline, edge264_headers.c:571-583)."""

import numpy as np

from edge264_tpu.api import decode_annexb
from tools.avcgen import gen_random_ipp_stream
from tools.analysis.to_trace_event import convert


def test_slice_timing_to_trace_events():
    data = gen_random_ipp_stream(5, 4, n_frames=4, seed=3, density=0.2,
                                 skip_prob=0.3, intra_prob=0.1,
                                 mv_range=8, nrefs=1)
    logs = []
    frames = list(decode_annexb(data, log_cb=logs.append))
    assert len(frames) == 4
    text = "".join(logs)
    assert "decoding_start_us" in text and "decoding_end_us" in text
    trace = convert(text)
    evs = trace["traceEvents"]
    assert len(evs) == 4               # one complete event per slice
    for e in evs:
        assert e["ph"] == "X"
        assert e["dur"] >= 1
        assert e["ts"] >= 0
    # slices decode in stream order on one thread: starts non-decreasing
    starts = [e["ts"] for e in evs]
    assert starts == sorted(starts)


def test_decoding_time_per_size_fields():
    """The per-slice block carries approx_byte_size for the size/time
    scatter tool."""
    data = gen_random_ipp_stream(5, 4, n_frames=3, seed=5, density=0.2,
                                 skip_prob=0.3, intra_prob=0.1,
                                 mv_range=8, nrefs=1)
    logs = []
    list(decode_annexb(data, log_cb=logs.append))
    text = "".join(logs)
    import re
    sizes = [int(m) for m in re.findall(r"approx_byte_size: (\d+)", text)]
    assert len(sizes) == 3 and all(s > 0 for s in sizes)


def test_bench_chart_renders_svg(tmp_path):
    """Chart renderer (the reference's bench-charts.py analog)."""
    from tools.analysis.bench_chart import render
    out = tmp_path / "chart.svg"
    render({"tpu": {"edge264_tpu": 20.0, "reference": 77.0}}, str(out))
    assert out.read_text().startswith("<?xml")


def test_bench_chart_from_bench_json(tmp_path):
    import json
    from tools.analysis.bench_chart import _load
    bj = tmp_path / "BENCH.json"
    bj.write_text(json.dumps({"metric": "1080p decode", "value": 20.5,
                              "unit": "frames/sec"}) + "\n")
    data, out = _load(["--bench", str(bj), str(tmp_path / "o.svg")])
    assert data == {"fps": {"1080p decode": 20.5}}

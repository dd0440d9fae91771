#!/usr/bin/env python3
"""YAML decode log -> Chrome Trace Event JSON (chrome://tracing).

Port of the reference's misc-scripts/to_trace_event_format.py: turns the
per-slice timing entries of a decode log into complete events on one
track per worker/frame."""

import json
import re
import sys


def convert(log_text):
    events = []
    cur = {}
    for line in log_text.splitlines():
        m = re.match(r"\s*(frame_id|slice_type|decoding_start_us|"
                     r"decoding_end_us|thread_id):\s*(-?\w+)", line)
        if not m:
            continue
        cur[m.group(1)] = m.group(2)
        if m.group(1) == "decoding_end_us":
            start = int(cur.get("decoding_start_us", 0))
            end = int(cur.get("decoding_end_us", start))
            events.append({
                "name": f"frame {cur.get('frame_id', '?')} "
                        f"({cur.get('slice_type', '?')})",
                "ph": "X", "ts": start, "dur": max(end - start, 1),
                "pid": 1, "tid": int(cur.get("thread_id", 0)),
            })
            cur = {}
    return {"traceEvents": events, "displayTimeUnit": "ms"}


if __name__ == "__main__":
    text = open(sys.argv[1]).read() if len(sys.argv) > 1 else \
        sys.stdin.read()
    json.dump(convert(text), sys.stdout, indent=1)

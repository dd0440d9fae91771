#!/usr/bin/env python3
"""Decode log -> DOT graph of frame reference dependencies.

Port of misc-scripts/dependency_graph.py: each decoded frame becomes a
node, arrows point at the frames in its reference lists."""

import re
import sys


def convert(log_text):
    out = ["digraph deps {", "  rankdir=LR;"]
    frame = None
    for line in log_text.splitlines():
        m = re.match(r"\s*frame_id:\s*(\d+)", line)
        if m:
            frame = m.group(1)
            out.append(f'  f{frame} [label="frame {frame}"];')
        m = re.match(r"\s*RefPicList[01]:\s*\[([^\]]*)\]", line)
        if m and frame is not None:
            for ref in re.findall(r"-?\d+", m.group(1)):
                if int(ref) >= 0:
                    out.append(f"  f{frame} -> f{ref};")
    out.append("}")
    return "\n".join(out)


if __name__ == "__main__":
    text = open(sys.argv[1]).read() if len(sys.argv) > 1 else \
        sys.stdin.read()
    print(convert(text))

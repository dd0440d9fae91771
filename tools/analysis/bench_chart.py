#!/usr/bin/env python3
"""Benchmark chart renderer (the reference's bench-charts.py analog,
misc-scripts/bench-charts.py:1-34): grouped bar chart from a JSON matrix
of named rows x columns, written as SVG.  Also accepts a file of
bench.py JSON lines (one {"metric", "value", ...} object per line) and
charts fps per metric.

  python -m tools.analysis.bench_chart '{"tpu":{"edge264_tpu":20,"ref":77}}' out.svg
  python -m tools.analysis.bench_chart --bench BENCH_r03.json out.svg
"""

import datetime
import json
import sys


def _load(argv):
    if argv and argv[0] == "--bench":
        rows = {}
        with open(argv[1]) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                d = json.loads(line)
                label = d.get("metric", "bench")[:40]
                rows.setdefault("fps", {})[label] = d.get("value", 0.0)
        return rows, argv[2]
    return json.loads(argv[0]), argv[1]


def render(data, out_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    rnames = list(data.keys())
    cnames = list(tuple(data.values())[0].keys())
    x = np.arange(len(rnames))
    width = 1 / (len(cnames) + 1)
    fig, ax = plt.subplots(figsize=(7, 4), layout="constrained")
    for c, cname in enumerate(cnames):
        rects = ax.bar(x + c * width, [r[cname] for r in data.values()],
                       width * 0.9, label=cname, zorder=3)
        ax.bar_label(rects, fmt="{:.1f}", padding=3)
    ax.set_xticks(x + 0.5 - width, rnames)
    ax.set_ylabel("Value", color="#555", fontsize=10)
    d = datetime.datetime.today()
    ax.set_title(d.strftime("Benchmark measured on %d/%m/%Y"),
                 color="#555")
    ax.set_ylim(0, 1.2 * max(max(r.values()) for r in data.values()))
    ax.tick_params(colors="#555")
    ax.spines[:].set_color("#555")
    ax.grid(axis="y", color="#aaa", linestyle="--", linewidth=0.7,
            zorder=0)
    ax.legend(facecolor="#222", edgecolor="#aaa", labelcolor="#fff",
              fontsize=10)
    plt.savefig(out_path)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    try:
        data, out = _load(argv)
        assert data
    except Exception:
        print(f"Usage: bench_chart.py <json-matrix> <out.svg>\n"
              f"   or: bench_chart.py --bench BENCH.json <out.svg>",
              file=sys.stderr)
        return 1
    render(data, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

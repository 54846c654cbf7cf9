"""Plot bench results: tok/s vs achieved GB/s per model/dtype.

Counterpart of the reference's tools/chart.py (which scatters its README
perf table); this one consumes the JSON lines that bench.py prints and/or
the BENCH_r*.json files the round driver records.

Usage:
  python bench.py ... | tee results.jsonl
  python tools/chart.py results.jsonl [more.jsonl ...] -o bench.png
"""

from __future__ import annotations

import argparse
import json
import sys


def load(paths):
    rows = []
    for path in paths:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or not line.startswith("{"):
                    continue
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--output", default="bench.png")
    args = ap.parse_args(argv)

    rows = load(args.inputs)
    if not rows:
        print("no benchmark rows found", file=sys.stderr)
        return 1

    # text table always; png only if matplotlib is around
    print(f"{'metric':<48} {'value':>8} {'vs_baseline':>12}")
    for r in rows:
        print(f"{r.get('metric', '?'):<48} {r.get('value', 0):>8.2f} "
              f"{r.get('vs_baseline', 0):>12.4f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; wrote table only", file=sys.stderr)
        return 0

    fig, ax = plt.subplots(figsize=(9, 5))
    labels = [r.get("metric", "?") for r in rows]
    values = [r.get("value", 0.0) for r in rows]
    ax.barh(labels, values)
    ax.axvline(92.0, linestyle="--", linewidth=1,
               label="reference ratio (92% of peak)")
    ax.set_xlabel(rows[0].get("unit", "value"))
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

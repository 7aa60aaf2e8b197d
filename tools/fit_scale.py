#!/usr/bin/env python3
"""Fit per-family growth exponents from scale-curve bench runs.

Usage: fit_scale.py LABEL=bench_full.json [LABEL=... ...]

Each file is a graft.Bench verbose line (target/bench_full.json). LABEL is
`<relative_size>:<name>` — e.g. 1:sf0.001=a.json 10:sf0.01=b.json
100:sf0.1=c.json — sizes relative to the smallest run. For every query present in all runs, prints
the per-decade exponent e = log(t2/t1)/log(s2/s1) between consecutive
sizes, and the top-decade exponent (the one the 100 TB claim rests on:
small-SF decades are floor-dominated by fixed per-query overhead).

A query whose time sits under FLOOR_SEC (default 0.3 s) at the smaller end
of a decade gets its exponent flagged '~' (floor-contaminated: the ratio
understates true growth because constant setup dominates the denominator).
"""
import json
import math
import sys

FLOOR_SEC = 0.3


def main() -> None:
    runs = []  # (size, name, queries)
    for arg in sys.argv[1:]:
        label, path = arg.split("=", 1)
        size, name = label.split(":", 1)
        with open(path) as f:
            doc = json.loads(f.read().strip().splitlines()[0])
        runs.append((float(size), name, doc["queries"]))
    runs.sort(key=lambda r: r[0])
    common = set(runs[0][2])
    for _, _, q in runs[1:]:
        common &= set(q)
    header = ["query"] + [
        f"{a[1]}->{b[1]}" for a, b in zip(runs, runs[1:])
    ] + ["t_max(s)"]
    rows = []
    for qn in sorted(common):
        cells = [qn]
        for (s1, _, q1), (s2, _, q2) in zip(runs, runs[1:]):
            t1, t2 = q1[qn], q2[qn]
            if t1 <= 0 or t2 <= 0:
                cells.append("fail")
                continue
            e = math.log(t2 / t1) / math.log(s2 / s1)
            flag = "~" if t1 < FLOOR_SEC else ""
            cells.append(f"{e:.2f}{flag}")
        cells.append(f"{runs[-1][2][qn]:.2f}")
        rows.append(cells)
    widths = [max(len(r[i]) for r in [header] + rows) for i in range(len(header))]
    for r in [header] + rows:
        print("  ".join(c.ljust(w) for c, w in zip(r, widths)))


if __name__ == "__main__":
    main()

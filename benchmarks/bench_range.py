#!/usr/bin/env python
"""Derive the README's cross-session headline range from EVERY committed
capture, so the published claim can never fall outside the evidence
(VERDICT r4 weak #3: a hand-written "830-920" range was falsified hours
later by the round-4 driver capture of 782).

Two measurement protocols exist for the 1024^2 m=10 SS2 headline and they
are NOT comparable, so the ranges are reported separately:

* "bench"      — bench.py: 2000-step chunks, median of 5, WITH the
                 historical full-state (8 MB) readback per chunk through
                 the axon tunnel. Driver captures (BENCH_r0*.json) and
                 in-session captures (benchmarks/results/bench_r0*.json)
                 both use it.
* "perf_table" — benchmarks/perf_table.py nlse2d_1024_ss2 rows: same
                 chunked timing but a tiny-slice readback (kernel-honest;
                 ~7% faster by construction).

Prints one JSON line; paste/regen the README range from it:
    python benchmarks/bench_range.py
"""

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "benchmarks", "results")
HEADLINE = "nlse2d_cubic_1024x1024_m10_steps_per_sec_per_chip"


def _bench_captures():
    rows = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r0*.json"))):
        with open(path) as f:
            d = json.load(f)
        p = d.get("parsed", d)
        if p and p.get("metric") == HEADLINE:
            rows.append((os.path.basename(path), p))
    for path in sorted(glob.glob(os.path.join(RESULTS, "bench_r0*.json"))):
        # session files may carry a leading backend-warning line
        with open(path) as f:
            text = f.read()
        m = re.search(r"\{.*\}", text, re.S)
        if not m:
            continue
        p = json.loads(m.group(0))
        if p.get("metric") == HEADLINE:
            rows.append((os.path.basename(path), p))
    return rows


def _perf_table_captures():
    rows = []
    for path in sorted(glob.glob(os.path.join(RESULTS,
                                              "perf_table_r0*.jsonl"))):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                p = json.loads(line)
                if p.get("metric") == "nlse2d_1024_ss2":
                    rows.append((os.path.basename(path), p))
    return rows


def _range(rows, rate_key):
    lo, hi, points = float("inf"), 0.0, []
    for name, p in rows:
        v = p[rate_key]
        lo = min(lo, p.get("min", v))
        hi = max(hi, p.get("max", v))
        points.append({"file": name, rate_key: v})
    return dict(min=round(lo, 0), max=round(hi, 0), n_captures=len(points),
                captures=points)


def main():
    out = {
        "metric": "headline_range_1024sq_m10_ss2",
        "bench_protocol": _range(_bench_captures(), "value"),
        "perf_table_protocol": _range(_perf_table_captures(),
                                      "steps_per_sec"),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

"""Nightly-style performance regression harness.

Behavioral reference: ngs-bits tools/benchmark/benchmark.php + Makefile —
per-test wall times are appended to a history file and the current run is
compared against the mean of the last N (default 3) recorded runs, printing
`#test  sec_nightly  sec_current  rel_change` rows.

Usage:
    python tools/benchmark/perf_regression.py record  [--history FILE]
        runs bench.py, appends one timestamped row per metric
    python tools/benchmark/perf_regression.py compare [--history FILE]
        compares the latest run against the mean of the previous 3;
        exits 1 when any metric regressed by more than --threshold (20%)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_HISTORY = os.path.join(REPO, "tools", "benchmark", "benchmark.tsv")


def _load_runs(history: str) -> list[dict[str, float]]:
    """History rows `run_ts  metric  value` grouped into runs by timestamp."""
    runs: dict[str, dict[str, float]] = {}
    if not os.path.exists(history):
        return []
    for line in open(history):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        ts, metric, value = line.split("\t")[:3]
        runs.setdefault(ts, {})[metric] = float(value)
    return [runs[ts] for ts in sorted(runs)]


def record(history: str, bench_json: str | None = None) -> dict[str, float]:
    if bench_json is None:
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, check=True)
        bench_json = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    data = json.loads(bench_json)
    metrics = {data["metric"]: float(data["value"])}
    for k, v in (data.get("extra") or {}).items():
        # extras also carry structured entries (method block, scaling
        # curves, lane outcome) — only scalar rates are tracked
        if isinstance(v, (int, float)):
            metrics[k] = float(v)
    ts = time.strftime("%Y-%m-%dT%H:%M:%S")
    new_file = not os.path.exists(history)
    os.makedirs(os.path.dirname(history), exist_ok=True)
    with open(history, "a") as fh:
        if new_file:
            fh.write("#run\tmetric\tvalue\n")
        for metric, value in sorted(metrics.items()):
            fh.write(f"{ts}\t{metric}\t{value}\n")
    return metrics


def compare(history: str, window: int = 3, threshold: float = 0.20) -> int:
    runs = _load_runs(history)
    if len(runs) < 2:
        print("#test\tsec_nightly\tsec_current\trel_change")
        print("(not enough history to compare)")
        return 0
    current = runs[-1]
    past = runs[-1 - window:-1]
    names = sorted({m for r in runs for m in r})
    print("#test\tvalue_nightly\tvalue_current\trel_change")
    rc = 0
    for name in names:
        past_vals = [r[name] for r in past if name in r]
        mean = sum(past_vals) / len(past_vals) if past_vals else None
        cur = current.get(name)
        if mean is None or cur is None or mean == 0:
            print(f"{name}\t{mean if mean is not None else '-'}"
                  f"\t{cur if cur is not None else '-'}\t-")
            continue
        # throughput metrics: lower is a regression
        rel = (cur - mean) / mean
        flag = ""
        if rel < -threshold:
            flag = " REGRESSION"
            rc = 1
        print(f"{name}\t{mean:.1f}\t{cur:.1f}\t{100 * rel:+.1f}%{flag}")
    return rc


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["record", "compare"])
    ap.add_argument("--history", default=DEFAULT_HISTORY)
    ap.add_argument("--window", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.20)
    ap.add_argument("--bench-json", default=None,
                    help="pre-computed bench.py JSON line (skips running bench)")
    args = ap.parse_args()
    if args.mode == "record":
        metrics = record(args.history, args.bench_json)
        print(f"recorded {len(metrics)} metrics to {args.history}")
        return 0
    return compare(args.history, args.window, args.threshold)


if __name__ == "__main__":
    sys.exit(main())

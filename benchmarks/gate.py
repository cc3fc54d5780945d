"""Benchmark regression gate (reference: ``make bench-continuous``,
``Makefile:93-99`` — fail if >FACTOR slower than the recorded baseline).

Runs ``bench.py``, compares the headline metric against a stored baseline
JSON, exits non-zero on regression, and refreshes the baseline when the new
number is better.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=float, default=1.10)
    ap.add_argument("--baseline", default="BENCH_baseline.json")
    args = ap.parse_args()

    out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                         text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    current = json.loads(line)
    print("current:", line)

    path = pathlib.Path(args.baseline)
    if not path.exists():
        path.write_text(line + "\n")
        print(f"baseline recorded → {path}")
        return 0

    baseline = json.loads(path.read_text())
    # higher is better for throughput metrics
    ratio = baseline["value"] / max(current["value"], 1e-12)
    print(f"baseline {baseline['value']} vs current {current['value']} "
          f"(slowdown ×{ratio:.3f}, gate ×{args.factor})")
    if ratio > args.factor:
        print("REGRESSION: benchmark gate failed")
        return 1
    if current["value"] > baseline["value"]:
        path.write_text(line + "\n")
        print("baseline improved → updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())

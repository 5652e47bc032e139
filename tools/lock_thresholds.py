"""Stamp measured benchmark numbers into tests/thresholds.yaml as locked
perf floors (analogue of ``hotpath/scripts/lock_thresholds.py:24-48``).

Usage: python tools/lock_thresholds.py --bench BENCH_r1.json [--margin 0.8]
Locks bench_min_* to margin * measured, and records device + timestamp.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--bench", required=True)
    parser.add_argument("--margin", type=float, default=0.8)
    parser.add_argument("--thresholds",
                        default=os.path.join(REPO, "tests/thresholds.yaml"))
    args = parser.parse_args()

    with open(args.bench) as f:
        bench = json.load(f)
    if "value" not in bench and "parsed" in bench:
        bench = bench["parsed"]   # driver wrapper format (BENCH_rNN.json)
    fwd = float(bench["value"]) * args.margin
    fb = float(bench.get("extra", {}).get("fwdbwd_Mrays_per_s", 0.0)) \
        * args.margin
    device = bench.get("extra", {}).get("device", "unknown")

    with open(args.thresholds) as f:
        text = f.read()
    text = re.sub(r"bench_min_fwd_mrays:\s*[-\d.eE+]+",
                  f"bench_min_fwd_mrays: {fwd:.2f}", text)
    text = re.sub(r"bench_min_fwdbwd_mrays:\s*[-\d.eE+]+",
                  f"bench_min_fwdbwd_mrays: {fb:.2f}", text)
    text = re.sub(r"locked_at:\s*\S+",
                  f"locked_at: {time.strftime('%Y-%m-%dT%H:%M:%S')}", text)
    text = re.sub(r"device:\s*.*", f'device: "{device}"', text)
    with open(args.thresholds, "w") as f:
        f.write(text)
    print(json.dumps({"locked": {"fwd": fwd, "fwdbwd": fb,
                                 "device": device}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Manifest-driven contract runner with a one-line JSON scoreboard.

The analogue of the reference OJ runner (``hotpath/tests/runner/
hp_runner.cpp:182-213``): reads ``tests/manifest.yaml``, runs each case's
pytest node, and prints exactly one JSON line

    {"cases": [{"name", "status", "message"}...],
     "summary": {"pass": N, "fail": N, "skip": N}}

Exit status is non-zero iff any case fails. Cases whose tests are missing
are reported as fail (contract drift), matching the runner's unknown-case
behavior.

Usage: python tools/run_manifest.py [--manifest tests/manifest.yaml]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_manifest(path: str) -> list[dict]:
    """Minimal YAML subset reader for the manifest (name/test pairs)."""
    cases = []
    current = None
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].rstrip()
            m = re.match(r"\s*-\s*name:\s*(\S+)", line)
            if m:
                current = {"name": m.group(1)}
                cases.append(current)
                continue
            m = re.match(r"\s*test:\s*(\S+)", line)
            if m and current is not None:
                # Quoted values (parametrized node ids contain brackets
                # that YAML wants quoted) must lose their quotes.
                current["test"] = m.group(1).strip("'\"")
    return [c for c in cases if "test" in c]


def _case_durations(xml_path: str) -> dict:
    """node-id -> seconds from the junit report (best effort: classname
    ``tests.test_x`` + test name reconstruct ``tests/test_x.py::name``)."""
    import xml.etree.ElementTree as ET

    times = {}
    try:
        for tc in ET.parse(xml_path).getroot().iter("testcase"):
            cls = (tc.get("classname") or "").replace(".", "/")
            node = f"{cls}.py::{tc.get('name')}"
            times[node] = times.get(node, 0.0) + float(tc.get("time", 0))
    except Exception:
        pass
    return times


def run_cases(cases: list[dict]) -> list[dict]:
    """One pytest invocation for all nodes; parse the result per node."""
    import tempfile
    import time as _time

    nodes = [c["test"] for c in cases]
    xml = tempfile.NamedTemporaryFile(suffix=".xml", delete=False)
    xml.close()
    # -o addopts= : the contract runner ALWAYS runs its full node set,
    # overriding the default suite's "-m 'not slow'" tier filter.
    cmd = [sys.executable, "-m", "pytest", "-q", "--no-header",
           "--tb=line", "-o", "addopts=", f"--junit-xml={xml.name}",
           *dict.fromkeys(nodes)]
    t0 = _time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    wall_s = _time.perf_counter() - t0
    durations = _case_durations(xml.name)
    os.unlink(xml.name)
    out = proc.stdout + proc.stderr

    # Parse pytest's terse failure lines into per-node status.
    failed_nodes = set()
    skipped_nodes = set()
    for line in out.splitlines():
        m = re.match(r"(FAILED|ERROR)\s+(\S+?)(?:\s+-|$)", line)
        if m:
            failed_nodes.add(m.group(2))
        m = re.match(r"SKIPPED.*\s(\S+::\S+)", line)
        if m:
            skipped_nodes.add(m.group(1))

    results = []
    for case in cases:
        node = case["test"]
        if node in failed_nodes:
            status, message = "fail", "pytest reported failure"
        elif node in skipped_nodes:
            status, message = "skip", "pytest reported skip"
        else:
            status, message = "pass", ""
        results.append({"name": case["name"], "status": status,
                        "message": message,
                        "seconds": round(durations.get(node, 0.0), 2)})

    # Collection errors (missing test): every case in a file that failed to
    # collect is a failure.
    if proc.returncode not in (0, 1):
        for r in results:
            if r["status"] == "pass":
                r["status"] = "fail"
                r["message"] = f"pytest exited {proc.returncode}"
    return results, wall_s


# The slow tier is bounded: the whole manifest (incl. slow-marked
# cases) must finish inside this wall-clock budget or the scoreboard
# fails (VERDICT r4 weak #7 - CI latency creep).
WALL_BUDGET_S = 1500.0


def build_scoreboard(results: list[dict], wall_s: float) -> dict:
    summary = {"pass": 0, "fail": 0, "skip": 0}
    for r in results:
        summary[r["status"]] += 1
    summary["wall_s"] = round(wall_s, 1)
    summary["wall_budget_s"] = WALL_BUDGET_S
    if wall_s > WALL_BUDGET_S:
        summary["fail"] += 1
        results.append({"name": "manifest_wall_budget", "status": "fail",
                        "message": f"manifest took {wall_s:.0f}s "
                                   f"> {WALL_BUDGET_S:.0f}s budget",
                        "seconds": round(wall_s, 2)})
    return {"cases": results, "summary": summary}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--manifest",
                        default=os.path.join(REPO, "tests/manifest.yaml"))
    args = parser.parse_args()

    cases = load_manifest(args.manifest)
    if not cases:
        print(json.dumps({"cases": [], "summary":
                          {"pass": 0, "fail": 1, "skip": 0},
                          "error": "empty manifest"}))
        return 1
    results, wall_s = run_cases(cases)
    scoreboard = build_scoreboard(results, wall_s)
    print(json.dumps(scoreboard))
    return 1 if scoreboard["summary"]["fail"] > 0 else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Refuse a contaminated or broken bench artifact BEFORE it is
committed (round-15 VERDICT item 6 — the self-label nobody checks is
not a gate).

Usage:
    python tools/gate_bench.py <bench.json> [...]   # explicit legs
    python tools/gate_bench.py                      # all committed BENCH_*.json

Exit 0 iff every artifact parses as one JSON object, is not
self-labeled "contaminated": true, and lists no failed queries.
BenchArtifactGateSpec runs the same check inside `sbt test`, so the
committed record is enforced even if this CLI is skipped.
"""
import glob
import json
import os
import sys


def check(path: str) -> str | None:
    try:
        with open(path, "r", encoding="utf-8") as f:
            d = json.load(f)
    except Exception as e:  # noqa: BLE001 - any parse failure is the finding
        return f"{path}: does not parse ({e}) — truncated artifact?"
    if d.get("contaminated", False):
        return (f"{path}: self-labeled contaminated (load_avg="
                f"{d.get('load_avg')}) — wall times measured contention; "
                "re-run the leg serially")
    if d.get("failed"):
        return f"{path}: failed queries {d['failed']} — not a clean perf record"
    return None


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(glob.glob(os.path.join(root, "BENCH_*.json")) +
                       glob.glob(os.path.join(root, "tools", "BENCH_*.json")))
    if not paths:
        print("gate_bench: no artifacts to check", file=sys.stderr)
        return 1
    problems = [p for p in (check(path) for path in paths) if p]
    for msg in problems:
        print(f"REFUSED {msg}", file=sys.stderr)
    if not problems:
        print(f"gate_bench: {len(paths)} artifacts clean")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

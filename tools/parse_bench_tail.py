#!/usr/bin/env python3
"""Simulate the round driver's bench-stdout parse.

The driver captures the bench run's stdout, keeps the last 2000 chars, and
tries to json.loads a line out of it (BENCH_r*.json "parsed"). All nine
prior rounds recorded parsed:null because sbt re-logged the forked stdout
with an "[info] " prefix. build.sbt now sets outputStrategy := StdoutOutput
and Global/showSuccess := false, so the compact JSON line Bench prints last
should survive the tail verbatim.

Usage: parse_bench_tail.py <stdout-capture-file>
Exit 0 iff a JSON object line with a "metric" key parses out of the tail.
"""
import json
import sys


def parse_tail(tail: str):
    """Last JSON-object line in the tail, the way a tail-then-loads driver
    would see it: try whole tail first, then line by line from the end."""
    try:
        return json.loads(tail)
    except ValueError:
        pass
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def main() -> int:
    raw = open(sys.argv[1], "r", errors="replace").read()
    tail = raw[-2000:]
    parsed = parse_tail(tail)
    if parsed is None or "metric" not in parsed:
        print("PARSE FAILED; tail was:\n" + tail, file=sys.stderr)
        return 1
    print(
        f"parsed ok: metric={parsed['metric']} value={parsed.get('value')} "
        f"n_queries={parsed.get('n_queries')} failed={parsed.get('failed')}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

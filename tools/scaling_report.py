#!/usr/bin/env python3
"""Emit the scaling table: per-query time ratio between two bench details.

Usage: scaling_report.py <detail_small.json> <detail_big.json> <data_ratio>
Prints a markdown table (time ratio vs data ratio) and flags any query with
time_ratio > 2 * data_ratio.
"""
import json
import sys


def main() -> int:
    small = json.load(open(sys.argv[1]))["queries"]
    big = json.load(open(sys.argv[2]))["queries"]
    data_ratio = float(sys.argv[3])
    rows = []
    for name in sorted(small, key=lambda n: -small[n]):
        if name not in big:
            rows.append((name, small[name], None, None))
            continue
        ratio = big[name] / small[name] if small[name] > 0 else float("inf")
        rows.append((name, small[name], big[name], ratio))
    print(f"| query | sf0.1 s | sf~1 s | time ratio (data {data_ratio:g}x) | verdict |")
    print("| --- | --- | --- | --- | --- |")
    flagged = []
    for name, s, b, r in rows:
        if r is None:
            print(f"| {name} | {s:.2f} | FAILED | - | FLAG |")
            flagged.append(name)
            continue
        verdict = "ok" if r <= 2 * data_ratio else "FLAG >2x data ratio"
        if r > 2 * data_ratio:
            flagged.append(name)
        print(f"| {name} | {s:.2f} | {b:.2f} | {r:.1f}x | {verdict} |")
    print()
    print(f"flagged: {flagged if flagged else 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

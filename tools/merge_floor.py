#!/usr/bin/env python3
"""Min-merge bench_detail.json captures into the committed floor.

Usage: python3 tools/merge_floor.py [--rebase q1,q2,...] <cap1.json> ... > bench_detail.json

The committed floor is the per-query MIN over clean solo captures (the
VM shows ±15% noise windows; min-of-captures is the stable statistic —
docs/BENCH_NOTES.md). Sidecar sections keep the best observation too:
min seconds for concurrent streams, max rows/s for throughput and
streaming. stddev / n_samples come from whichever capture supplied the
winning min, so the sidecar stays self-consistent per query.

--rebase q1,q2,...: queries whose ALGORITHM intentionally changed (so the
old floor is no longer attainable by design — e.g. r11's SHJ→SMJ
spill-safety swap). For those, the floor is the min over captures that
list the flag (i.e. the NEW captures only — pass old floors without the
flag); all other queries min-merge across everything as usual. The flag
set is recorded in the output under "rebased" for the notes.
"""
import json
import sys


def main(argv):
    rebase = set()
    if argv and argv[0] == "--rebase":
        rebase = set(argv[1].split(","))
        argv = argv[2:]
    paths = argv
    caps = [json.load(open(p)) for p in paths]
    # captures carrying prior floors are exactly those that already have a
    # floor_of list (a merged floor); fresh solo captures don't
    fresh = [c for c in caps if "floor_of" not in c]
    if rebase:
        # --rebase against only previously-merged floors would silently
        # min over the old, intentionally-unattainable values (a no-op)
        assert fresh, "--rebase given but every input is a merged floor"
    fresh = fresh or caps
    missing = {n for n in rebase if not any(n in c["queries"] for c in fresh)}
    assert not missing, f"--rebase keys absent from fresh captures: {missing}"
    base = dict(caps[-1])  # newest capture's metadata (sf, cpus, ...)
    names = sorted({n for c in caps for n in c["queries"]})
    queries, p50, stddev, n_samples = {}, {}, {}, {}
    for n in names:
        pool = fresh if n in rebase else caps
        best = min((c for c in pool if n in c["queries"]),
                   key=lambda c: c["queries"][n])
        queries[n] = best["queries"][n]
        # p50 comes from the NEWEST capture that records one (min is the
        # min-merge over all captures): the floor documents the best case,
        # p50 the current steady-state, so floor-luck on the iterative
        # queries is visible without re-measuring
        p50[n] = next((c["p50"][n] for c in reversed(pool)
                       if n in c.get("p50", {})), best["queries"][n])
        stddev[n] = best.get("stddev", {}).get(n, 0.0)
        n_samples[n] = best.get("n_samples", {}).get(n, "0")
    base["queries"] = queries
    base["p50"] = p50
    base["stddev"] = stddev
    base["n_samples"] = n_samples
    base["value"] = sum(queries.values())
    for key in [k for k in base if k.startswith("concurrent_x")]:
        merged = {}
        # subset captures (SPARK_GRAFT_BENCH_ONLY) record the section as
        # {"error": "section did not run"} — skip non-numeric entries
        for n in {x for c in caps for x in c.get(key, {})}:
            ts = [c[key][n] for c in caps if n in c.get(key, {})
                  and isinstance(c[key][n], (int, float)) and c[key][n] > 0]
            if ts:
                merged[n] = min(ts)
        base[key] = merged
    tps = [c.get("throughput", {}) for c in caps]
    base["throughput"] = max(tps, key=lambda t: float(t.get("rows_per_sec", 0)))
    # graph_cached: per-key min seconds over captures where the section ran
    # (subset captures record {"error": ...} — without this, a later subset
    # merge clobbers the only real observation; found r11)
    gcs = [c.get("graph_cached", {}) for c in caps
           if isinstance(c.get("graph_cached"), dict)
           and not c.get("graph_cached", {}).get("error")]
    if gcs:
        merged_gc = {}
        for k in {x for g in gcs for x in g}:
            vs = [float(g[k]) for g in gcs
                  if k in g and isinstance(g[k], (int, float)) and float(g[k]) > 0]
            if vs:
                merged_gc[k] = min(vs)
        base["graph_cached"] = merged_gc
    sts = [c.get("streaming", {}) for c in caps if c.get("streaming")]
    if sts:
        # per-key best observation: rows_per_sec keys take the max, *_sec
        # companions the min, so a newer capture's added keys (e.g. the
        # transformWithState family) survive a merge with an older floor
        merged_st = {}
        for k in {x for s in sts for x in s}:
            vs = [float(s[k]) for s in sts
                  if k in s and isinstance(s[k], (int, float)) and float(s[k]) > 0]
            if not vs:
                merged_st[k] = -1
            elif k.endswith("_rows_per_sec"):
                merged_st[k] = max(vs)
            elif k.endswith("_sec"):
                merged_st[k] = min(vs)
            elif k == "rows":
                merged_st[k] = int(max(vs))
            else:
                merged_st[k] = max(vs)
        base["streaming"] = merged_st
    base["floor_of"] = paths
    # the "rebased" record documents which floors historically came from a
    # fresh-only pool (an intentional algorithm change) — preserve the
    # union across inputs so a later plain merge doesn't erase the note
    recorded = {n for c in caps for n in c.get("rebased", [])} | rebase
    if recorded:
        base["rebased"] = sorted(recorded)
    # "rebase_gen" DATES each rebase: a per-query epoch counter, bumped
    # every time --rebase names the query, max-merged across inputs. The
    # plain "rebased" union says a floor was retired at SOME point, which
    # forces tools/floor_recover.py to refuse healing those queries after
    # an overwrite (it cannot tell pre- from post-rebase history); the
    # generation stamp lets it pool exactly the current-epoch versions.
    gens = {}
    for c in caps:
        for q, g in c.get("rebase_gen", {}).items():
            gens[q] = max(gens.get(q, 0), int(g))
    for q in rebase:
        gens[q] = gens.get(q, 0) + 1
    if gens:
        base["rebase_gen"] = gens
    # compact separators: Bench.committedMins regex-parses '"queries":{...}'
    json.dump(base, sys.stdout, separators=(",", ":"))
    print()


if __name__ == "__main__":
    main(sys.argv[1:])

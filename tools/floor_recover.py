#!/usr/bin/env python3
"""Heal the working bench_detail.json from recently committed versions.

Usage: python3 tools/floor_recover.py [--check | --write] [--window N]

Why this exists (rounds 13 and 15): twice now the committed floor file was
overwritten by a raw single-run capture — once by a builder session, once
by the driver's verdict commit — and the loss was only caught by a human
diffing git history. round_close.sh's regression guard compares the merged
floor against HEAD, so it is blind when HEAD ITSELF carries the overwrite.
This script closes that hole mechanically: the per-query floor is healed to
the min over the last N committed versions of bench_detail.json (default
12 — more than a full round of commits touching the file), so an overwrite
anywhere in the recent chain is recovered at the next close without a
human diffing history.

Why a WINDOW and not all of history: floors from the pre-merge_floor era
(rounds 1–5, when the file was replaced per capture rather than
min-merged) reflect a smaller suite and in some cases different query
semantics — e.g. q1_pricing_summary measured 0.245 s in the 82-query
round-3 file and has never been observed below 0.50 s across ten rounds
of clean min-merged captures since. Resurrecting such values would claim
performance the current code never exhibits. Recent history is era-safe:
semantics changes inside it are recorded by merge_floor's --rebase flag
at the time they happen.

Why LEGACY rebased queries are excluded: the "rebased" record is a
UNION across time — it marks that a query's algorithm changed at SOME
point, not when. Within a window that spans a rebase, pre-rebase versions
still list the query (from an earlier rebase's union), so a min over
"versions that flag it" can resurrect an intentionally-retired floor.
Queries rebased AFTER merge_floor.py started stamping "rebase_gen" (a
per-query epoch counter bumped at each --rebase) ARE healed: the pool is
exactly the in-window versions carrying the query's highest generation,
i.e. the current epoch. Queries whose rebases all predate the stamp stay
refused — recover those manually from the rebase commit.

Non-rebased floors are monotone non-increasing under correct operation
(min-merge only ever lowers them), so within the window, min-over-versions
is exactly "undo any overwrite" — no more, no less.

--check (default) reports what healing WOULD change and exits 1 if the
working file has lost floors; --write applies the healed floor in place.
Sidecars (concurrent_x*, throughput, streaming, graph_cached) take the
best observation across the window under merge_floor's rules.
"""
import json
import subprocess
import sys

FLOOR = "bench_detail.json"


def git(*args):
    return subprocess.check_output(["git"] + list(args), text=True)


def versions(window, any_source=False):
    revs = git("rev-list", "HEAD", "--", FLOOR).split()[:window]
    out = []
    for rev in revs:
        try:
            v = json.loads(git("show", f"{rev}:{FLOOR}"))
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            continue  # deleted at this rev, or a truncated/corrupt capture
        # Provenance gate (r15 verdict item 8): builder closes stamp
        # "source": "builder_close" via round_close.sh; a committed version
        # carrying a DIFFERENT stamp (e.g. a driver run) is excluded from
        # the healing pool by default. Unstamped versions predate the field
        # and are kept — they are the legitimate historic floors.
        src = v.get("source")
        if src is not None and src != "builder_close" and not any_source:
            continue
        out.append((rev, v))
    return out


def main(argv):
    write = "--write" in argv
    window = int(argv[argv.index("--window") + 1]) if "--window" in argv else 12
    working = json.load(open(FLOOR))
    hist = versions(window, any_source="--any-source" in argv)
    if not hist:
        print("floor_recover: no committed bench_detail.json in history")
        return 0
    rebased = {n for _, v in hist for n in v.get("rebased", [])}
    rebased |= set(working.get("rebased", []))
    healed = dict(working)
    queries = dict(working.get("queries", {}))
    p50 = dict(working.get("p50", {}))
    stddev = dict(working.get("stddev", {}))
    n_samples = dict(working.get("n_samples", {}))
    # current rebase epoch per query: the highest generation stamped on any
    # in-window version (the working file may be a raw capture that lost
    # its own rebase_gen, so history is the authority)
    hist_gen = {}
    for _, v in hist:
        for q, g in v.get("rebase_gen", {}).items():
            hist_gen[q] = max(hist_gen.get(q, 0), int(g))
    for q, g in working.get("rebase_gen", {}).items():
        hist_gen[q] = max(hist_gen.get(q, 0), int(g))
    fixed, skipped = [], []
    for name, cur in list(queries.items()):
        if not isinstance(cur, (int, float)):
            continue
        pool = [(rev, v) for rev, v in hist
                if isinstance(v.get("queries", {}).get(name), (int, float))]
        if name in rebased:
            if name in hist_gen:
                # epoch-stamped rebase: only current-generation versions
                pool = [(rev, v) for rev, v in pool
                        if v.get("rebase_gen", {}).get(name) == hist_gen[name]]
            else:
                pool = []  # legacy undated rebase — refuse below
        if not pool:
            if name in rebased:
                lower = [v["queries"][name] for _, v in hist
                         if isinstance(v.get("queries", {}).get(name),
                                       (int, float))
                         and v["queries"][name] < cur - 1e-9]
                if lower:
                    skipped.append((name, cur, min(lower)))
            continue
        rev, best = min(pool, key=lambda rv: rv[1]["queries"][name])
        val = best["queries"][name]
        if val < cur - 1e-9:
            fixed.append((name, cur, val, rev[:7]))
            queries[name] = val
            p50[name] = best.get("p50", {}).get(name, val)
            stddev[name] = best.get("stddev", {}).get(name, 0.0)
            n_samples[name] = best.get("n_samples", {}).get(name, "0")
    # sidecars: best observation across the window, same rules as merge_floor
    all_caps = [v for _, v in hist] + [working]
    for key in {k for c in all_caps for k in c if k.startswith("concurrent_x")}:
        merged = {}
        for n in {x for c in all_caps for x in c.get(key, {})}:
            ts = [c[key][n] for c in all_caps if n in c.get(key, {})
                  and isinstance(c[key][n], (int, float)) and c[key][n] > 0]
            if ts:
                merged[n] = min(ts)
        healed[key] = merged
    tps = [c.get("throughput", {}) for c in all_caps]
    healed["throughput"] = max(
        tps, key=lambda t: float(t.get("rows_per_sec", 0) or 0))
    gcs = [c.get("graph_cached", {}) for c in all_caps
           if isinstance(c.get("graph_cached"), dict)
           and not c.get("graph_cached", {}).get("error")]
    if gcs:
        merged_gc = {}
        for k in {x for g in gcs for x in g}:
            vs = [float(g[k]) for g in gcs
                  if isinstance(g.get(k), (int, float)) and float(g[k]) > 0]
            if vs:
                merged_gc[k] = min(vs)
        healed["graph_cached"] = merged_gc
    sts = [c.get("streaming", {}) for c in all_caps if c.get("streaming")]
    if sts:
        merged_st = {}
        for k in {x for s in sts for x in s}:
            vs = [float(s[k]) for s in sts
                  if isinstance(s.get(k), (int, float)) and float(s[k]) > 0]
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
        healed["streaming"] = merged_st
    healed["queries"] = queries
    healed["p50"] = p50
    healed["stddev"] = stddev
    healed["n_samples"] = n_samples
    healed["value"] = sum(v for v in queries.values()
                          if isinstance(v, (int, float)))
    if rebased:
        healed["rebased"] = sorted(rebased)
    if hist_gen:
        healed["rebase_gen"] = hist_gen  # restore epochs an overwrite lost
    for name, cur, val in sorted(skipped):
        print(f"floor_recover: '{name}' has a lower value in-window "
              f"({val:.3f} < {cur:.3f}) but is REBASED — left alone "
              f"(recover manually from the rebase commit if this is a loss)")
    if fixed:
        for name, cur, val, rev in sorted(fixed):
            print(f"floor_recover: '{name}' {cur:.3f} -> {val:.3f} (from {rev})")
        print(f"floor_recover: {len(fixed)} floors healed from the last "
              f"{window} versions; total "
              f"{sum(working['queries'].values()):.2f} -> "
              f"{healed['value']:.2f} s")
    else:
        print(f"floor_recover: working floor already matches the "
              f"{window}-version historic min "
              f"({len(queries)} queries, {healed['value']:.2f} s)")
    if write:
        with open(FLOOR, "w") as f:
            json.dump(healed, f, separators=(",", ":"))
            f.write("\n")
        print("floor_recover: healed floor written")
        return 0
    return 1 if fixed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against BASELINE.md's per-query floor.

Usage: python3 tools/benchdiff.py [bench_out.json] [--baseline BASELINE.md]

Parses the "Per-query best-of floor" table in BASELINE.md (plus the
round-9 addenda queries recorded only in prose), prints per-query
ratios bench/floor sorted worst-first, and flags ratios > 2x. Exits 1
if any query exceeds 2x, so it can gate a round.

Adjudication hint: graft.Bench (round 10+) embeds 1/5/15-min load
averages. If load_timed[0] is already a sizeable fraction of the core
count before the sweep starts, >2x outliers on untouched code are
ambient load, not regressions — the script prints that context next to
the verdict instead of making you re-run by hand.
"""
import json
import re
import signal
import sys

# behave like a normal unix filter under `| head`
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

# Queries whose floor is recorded only in BASELINE.md prose, not in any
# "### Per-query best-of floor" table (the parser takes the LAST table
# value per query, so a newer table supersedes older ones). Empty since
# the round-10 99-query table covers the full suite; add entries here
# for queries newer than the newest table.
ADDENDA = {}

THRESHOLD = 2.0


def parse_floor(baseline_path):
    floor = {}
    in_table = False
    rows_in_table = 0
    with open(baseline_path) as f:
        for line in f:
            if line.startswith("### Per-query best-of floor"):
                in_table = True
                rows_in_table = 0
                continue
            if in_table:
                m = re.match(r"\|\s*([A-Za-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|", line)
                if m:
                    # later tables overwrite earlier ones: newest wins
                    floor[m.group(1)] = float(m.group(2))
                    rows_in_table += 1
                elif rows_in_table and not line.strip().startswith("|"):
                    in_table = False
    floor.update(ADDENDA)
    return floor


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bench_path = args[0] if args else "/root/repo/bench_out.json"
    baseline_path = "/root/repo/BASELINE.md"
    if "--baseline" in sys.argv:
        baseline_path = sys.argv[sys.argv.index("--baseline") + 1]

    with open(bench_path) as f:
        bench = json.loads(f.readline())
    floor = parse_floor(baseline_path)
    if not floor:
        print(f"ERROR: no floor table parsed from {baseline_path}", file=sys.stderr)
        return 2

    queries = bench["queries"]
    rows, missing = [], []
    for name, sec in queries.items():
        if name in floor:
            rows.append((sec / floor[name] if floor[name] > 0 else float("inf"),
                         name, sec, floor[name]))
        else:
            missing.append(name)
    rows.sort(reverse=True)

    print(f"{'query':34s} {'bench':>8s} {'floor':>8s} {'ratio':>7s}")
    flagged = []
    for ratio, name, sec, fl in rows:
        mark = "  <-- >%gx" % THRESHOLD if ratio > THRESHOLD else ""
        if ratio > THRESHOLD:
            flagged.append(name)
        print(f"{name:34s} {sec:8.2f} {fl:8.2f} {ratio:6.2f}x{mark}")

    if not rows:
        # Zero shared query names means nothing was compared at all —
        # an "all within 2x" verdict here would mask a wholly-uncompared
        # run (renamed queries, wrong baseline file). Fail loudly.
        print(f"ERROR: no bench query names intersect the floor table "
              f"({len(queries)} bench queries, {len(floor)} floor entries) — "
              f"nothing compared.", file=sys.stderr)
        return 2

    total = sum(queries.values())
    floor_total = sum(fl for _, _, _, fl in rows)
    if rows:  # a floor table with zero shared query names would divide by 0
        print(f"\n{'TOTAL (common queries)':34s} {total - sum(queries[m] for m in missing):8.2f} "
              f"{floor_total:8.2f} {((total - sum(queries[m] for m in missing)) / floor_total):6.2f}x")
    if missing:
        print(f"no floor entry (new queries?): {', '.join(sorted(missing))}")

    # Load-context adjudication (present in round-10+ bench lines)
    if "load_timed" in bench:
        l1 = bench["load_timed"][0]
        cpus = int(bench.get("cpus", 0)) or 1
        runs = bench.get("runs", 1)
        print(f"\nhost context: load(1m) at timed-sweep start = {l1:.2f} on {cpus} cpus"
              f" | start={bench['load_start'][0]:.2f} end={bench['load_end'][0]:.2f}"
              f" | wall {bench.get('wall_sec', 0):.0f}s | best-of-{runs}"
              + (f" run_totals={bench['run_totals']}" if runs > 1 else ""))
        if flagged and l1 > 0.25 * cpus:
            print(f"VERDICT: {len(flagged)} queries >{THRESHOLD:g}x floor, but host was "
                  f"loaded before the sweep (load {l1:.1f} vs {cpus} cpus) — suspect "
                  f"ambient load; re-run with SPARK_GRAFT_BENCH_RUNS=3 to confirm.")
        elif flagged:
            print(f"VERDICT: {len(flagged)} queries >{THRESHOLD:g}x floor on a quiet host "
                  f"(load {l1:.1f}) — treat as real regressions: {', '.join(flagged)}")
        else:
            print("VERDICT: all queries within 2x of the recorded floor.")
    elif flagged:
        print(f"\nVERDICT: {len(flagged)} queries >{THRESHOLD:g}x floor (no load context "
              f"in this bench line): {', '.join(flagged)}")
    else:
        print("\nVERDICT: all queries within 2x of the recorded floor.")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())

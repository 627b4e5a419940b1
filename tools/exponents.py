#!/usr/bin/env python3
"""Per-family scaling exponents from two graft.Bench JSON lines.

Usage: python3 tools/exponents.py <bench_1x.json> <bench_10x.json>
                                  [--prev prev_totals.json]

Computes SCALING.md's "Per-family scaling exponents" table:
exponent = log10(t_10x / t_1x) for a 10x row-count step; 1.0 = linear,
< 1 = fixed overheads still dominate at this size. The family
partition mirrors the r16 table (prefix-based, with the multimodal
dedup pair queries attributed to multimodal, where their payload
parsing lives).

--prev compares family totals at 10x against a previous round's
{family: t_10x} dict and exits 1 if any family regressed > 1.5x —
the round-close gate from .claude/skills/verify/SKILL.md step 14.
Writes the current totals next to the 10x input as
<bench_10x>.family_totals.json for the NEXT round's --prev.
"""
import argparse, sys, json, math

MULTIMODAL_EXTRAS = {"dedup_image_ahash", "dedup_audio_fp"}
EMBEDDING_DEDUP = {"dedup_embedding", "dedup_embedding_ivf", "dedup_semantic"}


def family(name):
    if name in MULTIMODAL_EXTRAS or name.startswith("mm_"):
        return "multimodal"
    if name in EMBEDDING_DEDUP:
        return "embedding dedup"
    for prefix, fam in [
            ("asof_", "asof joins"),
            ("dedup_", "exact/near dedup (non-embedding)"),
            ("ann_", "ANN retrieval"),
            ("emb_", "quantize/embed"),
            ("text_", "text analysis"),
            ("corpus_", "corpus curation"),
            ("contamination", "corpus curation"),
            ("stream_", "streaming"),
            ("q", "relational"),
            ("agg_", "relational"),
            ("mj_", "relational")]:
        if name.startswith(prefix):
            return fam
    raise SystemExit(f"ERROR: no family for query {name!r} — "
                     f"extend tools/exponents.py's mapping")


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main():
    ap = argparse.ArgumentParser(
        description="Per-family scaling exponents from two Bench JSONs")
    ap.add_argument("bench_1x")
    ap.add_argument("bench_10x")
    ap.add_argument("--prev", metavar="prev_totals.json", default=None,
                    help="gate family 10x totals at 1.5x vs this dict")
    ns = ap.parse_args()
    prev_path = ns.prev
    q1, q10 = load(ns.bench_1x), load(ns.bench_10x)
    common = sorted(set(q1) & set(q10))
    only = set(q1) ^ set(q10)
    if only:
        print(f"note: {len(only)} queries in only one run: {sorted(only)}")
    fams = {}
    for name in common:
        fams.setdefault(family(name), []).append(name)
    rows, tot1, tot10 = [], 0.0, 0.0
    for fam in sorted(fams):
        names = fams[fam]
        t1 = sum(q1[n] for n in names)
        t10 = sum(q10[n] for n in names)
        tot1 += t1; tot10 += t10
        worst = max(names, key=lambda n: q10[n] / q1[n] if q1[n] > 0 else 0)
        wr = q10[worst] / q1[worst] if q1[worst] > 0 else float("inf")
        rows.append((fam, len(names), t1, t10, math.log10(t10 / t1),
                     f"{worst} ({wr:.1f}x)"))
    print("| family | queries | t_1x (s) | t_10x (s) | exponent | worst query (ratio) |")
    print("|---|---|---|---|---|---|")
    for fam, n, t1, t10, e, w in rows:
        print(f"| {fam} | {n} | {t1:.1f} | {t10:.1f} | {e:.2f} | {w} |")
    print(f"| **total** | {len(common)} | {tot1:.1f} | {tot10:.1f} | "
          f"{math.log10(tot10 / tot1):.2f} | — |")

    totals = {fam: round(t10, 2) for fam, n, t1, t10, e, w in rows}
    out = ns.bench_10x + ".family_totals.json"
    with open(out, "w") as f:
        json.dump(totals, f, indent=1)
    print(f"\nwrote {out}")
    if prev_path:
        prev = json.load(open(prev_path))
        bad = [(f, prev[f], totals[f]) for f in totals
               if f in prev and prev[f] > 0 and totals[f] / prev[f] > 1.5]
        for f, p, c in bad:
            print(f"REGRESSION {f}: 10x family total {c:.1f}s vs previous "
                  f"{p:.1f}s = {c / p:.2f}x (> 1.5x bar)")
        if bad:
            sys.exit(1)
        print(f"family totals vs previous: all within 1.5x "
              f"({len([f for f in totals if f in prev])} families compared)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Scale-ramp audit: per-query scaling exponents across two bench runs.

Usage: python3 tools/scaling.py bench_runs_sf001.json bench_runs_sf01.json SCALING.md

Reads two `bench_runs.json` artifacts produced by `graft.Bench` at two
scale factors (default protocol: sf0.01 and sf0.1 — a 10x data ramp) and
computes, per query, the empirical scaling exponent

    alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo)

so alpha == 1 is perfectly linear in data volume, alpha < 1 means fixed
overhead still dominates at these SFs, and alpha > 1 is super-linear —
the thing that kills a 100 TB run.

Queries whose LOW-SF time is below a floor (default 0.15 s) are marked
`overhead` rather than given an exponent: when t_lo is mostly session /
planning / streaming-harness fixed cost, the ratio measures overhead
amortization, not data scaling (and typically lands well under 1).

Exponents above the flag threshold (default 1.3) are listed separately
with whatever explanation `KNOWN` provides; an unexplained flag is the
audit failing.
"""
import json
import math
import sys

FLOOR = 0.15      # s at the low SF below which exponents are meaningless
FLAG = 1.3        # alpha above this needs an explanation

# Documented super-linear companions (SURVEY/VERDICT): exact all-pairs
# oracle twins whose scaled variants are the operating point.
KNOWN = {
    "q19_neardup": "exact all-pairs Jaccard oracle companion; scaled twin q26 (MinHash-LSH banding)",
    "q28_embed_neardup": "exact all-pairs cosine oracle companion (t=0.4 is below sign-LSH's useful regime); scaled twin q28b (banded, t=0.95, in-query candidate-volume certificate)",
}


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["sf"], d["queries"]


def main():
    lo_path, hi_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_lo, t_lo = load(lo_path)
    sf_hi, t_hi = load(hi_path)

    def sf_num(s):
        return float(s.rstrip("/").split("sf")[-1])

    ratio = sf_num(sf_hi) / sf_num(sf_lo)
    rows = []
    for name in sorted(set(t_lo) & set(t_hi)):
        lo, hi = t_lo[name], t_hi[name]
        if lo <= 0 or hi <= 0:
            rows.append((name, lo, hi, None, "bench-error"))
        elif lo < FLOOR:
            rows.append((name, lo, hi, None, "overhead"))
        else:
            a = math.log(hi / lo) / math.log(ratio)
            rows.append((name, lo, hi, a, None))

    flagged = [(n, lo, hi, a) for n, lo, hi, a, tag in rows
               if a is not None and a > FLAG]
    measured = [(n, lo, hi, a) for n, lo, hi, a, tag in rows if a is not None]
    overhead = [(n, lo, hi) for n, lo, hi, a, tag in rows if tag == "overhead"]

    with open(out_path, "w") as f:
        w = f.write
        w("# SCALING — per-query scale-ramp audit\n\n")
        w(f"Protocol: `graft.Bench` medians (3 runs after warm-up, noop sink)\n"
          f"at `{sf_lo}` and `{sf_hi}` (a {ratio:.0f}x data ramp) on the same\n"
          f"box back-to-back; exponent alpha = log(t_hi/t_lo)/log({ratio:.0f}).\n"
          f"alpha 1.0 = linear in data; > {FLAG} flagged. Queries under\n"
          f"{FLOOR}s at the low SF are overhead-dominated there (session +\n"
          f"planning fixed cost) and get no exponent — their high-SF time is\n"
          f"the meaningful number and appears in BENCH artifacts.\n\n")

        w("## Flagged (alpha > %.1f)\n\n" % FLAG)
        if not flagged:
            w("None.\n\n")
        else:
            w("| query | t(lo) s | t(hi) s | alpha | explanation |\n|---|---|---|---|---|\n")
            for n, lo, hi, a in sorted(flagged, key=lambda r: -r[3]):
                expl = next((v for k, v in KNOWN.items() if n.startswith(k)),
                            "**UNEXPLAINED — fix before scale-out**")
                w(f"| {n} | {lo:.3f} | {hi:.3f} | {a:.2f} | {expl} |\n")
            w("\n")

        w("## Measured exponents (t(lo) >= %.2fs)\n\n" % FLOOR)
        w("| query | t(lo) s | t(hi) s | alpha |\n|---|---|---|---|\n")
        for n, lo, hi, a in sorted(measured, key=lambda r: -(r[3] or 0)):
            w(f"| {n} | {lo:.3f} | {hi:.3f} | {a:.2f} |\n")
        w("\n")

        w(f"## Overhead-dominated at {sf_lo} ({len(overhead)} queries)\n\n")
        w("Low-SF time under the floor — dominated by fixed cost, exponent\n"
          "not meaningful. Sorted by high-SF time (the informative end).\n\n")
        w("| query | t(lo) s | t(hi) s |\n|---|---|---|\n")
        for n, lo, hi in sorted(overhead, key=lambda r: -r[2])[:25]:
            w(f"| {n} | {lo:.3f} | {hi:.3f} |\n")
        if len(overhead) > 25:
            w(f"\n({len(overhead) - 25} more under both floors — see bench artifacts.)\n")
        w("\n")

    unexplained = [n for n, *_ in flagged
                   if not any(n.startswith(k) for k in KNOWN)]
    print(f"measured={len(measured)} overhead={len(overhead)} "
          f"flagged={len(flagged)} unexplained={len(unexplained)}")
    for n in unexplained:
        print(f"UNEXPLAINED: {n}")
    sys.exit(1 if unexplained else 0)


if __name__ == "__main__":
    main()

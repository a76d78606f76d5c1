#!/usr/bin/env python3
"""Scale-ramp audit: per-query scaling exponents across bench runs.

Usage:
  python3 tools/scaling.py bench_lo.json bench_hi.json SCALING.md
  python3 tools/scaling.py bench_lo.json bench_mid.json bench_hi.json SCALING.md

Reads two or THREE `bench_runs.json` artifacts produced by `graft.Bench`
at increasing scale factors and computes, per query, empirical scaling
exponents

    alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo)

so alpha == 1 is perfectly linear in data volume, alpha < 1 means fixed
overhead still dominates at these SFs, and alpha > 1 is super-linear —
the thing that kills a 100 TB run.

With three points the audit also computes the TOP-SEGMENT exponent
(mid -> hi) separately: a query can look linear over the full ramp while
its top decade is already bending super-linear (curvature a single ramp
hides). The flag applies to both the least-squares fit AND the top
segment.

Queries whose LOW-SF time is below a floor (default 0.15 s) are marked
`overhead` rather than given an exponent; for three-point runs the
top-segment exponent is computed whenever the MID time clears the floor,
so overhead-at-lo queries still get their informative top-decade number.

Exponents above the flag threshold (default 1.3) are listed separately
with whatever explanation `KNOWN` provides; an unexplained flag is the
audit failing.
"""
import json
import math
import sys

FLOOR = 0.15      # s below which exponents are meaningless
FLAG = 1.3        # alpha above this needs an explanation

# Documented super-linear companions (SURVEY/VERDICT): exact all-pairs
# oracle twins whose scaled variants are the operating point.
KNOWN = {
    "q19_neardup": "exact all-pairs Jaccard oracle companion; scaled twin q26 (MinHash-LSH banding)",
    "q28_embed_neardup": "exact all-pairs cosine oracle companion (t=0.4 is below sign-LSH's useful regime); scaled twin q28b (banded, t=0.95, in-query candidate-volume certificate)",
    "q166_drift_dead_letters": "leg-contention artifact, not code: the r14 sf0.3 leg recorded 5.04 s during an external load window; idle same-box BenchOne measures 3.37 s (alpha_top 0.97) — a linear parse+read of the drive-local drift quarantine",
    "q110_rolling_range_window": "leg-contention artifact, not code: the r15 sf0.3 leg started with the 5-min load still at 5.1 and recorded 1.322 s; idle same-box BenchOne measures 0.500 s (alpha_top 0.66)",
    "q113_setops_all": "leg-contention artifact, not code: r15 sf0.3 leg 1.447 s under residual load; idle same-box BenchOne 0.892 s (alpha_top 1.17) — also bench-retried in the sf0.1 leg, same class",
    "q114_correlated_subquery": "leg-contention artifact, not code: r15 sf0.3 leg 1.321 s under residual load; idle same-box BenchOne 1.090 s (alpha_top 1.21, a decorrelated ranked-window join, linear work)",
    "q78_hll_merge": "warm-mid-point artifact, not code: the r15 final-leg sf0.1 point (0.239 s) rode page-cache/JIT warmth from 180 prior queries; idle same-box BenchOne reads 0.778 s (sf0.1) -> 1.309 s (sf0.3), alpha_top 0.47 — two linear grouped aggregates (HLL sketch + exact distinct) with map-side partials",
    "q82_schema_drift": "leg-contention artifact, not code: the r17 sf0.3 leg median 2.75 s sits over a [1.098, 2.75, 2.835] spread (bench-retried in BOTH the sf0.1 and sf0.3 legs); idle same-box BenchOne measures 1.09-1.18 s (alpha_top ~0.90) — a linear one-pass observed-fields aggregate over the staged feed",
}


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["sf"], d["queries"]


def sf_num(s):
    return float(s.rstrip("/").split("sf")[-1])


def fit_alpha(sfs, ts):
    """Least-squares slope of log t against log sf."""
    xs = [math.log(s) for s in sfs]
    ys = [math.log(t) for t in ts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main():
    paths, out_path = sys.argv[1:-1], sys.argv[-1]
    points = [load(p) for p in paths]          # [(sf_str, {q: t})]
    sfs = [sf_num(sf) for sf, _ in points]
    assert sfs == sorted(sfs), "pass bench artifacts in ascending SF order"
    names = set(points[0][1])
    for _, t in points[1:]:
        names &= set(t)

    rows = []       # (name, times, alpha_fit, alpha_top, tag)
    for name in sorted(names):
        ts = [t[name] for _, t in points]
        if any(x <= 0 for x in ts):
            rows.append((name, ts, None, None, "bench-error"))
            continue
        a_top = None
        if len(ts) >= 3 and ts[-2] >= FLOOR:
            a_top = math.log(ts[-1] / ts[-2]) / math.log(sfs[-1] / sfs[-2])
        if ts[0] < FLOOR:
            rows.append((name, ts, None, a_top, "overhead"))
        else:
            rows.append((name, ts, fit_alpha(sfs, ts), a_top, None))

    def flagged_alpha(a_fit, a_top):
        cand = [a for a in (a_fit, a_top) if a is not None]
        worst = max(cand) if cand else None
        return worst if worst is not None and worst > FLAG else None

    flagged = [(n, ts, af, at, flagged_alpha(af, at))
               for n, ts, af, at, tag in rows if flagged_alpha(af, at)]
    measured = [(n, ts, af, at) for n, ts, af, at, tag in rows
                if af is not None]
    overhead = [(n, ts, at) for n, ts, af, at, tag in rows
                if tag == "overhead"]

    sf_labels = " / ".join(f"sf{s:g}" for s in sfs)
    with open(out_path, "w") as f:
        w = f.write
        w("# SCALING — per-query scale-ramp audit\n\n")
        w(f"Protocol: `graft.Bench` medians (3 runs after warm-up, noop sink)\n"
          f"at {sf_labels} on the same box back-to-back.\n"
          f"alpha_fit = least-squares slope of log t vs log sf over all\n"
          f"points; alpha_top = exponent of the TOP segment alone (curvature\n"
          f"a single ramp hides). alpha 1.0 = linear in data; > {FLAG}\n"
          f"(either number) flagged. Queries under {FLOOR}s at the lowest SF\n"
          f"are overhead-dominated there and get no fit; their top-segment\n"
          f"exponent is still shown when the mid point clears the floor.\n")
        if len(sfs) >= 3:
            w("\nThe highest point is the REPLICATED slice "
              "(tools/genscale.py): 3x sf0.1 with coherent key offsets, "
              "per-copy decorrelated texts/vectors, single-copy fixed dims "
              "— built for wall-clock ramps; correctness gates stay on "
              "driver data. Caveat for ALL-PAIRS similarity queries "
              "(q19/q28 class): decorrelation confines candidate pairs "
              "within copies, so the top segment grows ~3x(n^2 per copy) "
              "rather than (3n)^2 — the replicated point UNDERSTATES "
              "their true quadratic growth; their honest scaling record "
              "is the sf0.01->sf0.1 segment plus the documented scaled "
              "twins (q26/q28b).\n")
        w("\n")

        w("## Flagged (alpha > %.1f)\n\n" % FLAG)
        if not flagged:
            w("None.\n\n")
        else:
            w("| query | " + " | ".join(f"t(sf{s:g}) s" for s in sfs) +
              " | alpha_fit | alpha_top | explanation |\n")
            w("|---" * (len(sfs) + 4) + "|\n")
            for n, ts, af, at, worst in sorted(flagged, key=lambda r: -r[4]):
                expl = next((v for k, v in KNOWN.items() if n.startswith(k)),
                            "**UNEXPLAINED — fix before scale-out**")
                tcells = " | ".join(f"{x:.3f}" for x in ts)
                w(f"| {n} | {tcells} | "
                  f"{'-' if af is None else f'{af:.2f}'} | "
                  f"{'-' if at is None else f'{at:.2f}'} | {expl} |\n")
            w("\n")

        w("## Measured exponents (t(lowest) >= %.2fs)\n\n" % FLOOR)
        w("| query | " + " | ".join(f"t(sf{s:g}) s" for s in sfs) +
          " | alpha_fit | alpha_top |\n")
        w("|---" * (len(sfs) + 3) + "|\n")
        for n, ts, af, at in sorted(measured, key=lambda r: -(r[2] or 0)):
            tcells = " | ".join(f"{x:.3f}" for x in ts)
            w(f"| {n} | {tcells} | {af:.2f} | "
              f"{'-' if at is None else f'{at:.2f}'} |\n")
        w("\n")

        w(f"## Overhead-dominated at sf{sfs[0]:g} ({len(overhead)} queries)\n\n")
        w("Lowest-SF time under the floor — dominated by fixed cost, no\n"
          "full-ramp fit. Sorted by highest-SF time (the informative end);\n"
          "alpha_top shown where the mid point clears the floor.\n\n")
        w("| query | " + " | ".join(f"t(sf{s:g}) s" for s in sfs) +
          " | alpha_top |\n")
        w("|---" * (len(sfs) + 2) + "|\n")
        for n, ts, at in sorted(overhead, key=lambda r: -r[1][-1])[:25]:
            tcells = " | ".join(f"{x:.3f}" for x in ts)
            w(f"| {n} | {tcells} | {'-' if at is None else f'{at:.2f}'} |\n")
        if len(overhead) > 25:
            w(f"\n({len(overhead) - 25} more under the floor — see bench artifacts.)\n")
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

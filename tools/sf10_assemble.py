#!/usr/bin/env python3
"""Assemble BENCH_r{N}_sf10.json from a scale_lane_sf10.sh stderr log.

Flag taxonomy (refines the raw "hop2 > 1.5*hop1" rule from VERDICT r13 #4,
which mislabels overhead-masked-linear keys: a perfectly linear operator
whose small-scale row is dominated by fixed JVM/plan overhead shows
hop1 << 10 and hop2 -> 10, tripping the raw rule while being exactly the
scale behaviour we want):
  - hop2 > 1.2 * data_ratio          -> superlinear_second_hop (diagnose)
  - hop2 > 1.5 * hop1, hop2 <= 1.2*R -> linear_overhead_masked_hop1
                                        (informational: asymptotic slope
                                        <= the data ratio; the first hop
                                        was fixed-overhead dominated)
  - otherwise                        -> no flag

Usage: tools/sf10_assemble.py <lane.log> <round> <outfile>
"""
import json
import math
import re
import sys

log, rnd, out = sys.argv[1], sys.argv[2], sys.argv[3]
RATIO = 10.0

rows = {}
km = {}
for line in open(log):
    m = re.match(r"lane (\S+) sf0\.1=(\S+) sf1=(\S+) sf10=(\S+)", line)
    if m:
        q, a, b, c = m.groups()
        rows[q] = tuple(None if v == "null" else float(v) for v in (a, b, c))
    m = re.match(r"lane kmeans fixed-k sf0\.1=(\S+) sf1=(\S+) sf10=(\S+)", line)
    if m:
        km = dict(zip(("sf0_1", "sf1", "sf10"),
                      (None if v == "null" else float(v) for v in m.groups())))


def fit_exp(ts):
    xs = [0.0, 1.0, 2.0]
    ys = [math.log10(t) for t in ts]
    xbar, ybar = sum(xs) / 3, sum(ys) / 3
    return round(sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) /
                 sum((x - xbar) ** 2 for x in xs), 2)


growth, flags = {}, {}
for q, (a, b, c) in sorted(rows.items()):
    if None in (a, b, c) or min(a, b, c) <= 0:
        growth[q] = None
        flags[q] = "missing_point"
        continue
    g1, g2 = b / a, c / b
    growth[q] = {"sf0_1": a, "sf1": b, "sf10": c,
                 "hop1": round(g1, 2), "hop2": round(g2, 2),
                 "fit_exponent": fit_exp([a, b, c])}
    if g2 > 1.2 * RATIO:
        flags[q] = "superlinear_second_hop"
    elif g2 > 1.5 * g1:
        flags[q] = "linear_overhead_masked_hop1"

doc = {
    "metric": "sf10_scale_lane", "unit": "sec",
    "sf": "sf0.1 -> target/sf1 (K=10) -> target/sf10 (K=100)",
    "data_ratio_per_hop": 10, "iterations": 2, "agg": "min",
    "isolation": "one JVM per (query, dir), 900s timeout",
    "growth": growth,
    "flags": flags,
    "flag_rule": ("superlinear_second_hop: hop2 > 1.2*ratio (genuinely "
                  "worse than linear in data); linear_overhead_masked_hop1: "
                  "hop2 > 1.5*hop1 but hop2 <= 1.2*ratio (asymptotic slope "
                  "<= the data ratio; the small-scale row was fixed-overhead "
                  "dominated - the expected signature of a LINEAR operator "
                  "measured from a 4s floor)"),
    "fit_note": ("fit_exponent = least-squares slope of log10(t) vs "
                 "log10(n) over the three points; ~0 = fixed-overhead "
                 "dominated, ~1 = linear, ~2 = quadratic. With a constant "
                 "overhead floor the 3-point fit UNDERSTATES the asymptotic "
                 "slope; hop2 is the better asymptotic estimate"),
    "kmeans_train_fixed_k": km,
    "kmeans_note": ("fixed k via SPARK_GRAFT_KMEANS_MOD=830/8300 (~24 "
                    "centroids at every scale) - the operator regime; "
                    "the declared %83 key is k ∝ N, quadratic by key "
                    "construction (BENCH_ISOLATION.md), excluded here"),
    "declared_scale_rows_note": (
        "VERDICT r14 #2: ivf_from_index and semdedup_from_index ARE the "
        "declared scale rows for their lanes; the in-plan forms below are "
        "named excluded controls, not scale evidence"),
    "excluded": {
        "ivf_topk": ("quadratic BY KEY CONSTRUCTION (rate-based %83 "
                     "centroid predicate => cents ∝ N => O(N²·D/83) "
                     "assignment); measured once at r14: 57.08 s at sf10 "
                     "vs 2.47 s for the bit-identical ivf_from_index twin "
                     "(same FULL hash oracle) - the controlled experiment "
                     "isolating the in-plan build stage"),
        "semdedup_execute": ("same in-plan assignment stage: 67.66 s at "
                             "sf10 (and the fixed-k control is WORSE, "
                             "118.31 s - within-cluster pairs Θ(N²/k)); "
                             "semdedup_from_index is the bit-identical "
                             "declared scale row (3.72 s at sf10)"),
        "prototype_prune": ("E229's in-plan form shares ivf_topk's "
                            "%83-predicate assignment stage by "
                            "construction; prototype_prune_from_index is "
                            "the bit-identical declared scale row"),
        "kmeans_train_declared": ("k ∝ N by the key's init predicate - "
                                  "measured at sf1; sf10 would be ~100x the "
                                  "sf1 row by construction"),
        "winnow/substring charsalt family": ("char-salt replication caps at "
                                             "27 copies (single-byte salt "
                                             "alphabet); the sf1 charsalt "
                                             "rows remain the content-"
                                             "varying evidence")},
}
json.dump(doc, open(out, "w"), indent=0)
print("wrote", out, "keys:", len(growth),
      "flags:", {k: v for k, v in flags.items()})

#!/usr/bin/env python3
"""Emit the sf1-lane-format artifact from a scale_lane_sf10.sh log
(VERDICT r14 #4: the seven r14 keys' sf1 growth lived only as prose in
BENCH_ISOLATION.md — this folds every sf10-lane key's sf0.1 and sf1
points, measured under the identical one-JVM-per-(query,dir) protocol,
into the machine-readable BENCH_r{N}_sf1.json so excursion detection
covers them). This round's sf1 lane is the sf10-lane key set; the full
~105-key sf1 battery remains BENCH_r13_sf1.json (unchanged tree paths).

Usage: tools/sf1_from_sf10.py <lane.log> <round> <outfile>
"""
import json
import re
import sys

log, rnd, out = sys.argv[1], sys.argv[2], sys.argv[3]

q01, q1 = {}, {}
for line in open(log):
    m = re.match(r"lane (\S+) sf0\.1=(\S+) sf1=(\S+) sf10=(\S+)", line)
    if m:
        q, a, b, _ = m.groups()
        q01[q] = None if a == "null" else float(a)
        q1[q] = None if b == "null" else float(b)

growth = {q: (round(q1[q] / q01[q], 1)
              if q01.get(q) and q1.get(q) else None)
          for q in q01}
doc = {
    "metric": "sf1_scale_lane", "unit": "sec",
    "sf": "target/sf1 (ScaleGen K=10 over sf0.1)",
    "data_ratio": 10, "iterations": 2, "agg": "min",
    "isolation": "one JVM per query (shared runs with the sf10 lane)",
    "queries_sf0_1": q01, "queries_sf1": q1, "growth": growth,
    "note": ("r15: this lane is the sf10-lane key set (incl. the seven "
             "r14 keys and the five r15 keys) assembled from the same "
             "runs as BENCH_r%s_sf10.json; the full-battery sf1 lane is "
             "BENCH_r13_sf1.json (tree paths unchanged since)" % rnd),
    "excluded": {
        "ivf_topk / semdedup_execute / prototype_prune": (
            "in-plan %83-predicate forms - quadratic by key "
            "construction; their artifact-served twins are the declared "
            "scale rows (VERDICT r14 #2)")},
}
json.dump(doc, open(out, "w"), indent=0)
print("wrote", out, "keys:", len(growth))

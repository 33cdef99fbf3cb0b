#!/usr/bin/env python3
"""Emit the README scale-lane markdown table from BENCH_r{N}_sf1.json."""
import json
import sys

doc = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "BENCH_r10_sf1.json"))
rows = sorted(doc["growth"], key=lambda q: doc["growth"][q])
print("| query | sf0.1 s | sf1 s | growth | reading |")
print("|---|---|---|---|---|")
for q in rows:
    a, b, g = doc["queries_sf0_1"][q], doc["queries_sf1"][q], doc["growth"][q]
    print(f"| {q} | {a:.2f} | {b:.2f} | {g}× | |")
print()
print("specials:", {k: v for k, v in doc.items() if k.startswith(("winnow_near_dup_char", "streaming_incremental_profile_sf1"))})
print("excluded:", doc.get("excluded"))

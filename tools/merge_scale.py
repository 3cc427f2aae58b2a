#!/usr/bin/env python3
"""Merge a partial scale-rehearsal JSON (a ScaleBench run narrowed with
SPARK_GRAFT_ONLY / different factors) into BENCH_SCALE.json: each query
present in the partial file replaces its entry wholesale (the partial
run's decades are self-consistent — measured in one window), the
protocol's factor/deep lists become the union of per-query decades
actually present, and the summary flag list is recomputed.

Usage: python3 tools/merge_scale.py <partial.json> [BENCH_SCALE.json]
"""
import json, sys

partial_path = sys.argv[1]
base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALE.json"
base = json.load(open(base_path))
partial = json.load(open(partial_path))

base["queries"].update(partial["queries"])

def decades(q):
    return sorted(int(k[:-1]) for k in q
                  if k.endswith("x") and k[:-1].isdigit())

per_query = {n: decades(q) for n, q in base["queries"].items()}
common = set.intersection(*[set(d) for d in per_query.values()])
deep_factors = sorted({f for d in per_query.values() for f in d} - common)
deep_queries = sorted(n for n, d in per_query.items()
                      if set(d) - common)
base["protocol"]["factors"] = sorted(common)
base["protocol"]["deep"] = (
    {"factors": deep_factors, "queries": deep_queries}
    if deep_factors else None)
base["summary"] = {
    "n_queries": len(base["queries"]),
    "super_linear_2x_flagged": sorted(
        n for n, q in base["queries"].items() if q.get("super_linear_2x")),
}
json.dump(base, open(base_path, "w"), indent=1)
open(base_path, "a").write("\n")
print(f"merged {len(partial['queries'])} queries from {partial_path} "
      f"into {base_path}; factors={base['protocol']['factors']} "
      f"deep={base['protocol']['deep']}")

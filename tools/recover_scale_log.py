#!/usr/bin/env python3
"""Recover completed per-query results from a dead ScaleBench run's log.

A ScaleBench run that dies mid-flight (killed JVM) historically lost its
whole artifact because the JSON was written once at the end.  The log
still contains every Bench.forkOne result line, so this script rebuilds
the ScaleBench per-query JSON for queries whose full factor ladder
completed, ready for tools/merge_scale.py.

Usage: recover_scale_log.py <scalebench.log> <out_partial.json> \
           <expected_factor_count>
Only queries with exactly <expected_factor_count> measured factors are
emitted (partial ladders are dropped — a fresh run must redo them).
"""
import json, math, re, sys

log_path, out_path, expect = sys.argv[1], sys.argv[2], int(sys.argv[3])

hdr = re.compile(r"\[scalebench\] (\w+) @ (\d+)x")
met = re.compile(r'(\{"metric":"total".*\})')

queries = {}  # name -> list of (factor, detail-dict)
pending = None
for line in open(log_path):
    m = hdr.search(line)
    if m:
        pending = (m.group(1), int(m.group(2)))
        continue
    m = met.search(line)
    if m and pending:
        obj = json.loads(m.group(1))
        name, factor = pending
        # Bench also prints a compact summary line ({"metric":"total"...}
        # with "queries" but no "runs" — e.g. a SPARK_GRAFT_FORK=0 run or
        # captured child stdout); only the detail line carries this query
        if "runs" not in obj or name not in obj["runs"]:
            continue
        detail = obj["runs"][name]
        # a restarted run appended to the same log can repeat a (name,
        # factor) pair — keep the last occurrence, not both
        rows = queries.setdefault(name, [])
        rows[:] = [r for r in rows if r[0] != factor]
        rows.append((factor, obj["value"], detail))
        pending = None


def slope(pts):
    xs = [math.log10(f) for f, _ in pts]
    ys = [math.log10(t) for _, t in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den if den else 0.0


out = {}
for name, rows in queries.items():
    if len(rows) != expect:
        print(f"skip {name}: only {len(rows)}/{expect} factors", file=sys.stderr)
        continue
    pts = [(f, v) for f, v, _ in rows if v > 0]
    exp = slope(pts) if len(pts) >= 2 else None
    base = next((v for f, v, _ in rows if f == 1), -1.0)
    at10 = next((v for f, v, _ in rows if f == 10), -1.0)
    q = {
        "scaling_exponent": round(exp, 3) if exp is not None else None,
        "ratio_at_10x": round(at10 / base, 2) if base > 0 and at10 > 0 else None,
        "super_linear_2x": exp is not None and exp > 1.301,
    }
    for f, v, d in rows:
        q[f"{f}x"] = {
            "sec": round(v, 3),
            "runs": [round(t, 3) for t in d["times"]],
            "warmup": round(d["warmup"], 3),
            **{k: d[k] for k in ("shuffle_read_mb", "shuffle_write_mb",
                                 "spill_mb", "peak_task_mem_mb") if k in d},
        }
    out[name] = q

json.dump({"queries": out}, open(out_path, "w"), indent=1)
print(f"recovered {sorted(out)} -> {out_path}")

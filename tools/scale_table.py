#!/usr/bin/env python3
"""Render BENCH_SCALE.json as the README's markdown table: seconds and
shuffle-write MB per scale point, ratio at 10x, and the fitted scaling
exponent. Usage: python3 tools/scale_table.py [BENCH_SCALE.json]
"""
import json, sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALE.json"
data = json.load(open(path))
qs = data["queries"]

factors = sorted({int(k[:-1]) for q in qs.values() for k in q
                  if k.endswith("x") and k[:-1].isdigit()})
hdr = ["query"]
for f in factors:
    # factor 1 is whatever source dir the rehearsal ran against — the
    # JSON doesn't record its scale, so don't guess a label for it
    lbl = "1x (src)" if f == 1 else f"{f}x"
    hdr += [f"{lbl} s", f"{lbl} shW MB"]
hdr += ["ratio@10x", "exponent"]
print("| " + " | ".join(hdr) + " |")
print("|" + "---|" * len(hdr))
for name in sorted(qs):
    q = qs[name]
    row = [name]
    for f in factors:
        p = q.get(f"{f}x")
        if p is None:
            row += ["—", "—"]
        else:
            row += [f"{p['sec']:.2f}",
                    f"{p['shuffle_write_mb']:.0f}" if "shuffle_write_mb" in p
                    else "—"]
    r = q.get("ratio_at_10x")
    e = q.get("scaling_exponent")
    row += [f"{r:.1f}×" if r is not None else "—",
            f"{e:.2f}" if e is not None else "—"]
    print("| " + " | ".join(row) + " |")

#!/usr/bin/env python3
"""Compare two bench runs' [bench] per-query stderr lines.
Usage: bench_compare.py BASE_FILE NEW_FILE [threshold_sec]"""
import re, sys

def load(path):
    d = {}
    for line in open(path):
        m = re.match(r"\[bench\] (\S+)\s+([0-9.]+) s", line)
        if m and m.group(1) not in ("cal", "stio"):
            d[m.group(1)] = float(m.group(2))
    return d

base, new = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
rows = [(n, base.get(n), new.get(n)) for n in sorted(set(base) | set(new))]
shown = [(n, b, m) for n, b, m in rows
         if b is not None and m is not None and (b > thr or m > thr)]
shown.sort(key=lambda r: -(r[1] or 0))
print(f"{'query':30} {'base':>7} {'new':>7} {'ratio':>6}")
for n, b, m in shown:
    print(f"{n:30} {b:7.3f} {m:7.3f} {m/b:6.2f}")
both = [(b, m) for _, b, m in rows if b is not None and m is not None]
print(f"\nshared-row totals: base {sum(b for b,_ in both):.1f}s -> "
      f"new {sum(m for _,m in both):.1f}s over {len(both)} rows")

#!/usr/bin/env python3
"""Compare two bench artifacts at different scale factors and flag
super-linear rows: ratio = t_big / t_small vs the data growth factor.
Usage: scale_compare.py <small.json> <big.json> <growth> [flag_factor=1.5]
A row is flagged super-linear when t_big > growth * flag_factor * t_small
and t_big is non-trivial (>0.5 s) — tiny rows are planning noise.
"""
import json, sys

def load(p):
    # artifacts may carry several JSON lines (tail record) — take the one
    # with the biggest per-query map
    best = {}
    rec = None
    for ln in open(p).read().strip().splitlines():
        ln = ln.strip()
        if not ln.startswith('{'):
            continue
        try:
            d = json.loads(ln)
        except Exception:
            continue
        q = d.get('queries', {})
        if len(q) >= len(best):
            best, rec = q, d
    return rec, best

small_p, big_p, growth = sys.argv[1], sys.argv[2], float(sys.argv[3])
flag = float(sys.argv[4]) if len(sys.argv) > 4 else 1.5
rs, qs = load(small_p)
rb, qb = load(big_p)
shared = sorted(set(qs) & set(qb))
print(f"shared={len(shared)} small_total={rs['value']} big_total={rb['value']} "
      f"total_ratio={rb['value']/rs['value']:.2f} growth={growth}")
sup, sub = [], []
for q in shared:
    a, b = qs[q], qb[q]
    r = b / a if a > 0 else float('inf')
    if b > 0.5 and r > growth * flag:
        sup.append((r, q, a, b))
    elif b > 0.5 and r < growth / flag:
        sub.append((r, q, a, b))
print(f"\nSUPER-LINEAR rows (ratio > {growth*flag:.1f}x, big > 0.5 s): {len(sup)}")
for r, q, a, b in sorted(sup, reverse=True):
    print(f"  {q:32s} {a:8.3f}s -> {b:8.3f}s  ({r:.1f}x)")
print(f"\nsub-linear rows (ratio < {growth/flag:.1f}x, big > 0.5 s): {len(sub)}")
for r, q, a, b in sorted(sub):
    print(f"  {q:32s} {a:8.3f}s -> {b:8.3f}s  ({r:.1f}x)")
top = sorted(((qb[q], q) for q in shared), reverse=True)[:12]
print("\nmost expensive at big scale:")
for t, q in top:
    print(f"  {q:32s} {t:8.3f}s  (small {qs[q]:.3f}s)")

#!/usr/bin/env python3
"""Compare two bench_history.jsonl entries per query.

Usage: python3 tools/bench_compare.py [idx_a idx_b]
Defaults to the last two recorded runs. Negative indices allowed.
Prints queries sorted by absolute delta, worst regressions first,
so a round's perf work can be judged against the previous record
instead of a single noisy sample.
"""
import json
import os
import sys

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl")

def main():
    with open(HISTORY) as f:
        runs = [json.loads(l) for l in f if l.strip()]
    if len(runs) < 2:
        sys.exit("need at least two recorded runs")
    if len(sys.argv) not in (1, 3):
        sys.exit("usage: bench_compare.py [idx_a idx_b]  (two indices or none)")
    ia, ib = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) == 3 else (-2, -1)
    a, b = runs[ia], runs[ib]
    qa, qb = a["queries"], b["queries"]
    print(f"A: ts={a.get('ts','?')} total={a['value']:.1f}s ({len(qa)} queries)")
    print(f"B: ts={b.get('ts','?')} total={b['value']:.1f}s ({len(qb)} queries)")
    rows = []
    for k in sorted(set(qa) | set(qb)):
        va, vb = qa.get(k), qb.get(k)
        if va is None or vb is None:
            rows.append((float("inf"), k, va, vb, None))
        else:
            rows.append((abs(vb - va), k, va, vb, vb - va))
    rows.sort(reverse=True)
    print(f"{'query':34} {'A(s)':>8} {'B(s)':>8} {'delta':>8}")
    shown = rows[:25]
    for _, k, va, vb, delta in shown:
        fa = f"{va:.2f}" if va is not None else "-"
        fb = f"{vb:.2f}" if vb is not None else "-"
        fd = f"{delta:+.2f}" if delta is not None else "new/gone"
        print(f"{k:34} {fa:>8} {fb:>8} {fd:>8}")
    if len(rows) > len(shown):
        rest = rows[len(shown):]
        print(f"... and {len(rest)} more with |delta| <= {rest[0][0]:.2f}s")

if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into head is fine
        pass

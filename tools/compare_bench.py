#!/usr/bin/env python3
"""Round-over-round bench mover table.

Usage: compare_bench.py <old_bench.json> <new_bench.json> [flag_ratio]

Reads the TRIMMED medians (queries_trimmed — drop each task's worst
pass, then median) when both artifacts carry them, else falls back to
the raw medians; prints matched-task totals and every task whose
trimmed ratio crosses the flag threshold (default 1.15) with >0.1 s
absolute movement, plus the largest improvements.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    return d


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.15
    key = ("queries_trimmed"
           if "queries_trimmed" in old and "queries_trimmed" in new
           else "queries")
    qo, qn = old[key], new[key]
    matched = sorted(set(qo) & set(qn))
    ok = [q for q in matched if qo[q] > 0 and qn[q] > 0]
    print(f"comparing on {key}: {len(matched)} matched tasks "
          f"({len(matched) - len(ok)} crashed/absent sides skipped)")
    so, sn = sum(qo[q] for q in ok), sum(qn[q] for q in ok)
    print(f"matched sum: {so:.2f} -> {sn:.2f} s "
          f"({(sn - so) / so * 100:+.1f}%)")
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        extra = sum(qn[q] for q in only_new if qn[q] > 0)
        print(f"new tasks ({len(only_new)}): "
              + " ".join(f"{q}={qn[q]:.2f}" for q in only_new)
              + f"  (+{extra:.2f} s)")
    regs = [(qn[q] / qo[q], q) for q in ok
            if qn[q] / qo[q] > flag and qn[q] - qo[q] > 0.1]
    print(f"\nregressions over {flag}x (+0.1 s): {len(regs)}")
    for r, q in sorted(regs, reverse=True):
        print(f"  {q:32s} {qo[q]:6.2f} -> {qn[q]:6.2f}  ({r:.2f}x)")
    imps = sorted(((qn[q] - qo[q], q) for q in ok))[:8]
    print("\nlargest improvements:")
    for d, q in imps:
        if d < -0.05:
            print(f"  {q:32s} {qo[q]:6.2f} -> {qn[q]:6.2f}  ({d:+.2f} s)")
    for art, name in ((old, sys.argv[1]), (new, sys.argv[2])):
        st = art.get("cpu_steal", [])
        if st:
            print(f"steal {name}: mean {sum(st)/len(st):.3f} "
                  f"max {max(st):.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Compare two BENCH json files (graft.Bench output / driver BENCH_r{N}),
flagging per-query ratio outliers against the run-pair's median ratio.

This box has 1.5-3x run-to-run variance, so a raw ratio is meaningless:
a query only counts as a regression candidate if its ratio exceeds the
median ratio of ALL shared queries (the machine-noise baseline) by the
given factor.

Usage: bench_diff.py OLD.json NEW.json [--factor 1.5]
"""
import json, sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--factor="):
            factor = float(a[len("--factor="):])
    def load(path):
        d = json.load(open(path))
        if "queries" in d:
            return d["queries"]
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return d["parsed"]["queries"]
        raise SystemExit(f"{path}: no 'queries' (driver file with parsed=null?)")

    old = load(args[0])
    new = load(args[1])
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries"); return
    ratios = {q: new[q] / old[q] for q in shared if old[q] > 0}
    med = sorted(ratios.values())[len(ratios) // 2]
    print(f"{len(shared)} shared queries; median ratio {med:.2f} "
          f"(machine-noise baseline)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        tot = sum(new[q] for q in only_new)
        print(f"{len(only_new)} new queries (+{tot:.1f}s): "
              + ", ".join(only_new))
    flagged = [(q, r) for q, r in ratios.items() if r > med * factor]
    for q, r in sorted(flagged, key=lambda x: -x[1]):
        print(f"  REGRESSION? {q}: {old[q]:.2f}s -> {new[q]:.2f}s "
              f"({r:.2f}x vs noise {med:.2f}x)")
    if not flagged:
        print("no per-query regressions beyond machine noise")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Vacuity audit over check.py logs: a green row is only evidence if it
is non-vacuous. Round 14 found 7 queries green-but-0-rows on the
remapped corpora (literal id/magnitude thresholds selecting nothing,
both engines agreeing on empty) — 6 of them silently vacuous for two
certified rounds. This tool makes the audit a one-liner:

    python3 tools/vacuity.py <baseline_check_log> <probe_check_log> [...]

Flags, per probe log:
  - VACUOUS:  0 rows in the probe log where the baseline had >0 —
              the green certifies nothing on that corpus; suspect a
              corpus-accident literal in the query contract.
  - SHRUNK:   probe rows < 20% of baseline — test power quietly
              reduced (the q70 class: a literal extent compressing a
              remapped distribution).
  - ZERO-EVERYWHERE: 0 rows in baseline AND probe — the query never
              certifies anything; tighten its filter (the q05 lesson).

Exit 1 if any VACUOUS or ZERO-EVERYWHERE rows are found (SHRUNK is a
warning — some shrinks are legitimate distribution changes)."""
import re
import sys


def rows(path):
    d = {}
    for line in open(path):
        m = re.match(r"ok\s+(\S+) \((\d+) rows\)", line)
        if m:
            d[m.group(1)] = int(m.group(2))
    return d


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    base = rows(sys.argv[1])
    bad = False
    for probe_path in sys.argv[2:]:
        probe = rows(probe_path)
        for q in sorted(probe):
            b, p = base.get(q), probe[q]
            if b is None:
                continue
            if p == 0 and b > 0:
                print(f"VACUOUS          {q}: {b} -> 0 rows ({probe_path})")
                bad = True
            elif p == 0 and b == 0:
                print(f"ZERO-EVERYWHERE  {q} ({probe_path})")
                bad = True
            elif p < 0.2 * b:
                print(f"SHRUNK           {q}: {b} -> {p} rows ({probe_path})")
    print("vacuity: FAIL" if bad else "vacuity: ok")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

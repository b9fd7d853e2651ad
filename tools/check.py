#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (sorted columns, sorted rows, exact
value equality).

Usage: check.py <sfDir> <verifyOutDir> [--skip q1,q2,...] [--only q1,q2,...]

--skip-quadratic: retained as a NO-OP for muscle memory — since round 8
  the dedup oracles generate pairs via a linear shared-shingle equi-join
  (DedupQueries.pairCtes), so the full surface is checkable at sf0.1
  (~80 s total DuckDB time, dominated by q35's char-8-gram join).

Vacuity (round 14's 7 silent greens, folded in per round-14 verdict #6):
every run writes a machine-readable row-count sidecar <outdir>/rows.json.
Pass --baseline=<rows.json | check log> to auto-diff this run against a
baseline-corpus run: VACUOUS (baseline>0 -> 0) and ZERO-EVERYWHERE
(0 in both) exit 1; SHRUNK (<20% of baseline) warns."""
import duckdb, json, sys, math, os

QUADRATIC = set()  # emptied in round 8: all oracles are linear now

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_out"
    skip, only, baseline = set(), None, None
    for a in sys.argv[1:]:
        if a == "--skip-quadratic": skip |= QUADRATIC
        elif a.startswith("--skip="): skip |= set(a[len("--skip="):].split(","))
        elif a.startswith("--only="): only = set(a[len("--only="):].split(","))
        elif a.startswith("--baseline="): baseline = a[len("--baseline="):]
    con = duckdb.connect()
    # x30-oracle scale: the default budget (80% of RAM but tracked
    # pessimistically) ran q157's CTE chain out of memory at 18M rows;
    # an explicit limit + no insertion-order preservation keeps every
    # oracle inside the box. Output compare sorts rows anyway.
    # Cap at min(48GB, 80% of physical RAM) so a smaller box degrades to
    # DuckDB's graceful spill/OOM-error rather than an OS OOM-kill;
    # GRAFT_DUCKDB_MEM overrides.
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if not mem:
        gb = 48
        try:
            with open("/proc/meminfo") as f:
                kb = int(next(l for l in f if l.startswith("MemTotal")).split()[1])
            gb = min(48, max(1, int(kb * 0.8 / 1048576)))
        except Exception:
            pass
        mem = f"{gb}GB"
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # a table may be a single parquet file (driver testdata) or a
        # directory of part files (ScaleUp / CorpusB output)
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = n_skip = 0
    row_counts = {}
    for name in sorted(oracle):
        if name in skip or (only is not None and name not in only):
            print(f"skip {name}"); n_skip += 1; continue
        path = f"{outdir}/{name}"
        if not os.path.isdir(path):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, gr = canon(got); wc, wr = canon(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}"); n_fail += 1; continue
        if gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  spark:  {gr[bad]}")
            print(f"  oracle: {wr[bad]}")
            n_fail += 1; continue
        print(f"ok   {name} ({len(gr)} rows)"); n_ok += 1
        row_counts[name] = len(gr)
    # queries with no oracle → rows-only check
    for name in sorted(os.listdir(outdir)):
        if name not in oracle and os.path.isdir(f"{outdir}/{name}"):
            try:
                n = con.execute(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
                print(f"rows {name}: {n} rows (no oracle)")
            except Exception as e:
                print(f"rows {name}: unreadable ({e})")
    with open(f"{outdir}/rows.json", "w") as f:
        json.dump(row_counts, f, indent=0, sort_keys=True)
    n_vac = vacuity(baseline, row_counts) if baseline else 0
    print(f"\n{n_ok} ok, {n_fail} fail, {n_skip} skipped"
          + (f", {n_vac} vacuous" if baseline else ""))
    sys.exit(1 if (n_fail or n_vac) else 0)


def load_baseline(path):
    """Baseline row counts from a rows.json sidecar or an old check log."""
    txt = open(path).read()
    try:
        return {k: int(v) for k, v in json.loads(txt).items()}
    except ValueError:
        import re
        return {m.group(1): int(m.group(2)) for m in
                re.finditer(r"ok\s+(\S+) \((\d+) rows\)", txt)}


def vacuity(baseline_path, probe):
    """VACUOUS / ZERO-EVERYWHERE fail, SHRUNK warns (tools/vacuity.py
    semantics, folded in so the audit runs on every --baseline gate)."""
    base = load_baseline(baseline_path)
    n_bad = 0
    for q in sorted(probe):
        b, p = base.get(q), probe[q]
        if b is None: continue
        if p == 0 and b > 0:
            print(f"VACUOUS          {q}: {b} -> 0 rows"); n_bad += 1
        elif p == 0 and b == 0:
            print(f"ZERO-EVERYWHERE  {q}"); n_bad += 1
        elif p < 0.2 * b:
            print(f"SHRUNK           {q}: {b} -> {p} rows (warn)")
    return n_bad

if __name__ == "__main__":
    main()

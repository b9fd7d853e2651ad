#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify output
parquet against DuckDB oracle results (sorted columns, sorted rows, exact
value equality).

Usage: check.py <sfDir> <verifyOutDir> [--skip q1,q2,...] [--only q1,q2,...]

--skip-quadratic: retained as a NO-OP for muscle memory — since round 8
  the dedup oracles generate pairs via a linear shared-shingle equi-join
  (DedupQueries.pairCtes), so the full surface is checkable at sf0.1
  (~80 s total DuckDB time, dominated by q35's char-8-gram join)."""
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
    skip, only = set(), None
    for a in sys.argv[1:]:
        if a == "--skip-quadratic": skip |= QUADRATIC
        elif a.startswith("--skip="): skip |= set(a[len("--skip="):].split(","))
        elif a.startswith("--only="): only = set(a[len("--only="):].split(","))
    con = duckdb.connect()
    # x30-oracle scale: the default budget (80% of RAM but tracked
    # pessimistically) ran q157's CTE chain out of memory at 18M rows;
    # an explicit limit + no insertion-order preservation keeps every
    # oracle inside the box. Output compare sorts rows anyway.
    con.execute("SET memory_limit='48GB'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        # a table may be a single parquet file (driver testdata) or a
        # directory of part files (ScaleUp / CorpusB output)
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = n_skip = 0
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
    # queries with no oracle → rows-only check
    for name in sorted(os.listdir(outdir)):
        if name not in oracle and os.path.isdir(f"{outdir}/{name}"):
            n = con.execute(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
            print(f"rows {name}: {n} rows (no oracle)")
    print(f"\n{n_ok} ok, {n_fail} fail, {n_skip} skipped")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

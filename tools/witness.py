#!/usr/bin/env python3
"""Stratified sampled exact-Jaccard witness for q35_char_ngram_pairs at
scales where the full ground-truth oracle is infeasible (round-14
verdict #1: at x30 the shared-8-gram equi-join is ~3.4e11 rows / >70 GB
of DuckDB temp spill — and that is intrinsic: sum(min(df, N-df)^2) is
still 2.7e11, so no exact all-pairs formulation fits).

Algorithm independence is preserved at LINEAR cost: the witness never
looks at the engine's banding/signatures — it samples ~1.5k doc PAIRS
deterministically, computes exact char-8-gram Jaccard for just those
pairs (explode only the sampled docs), and asserts:

  - stratum A (engine-reported pairs, md5-sampled): the engine's
    reported jaccard == round(exact, 4) AND exact >= threshold —
    scores are REAL, not sketch estimates;
  - stratum B (near-threshold engine-NEGATIVES): pairs nominated by a
    1-hash min-gram collision under 4 independent md5 salts (collision
    probability per salt = true Jaccard, so nominations skew toward
    the highest-J pairs the engine did NOT report) must have
    exact < threshold — no silent recall hole near the boundary;
  - stratum C (uniform random pairs, md5-derived): exact < threshold.

Also checks the full engine output's cheap invariants (doc_a < doc_b,
distinct pairs, jaccard >= threshold).

Usage: witness.py <sfDir> <verifyOutDir> [--threshold=0.7]
Prints per-stratum tallies incl. the max negative exact J (power
evidence: how close to the boundary the negatives actually got);
exit 1 on any violation."""
import duckdb, os, sys

T = ["documents"]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if args else "/tmp/graft-sf3"
    outdir = args[1] if len(args) > 1 else "/tmp/verify_sf3"
    thr = 0.7
    for a in sys.argv[1:]:
        if a.startswith("--threshold="):
            thr = float(a[len("--threshold="):])
    qdir = f"{outdir}/q35_char_ngram_pairs"
    if not os.path.isdir(qdir):
        sys.exit(f"witness: no engine output at {qdir}")
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "40GB")
    con.execute(f"SET memory_limit='{mem}'")
    p = f"{sfdir}/documents.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src}'")
    con.execute(
        f"CREATE TEMP TABLE eng AS SELECT * FROM '{qdir}/*.parquet'")

    # engine-output invariants over the FULL output (cheap, not sampled)
    n_eng, n_bad_ord, n_dup, n_below = con.execute(f"""
        SELECT count(*),
               count(CASE WHEN doc_a >= doc_b THEN 1 END),
               count(*) - count(DISTINCT (doc_a, doc_b)),
               count(CASE WHEN jaccard < {thr} THEN 1 END)
        FROM eng""").fetchone()
    print(f"engine output: {n_eng} pairs "
          f"(bad-order {n_bad_ord}, dup {n_dup}, below-thr {n_below})")
    fail = n_bad_ord + n_dup + n_below

    # exact char-8-gram rows for ALL docs is linear and cheap (~11 s at
    # x30); the infeasible part was only ever the df^2 self-join.
    con.execute("""
        CREATE TEMP TABLE ts AS
        WITH SH AS (SELECT doc_id,
             CASE WHEN len(text) >= 8
                  THEN list_distinct([text[i : i + 7]
                                      for i in range(1, len(text) - 6)])
                  ELSE [text] END AS s
           FROM documents)
        SELECT doc_id, unnest(s) AS tok FROM SH""")
    con.execute("""CREATE TEMP TABLE sz AS
        SELECT doc_id, count(*) AS n FROM ts GROUP BY 1""")

    # stratum A: engine-reported pairs, deterministic md5 sample
    con.execute("""
        CREATE TEMP TABLE pos AS
        SELECT doc_a, doc_b FROM eng
        ORDER BY md5(doc_a || ':' || doc_b) LIMIT 600""")

    # stratum B: min-gram collision nomination, 4 salts. P(collide per
    # salt) = J(a,b) — the engine-negative pairs this surfaces are the
    # most-similar ones available, i.e. the near-threshold stratum.
    # Groups capped at 40 docs (doc_id order) so one globally-min-hashed
    # hot gram cannot mint a quadratic group.
    con.execute("""
        CREATE TEMP TABLE mh AS
        WITH salts AS (SELECT unnest([0, 1, 2, 3]) AS k),
        m AS (SELECT ts.doc_id, k, min(md5(ts.tok || '#' || k)) AS mg
              FROM ts CROSS JOIN salts GROUP BY 1, 2),
        grp AS (SELECT doc_id, k, mg,
                  row_number() OVER (PARTITION BY k, mg ORDER BY doc_id) AS rn
                FROM m),
        capped AS (SELECT * FROM grp WHERE rn <= 40)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM capped a JOIN capped b
          ON a.k = b.k AND a.mg = b.mg AND a.doc_id < b.doc_id""")
    con.execute("""
        CREATE TEMP TABLE neg AS
        SELECT doc_a, doc_b FROM mh
        WHERE NOT EXISTS (SELECT 1 FROM eng e
                          WHERE e.doc_a = mh.doc_a AND e.doc_b = mh.doc_b)
        ORDER BY md5(doc_a || ':' || doc_b) LIMIT 600""")

    # stratum C: uniform pairs from an md5-ordered doc sample
    con.execute("""
        CREATE TEMP TABLE uni AS
        WITH d AS (SELECT doc_id FROM sz
                   ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 80)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        ORDER BY md5(a.doc_id || ':' || b.doc_id) LIMIT 300""")

    # exact Jaccard for every sampled pair (LEFT JOIN keeps 0-overlap
    # pairs: their intersection must surface as 0, not drop out)
    ex = con.execute(f"""
        WITH pairs AS (
          SELECT doc_a, doc_b, max(st) AS st FROM (
            SELECT doc_a, doc_b, 'A' AS st FROM pos
            UNION ALL SELECT doc_a, doc_b, 'B' FROM neg
            UNION ALL SELECT doc_a, doc_b, 'C' FROM uni) u
          GROUP BY 1, 2),
        inter AS (
          SELECT p.doc_a, p.doc_b, count(b.tok) AS i
          FROM pairs p
          JOIN ts a ON a.doc_id = p.doc_a
          LEFT JOIN ts b ON b.doc_id = p.doc_b AND b.tok = a.tok
          GROUP BY 1, 2),
        j AS (
          SELECT p.doc_a, p.doc_b, p.st,
            CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) AS exact,
            e.jaccard AS reported
          FROM pairs p
          JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
          JOIN sz sa ON sa.doc_id = p.doc_a
          JOIN sz sb ON sb.doc_id = p.doc_b
          LEFT JOIN eng e ON e.doc_a = p.doc_a AND e.doc_b = p.doc_b)
        SELECT st,
          count(*) AS n,
          count(CASE WHEN reported IS NOT NULL
                     AND (round(exact, 4) <> reported OR exact < {thr})
                THEN 1 END) AS score_bad,
          count(CASE WHEN reported IS NULL AND exact >= {thr}
                THEN 1 END) AS recall_bad,
          round(max(CASE WHEN reported IS NULL THEN exact END), 4)
            AS max_neg_exact,
          round(quantile_cont(CASE WHEN reported IS NULL THEN exact END,
                              0.99), 4) AS p99_neg_exact
        FROM j GROUP BY 1 ORDER BY 1""").fetchdf()
    print(ex.to_string(index=False))
    fail += int(ex["score_bad"].sum() + ex["recall_bad"].sum())
    nA = int(ex[ex.st == "A"]["n"].sum()) if len(ex[ex.st == "A"]) else 0
    if n_eng > 0 and nA == 0:
        print("witness: stratum A empty despite engine pairs"); fail += 1
    print("witness q35: " + ("FAIL" if fail else
          f"ok ({n_eng} engine pairs; A={nA} score-exact, "
          f"negatives sub-threshold)"))
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with views named after the sfDir
parquet tables, and compares: schema (sorted column names), row count, and
values (rows sorted, columns sorted by name — the driver's documented
compare). Exit 1 if any query mismatches.

The mirror also rejects DRIVER-UNHASHABLE output shapes the value compare
alone cannot catch (the r14 lesson — four value-correct queries failed the
driver's artifact on shape alone):
  - array/struct/map-typed output columns: the driver's pandas-based hasher
    dies on them outright (sort_values -> Categorical -> "unhashable type:
    numpy.ndarray"), so such a query can NEVER be certified — explode or
    array_join instead;
  - DECIMAL output columns: both engines are value-exact but their decimal
    REPRS sit on a formatting boundary the driver's hash trips over (the
    recorded x116 lesson) — this mirror reads both sides through DuckDB so
    the boundary is invisible here, hence the shape must be refused, not
    compared. CAST(... AS DOUBLE) at the query edge.
Both checks run on every produced output (oracle or not): rows-only queries
reach the driver too.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and last-ulp noise is NOT forgiven: driver hashes.
        return repr(v)
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        # driver-unhashable shapes fail HERE, before any value compare
        # (see module docstring): nested types kill the driver's hasher,
        # decimal reprs sit on a cross-engine formatting boundary
        shape = con.sql(f"DESCRIBE SELECT * FROM '{d}/*.parquet'").fetchall()
        nested = [(c, t) for c, t, *_ in shape
                  if "[]" in t or "STRUCT" in t or "MAP" in t]
        decs = [(c, t) for c, t, *_ in shape if "DECIMAL" in t]
        if nested:
            print(f"FAIL {name}: driver-unhashable nested output columns "
                  f"{nested} — explode or array_join (r14 x142j lesson)")
            n_fail += 1; continue
        if decs:
            print(f"FAIL {name}: DECIMAL output columns {decs} — repr "
                  f"boundary breaks the driver hash (x116 lesson); "
                  f"CAST(... AS DOUBLE) at the query edge")
            n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); n_skip += 1
            continue
        try:
            exp = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}"); n_fail += 1; continue
        g = sorted(tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False))
        e = sorted(tuple(norm(v) for v in row) for row in exp[ec].itertuples(index=False))
        if g != e:
            bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    # a query that crashed inside graft.Verify writes no output dir at all —
    # that absence must FAIL the gate, not silently shrink it
    produced = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracle) - produced):
        print(f"FAIL {name}: no spark output (query crashed in Verify?)")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skipped (rows-only)")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

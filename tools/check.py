#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run Verify output
against the DuckDB oracle (dev tooling only — the engine itself is Scala)."""
import sys, json, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    got = con.execute(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        skips.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    # driver-style compare: sort columns by name, then rows, compare values
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"row count: {len(got)} vs {len(exp)}"))
        continue
    # the driver hashes stringified values, so int64 2 vs float64 2.0 is a
    # mismatch there even though pandas check_dtype=False calls them equal
    # (e.g. DuckDB sum(int) -> HUGEINT -> float64 in pandas). Fail on any
    # numeric-kind divergence.
    kind_diffs = [c for c in got.columns
                  if (got[c].dtype.kind in "iu") != (exp[c].dtype.kind in "iu")
                  and {got[c].dtype.kind, exp[c].dtype.kind} <= set("iuf")]
    if kind_diffs:
        fails.append((name, f"int/float dtype mismatch (driver hash would differ): "
                            f"{[(c, str(got[c].dtype), str(exp[c].dtype)) for c in kind_diffs]}"))
        continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        passes.append(name)
    except AssertionError as ex:
        fails.append((name, str(ex).split("\n")[0:6]))

print(f"PASS {len(passes)}: {passes}")
print(f"SKIP(no-oracle) {len(skips)}: {skips}")
print(f"FAIL {len(fails)}:")
for n, msg in fails:
    print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)

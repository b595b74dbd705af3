#!/usr/bin/env python3
"""Local mirror of the driver's t2 check: run graft.Verify first, then this.

Usage: python3 scripts/check_correctness.py <verify_outdir> <sf_dir>

For every query in <outdir>/oracle_sql.json, runs the oracle SQL in DuckDB
against the sf parquet tables and compares exactly (values, dtypes, row
order) with the Spark parquet dump. Queries without oracle SQL get a
rows>0 check. Exit code 1 on any mismatch.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    outdir, sfdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    failures = []
    qdirs = sorted(d for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d))
    for qdir in qdirs:
        name = os.path.basename(qdir)
        spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            status = "rows_only_ok" if len(spark_df) > 0 else "EMPTY_NO_ORACLE"
            if len(spark_df) == 0:
                failures.append(name)
            print(f"{name:28s} {status} rows={len(spark_df)}")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} ORACLE_SQL_ERROR {e}")
            continue
        # driver sorts columns by name before hashing
        spark_df = spark_df[sorted(spark_df.columns)]
        duck_df = duck_df[sorted(duck_df.columns)]
        try:
            pd.testing.assert_frame_equal(
                spark_df, duck_df, check_exact=True, check_dtype=True)
            print(f"{name:28s} MATCH rows={len(spark_df)}")
        except AssertionError as e:
            failures.append(name)
            msg = str(e).replace("\n", " | ")[:400]
            print(f"{name:28s} MISMATCH rows={len(spark_df)}/{len(duck_df)} {msg}")
    print(f"\n{len(qdirs) - len(failures)}/{len(qdirs)} ok")
    if failures:
        print("FAILED:", ", ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

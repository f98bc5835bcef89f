#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle in DuckDB against the same sf tables, and compares
row-by-row (columns sorted by name, rows sorted, values stringified with
float rounding). Usage:

    python3 scripts/local_verify.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 4):.4f}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        if not Path(res_dir).exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            spark_rows = norm_rows(spark_rel.columns, spark_rel.fetchall())
            duck_rel = con.sql(sql)
            duck_rows = norm_rows(duck_rel.columns, duck_rel.fetchall())
            s_cols, d_cols = sorted(spark_rel.columns), sorted(duck_rel.columns)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
                n_fail += 1
            elif spark_rows != duck_rows:
                diff = [
                    (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
                ][:3]
                print(
                    f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)} "
                    f"first_diffs={diff}"
                )
                n_fail += 1
            else:
                print(f"PASS {name} ({len(spark_rows)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

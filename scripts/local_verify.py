#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle in DuckDB against the same sf tables, and compares
row-by-row (columns sorted by name, rows sorted, values stringified with
float rounding) AND column-type-by-column-type: the driver's value hash
is TYPE-sensitive, so a DuckDB HUGEINT (what bare `sum(BIGINT)` returns)
against a Spark LongType fails the driver while stringified values agree
— r16's only red row (text_langid_model) slipped through exactly this
blind spot. HUGEINT/DECIMAL oracle output columns are refused outright
(Spark never emits them), and the type lists must match at numeric
FAMILY granularity (int widths and float widths are interchangeable
under the stringified compare; int-vs-float is not). Usage:

    python3 scripts/local_verify.py <sfDir> <outDir> [key-regex]

The optional key-regex mirrors graft.Verify's 3rd arg for targeted
single-key iteration (keys without a spark dump are skipped only when
they don't match the filter).
"""
import json
import math
import re
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


# DuckDB types Spark structurally cannot emit: their presence in an
# oracle's FINAL select guarantees a driver hash mismatch even when
# every stringified value agrees — DuckDB's pandas bridge converts
# HUGEINT (int128) to float64, so values render "123.0" vs "123".
FORBIDDEN_TYPES = ("HUGEINT", "DECIMAL")

# The driver's hash is WIDTH-insensitive inside a numeric family (an
# int32 5 and an int64 5 both render "5"; float32/float64 agree after
# the 4dp rounding — 17 board keys legitimately differ in width), but
# CROSS-family drift is a real failure ("5" vs "5.0000"). Compare
# types at family granularity.
_INT_RE = re.compile(r"\b(TINYINT|SMALLINT|INTEGER|BIGINT)\b")
_FLT_RE = re.compile(r"\b(FLOAT|DOUBLE)\b")


def type_family(typ):
    return _FLT_RE.sub("FLT", _INT_RE.sub("INT", typ))


def typed_cols(rel):
    """(name, type-family) pairs sorted by column name — the same order
    the value comparison uses, so a type diff names the exact column."""
    return sorted(zip(rel.columns, (str(t) for t in rel.types)))


def type_problems(spark_rel, duck_rel):
    """Return a list of human-readable type findings (empty = clean)."""
    probs = []
    for name, typ in typed_cols(duck_rel):
        if any(f in typ for f in FORBIDDEN_TYPES):
            probs.append(
                f"oracle column {name} is {typ} (Spark never emits "
                f"HUGEINT/DECIMAL — CAST it in the oracle SQL)"
            )
    s_types, d_types = typed_cols(spark_rel), typed_cols(duck_rel)
    if probs:
        return probs
    diffs = [
        f"{sn}: spark={st} duck={dt}"
        for (sn, st), (dn, dt) in zip(s_types, d_types)
        if type_family(st) != type_family(dt)
    ]
    if diffs:
        probs.append("type mismatch " + "; ".join(diffs))
    return probs


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    key_re = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if key_re and not key_re.search(name):
            continue
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
            probs = type_problems(spark_rel, duck_rel)
            if s_cols != d_cols:
                print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
                n_fail += 1
            elif probs:
                print(f"FAIL {name}: " + " | ".join(probs))
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

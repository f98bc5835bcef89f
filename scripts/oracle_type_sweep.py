#!/usr/bin/env python3
"""Board-wide oracle OUTPUT-TYPE sweep (r17, VERDICT r16 item #2b).

Plans (does NOT execute) every oracle in oracle_sql.json through DuckDB
and refuses any whose final SELECT carries a HUGEINT or DECIMAL column.
Spark structurally never emits those types, and the driver's value hash
is type-sensitive, so such a column guarantees a red CORRECTNESS row
even when every stringified value agrees — exactly how r16's only
failure (text_langid_model: five bare `sum(BIGINT)` columns → HUGEINT)
slipped past the value-stringifying local gate.

DuckDB resolves a relation's .types at bind/plan time, so the sweep
covers all ~170 oracles in seconds without running a single query.

    python3 scripts/oracle_type_sweep.py <sfDir> <oracle_sql.json>
"""
import json
import sys
from pathlib import Path

import duckdb

# one definition of the fixture tables and the forbidden output types,
# shared with the full gate (same directory) so the two cannot drift
sys.path.insert(0, str(Path(__file__).parent))
from local_verify import FORBIDDEN_TYPES as FORBIDDEN, TABLES  # noqa: E402


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(oracle_path).read_text())
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)  # lazy: binds + plans, never executes
            bad = [
                (c, str(t))
                for c, t in zip(rel.columns, rel.types)
                if any(f in str(t) for f in FORBIDDEN)
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle does not plan: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if bad:
            cols = ", ".join(f"{c}:{t}" for c, t in bad)
            print(f"FAIL {name}: forbidden oracle output types ({cols}) — "
                  f"CAST to BIGINT/DOUBLE in the final SELECT")
            n_bad += 1
    print(f"== {len(oracle) - n_bad} clean / {n_bad} forbidden")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

"""Drive the full driver contract locally: every ``queries()`` entry
side-by-side with its ``oracle_sql()`` twin on DuckDB, value-compared
after sorting columns by name — the same comparison the grading driver
records in CORRECTNESS_r{N}.json.

Run:  python BENCH/oracle_sweep.py [sf_dir] [--only q1,q2]   (default sf0.01)
Exit code 0 iff every query is schema- and value-equal.

Float columns compare with np.isclose (last-ulp Spark/DuckDB drift is
not a defect); everything else compares by exact string equality.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _col_equal(a, b) -> bool:
    import numpy as np
    import pandas as pd

    if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
        return bool(
            np.isclose(
                a.to_numpy(), b.to_numpy(), rtol=1e-9, atol=1e-9, equal_nan=True
            ).all()
        )
    return bool((a.astype(str).values == b.astype(str).values).all())


def main() -> int:
    argv, positional, only = sys.argv[1:], [], None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--only"):
            if "=" in a:
                only = set(a.split("=", 1)[1].split(","))
            else:
                i += 1
                only = set(argv[i].split(","))
        else:
            positional.append(a)
        i += 1
    sf_dir = positional[0] if positional else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as E
    from crawler.session import get_spark

    spark = get_spark("oracle-sweep", master="local[16]")
    fails, total = sweep(spark, sf_dir, only=only)
    spark.stop()
    return 1 if fails else 0


def sweep(spark, sf_dir: str, only=None) -> tuple[list[str], int]:
    """Run every queries()/oracle_sql() pair on `spark` vs DuckDB over
    `sf_dir`; returns (failed query names, compared count).  Reused by
    tests/test_oracle_sweep_gate.py as the suite's local oracle gate
    (ADVICE r4: the 6 rotated-out queries must not be invisible to
    verification between driver rounds)."""
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    fails = []
    for name in qs:
        if only is not None and name not in only:
            continue
        try:
            sd = qs[name](spark, sf_dir).toPandas()
            if name not in osql:
                print(f"{name}: NO ORACLE ({len(sd)} rows)")
                continue
            od = con.sql(osql[name]).df()
            cols = sorted(sd.columns)
            ok_schema = sorted(od.columns) == cols
            ok = ok_schema and len(sd) == len(od)
            if ok:
                a = sd[cols].sort_values(cols).reset_index(drop=True)
                b = od[cols].sort_values(cols).reset_index(drop=True)
                ok = all(_col_equal(a[c], b[c]) for c in cols)
            print(f"{name}: rows {len(sd)}/{len(od)} schema={ok_schema} equal={ok}")
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — report and keep sweeping
            print(f"{name}: ERROR {ex}")
            fails.append(name)
    total = len([n for n in qs if n in osql and (only is None or n in only)])
    print(f"FAILS: {fails if fails else f'none — {total}/{total}'}")
    return fails, total


if __name__ == "__main__":
    raise SystemExit(main())

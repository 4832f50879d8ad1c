"""Drive the full driver contract locally: every ``queries()`` entry
side-by-side with its ``oracle_sql()`` twin on DuckDB, value-compared
after sorting columns by name — the same comparison the grading driver
records in CORRECTNESS_r{N}.json.

Run:  python BENCH/oracle_sweep.py [sf_dir]        (default sf0.01)
Exit code 0 iff every query is schema- and value-equal.
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as E
    from crawler.session import get_spark

    spark = get_spark("oracle-sweep", master="local[16]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    fails = []
    for name in qs:
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
                ok = all(
                    (a[c].astype(str).values == b[c].astype(str).values).all()
                    for c in cols
                )
            print(f"{name}: rows {len(sd)}/{len(od)} schema={ok_schema} equal={ok}")
            if not ok:
                fails.append(name)
        except Exception as ex:  # noqa: BLE001 — report and keep sweeping
            print(f"{name}: ERROR {ex}")
            fails.append(name)
    total = len([n for n in qs if n in osql])
    print(f"FAILS: {fails if fails else f'none — {total}/{total}'}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
against its ``oracle_sql()`` twin via DuckDB: row count, column-name set,
and an order-insensitive value hash (rows rendered with repr-stable
formatting, columns sorted by name, rows sorted). Any mismatch prints a
diff sample. Run before committing entry changes:

    python tools/selfcheck.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SELF_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_val(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(only=None):
    import duckdb

    import __spark_entry__ as entry
    from kgp.session import get_spark

    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in sqls:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(sqls[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sc, dc = canon(srows, scols), canon(drows, dcols)
        ok_vals = sc == dc
        status = "OK  " if (ok_schema and ok_count and ok_vals) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} schema={ok_schema} "
            f"values={ok_vals} ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print(f"  spark cols: {sorted(scols)}\n  duck  cols: {sorted(dcols)}")
            if not ok_vals:
                s_only = [r for r in sc if r not in set(dc)][:3]
                d_only = [r for r in dc if r not in set(sc)][:3]
                print(f"  spark-only: {s_only}\n  duck-only : {d_only}")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)

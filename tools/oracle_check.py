"""Local stand-in for the driver's DuckDB correctness gate.

Runs every query in ``__spark_entry__.queries()`` at a given sf_dir and
compares against ``oracle_sql()`` in DuckDB: row count, column names,
and an order-insensitive value comparison (columns sorted by name, rows
sorted by all values). Usage::

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _canon(v):
    """STRICT canonicalization mirroring the driver: raw string forms,
    NO numeric coercion. A Spark Decimal('1.5000') and a DuckDB float64
    1.5 must NOT compare equal — the driver hashes them differently
    (VERDICT r02 item 2: 29 queries shipped hash-blind because the old
    harness passed everything through repr(float(v)))."""
    import datetime
    import decimal

    import numpy as np

    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (float, np.floating)):
        if pd.isna(v):
            return None
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)  # preserves scale: '1.5000' != '1.5'
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()  # a date is NOT a midnight timestamp
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from kinesis_vcr_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {ex!r}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {ex!r}")
            failures.append(name)
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs "
                  f"{sorted(ddf.columns)}")
            failures.append(name)
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL  {name}: rowcount {len(sdf)} vs {len(ddf)}")
            failures.append(name)
            continue
        a, b = normalize(sdf), normalize(ddf)
        if len(a) == 0 and len(b) == 0:
            print(f"PASS  {name}: 0 rows (both empty) [{time.time()-t0:.1f}s]")
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                i = neq[c].idxmax()
                print(f"      row {i} col {c}: spark={a[c][i]!r} "
                      f"duck={b[c][i]!r}")
            failures.append(name)
            continue
        print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

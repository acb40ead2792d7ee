"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/explain_dump.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt. Building a query's DataFrame may run
eager sub-jobs (adaptive sizing counts, index builds) — plans are
captured for the RETURNED DataFrame, the same frame the bench collects.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kinesis_vcr_spark.queries import all_queries
    from kinesis_vcr_spark.session import get_spark

    spark = get_spark("explain_dump")
    qs = all_queries()
    for name in names:
        df = qs[name].spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

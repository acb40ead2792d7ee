"""Bucketed near-dup index probe timing at large scale under a STAGED
index build — the E88/E95 scale protocol (tools/span_probe_scale.py
shape) applied to the metastore dedup index (r11 verdict item 7).

The registry row ``dedup_index_bucketed`` rebuilds the index in the
same session it probes; at sf100 a monolithic build of 3.75 M stored
docs shuffles tens of GB of band/shingle rows whose shuffle files
(released only at session exit) would coexist with the written tables.
This tool builds the index the way a real deployment accrues it — one
bucketed APPEND per stage, each in its OWN driver process, so every
stage's shuffle files are gone before the next starts — then times the
probe in a final fresh session: open the metastore tables + probe the
day-capped batch + collect, the literal daily-ingest operation whose
only-shuffle-the-batch plan is the reason the bucketed flavor exists.

Usage:
  python tools/dedup_probe_scale.py <sf_dir> build <k>     # stage k of N_SCOPES
  python tools/dedup_probe_scale.py <sf_dir> probe [repeats]

Catalog: the registry row's in-memory catalog dies with its session,
so the STAGED protocol runs with the derby-backed Hive catalog
(`spark.sql.catalogImplementation=hive`) — table metadata INCLUDING
the bucketing spec persists in the CWD's metastore_db across driver
processes (verified: a fresh session's groupBy over the bucketed scan
plans zero Exchange). Run every stage from the same scratch working
directory; table prefix derives from the sf dir basename so rungs at
different scales don't collide.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

N_SCOPES = 4
PROBE_BATCH_CAP = 5_000  # bench.py's day-sized batch cap
IDX_NEW_MOD = 4
N_BUCKETS = 256  # the sf100 shuffle-volume measurement's shape (r7)


def _prefix(sf_dir: str) -> str:
    return "ndidx_scale_" + re.sub(
        r"[^A-Za-z0-9_]", "_", os.path.basename(sf_dir.rstrip("/"))
    )


def main() -> None:
    from kinesis_vcr_spark.operators.dedup_index import (
        build_near_dup_index_bucketed,
        near_dup_against_bucketed_index,
    )
    from kinesis_vcr_spark.session import get_spark
    from kinesis_vcr_spark.tables import load_table

    sf_dir, mode = sys.argv[1], sys.argv[2]
    spark = get_spark(
        "dedup_probe_scale",
        extra_conf={"spark.sql.catalogImplementation": "hive"},
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % IDX_NEW_MOD != 0)
    new = docs.where(
        (F.col("doc_id") % IDX_NEW_MOD == 0)
        & (F.col("doc_id") < PROBE_BATCH_CAP)
    )
    prefix = _prefix(sf_dir)
    if mode == "build":
        # split on a doc_id field INDEPENDENT of the % IDX_NEW_MOD
        # old/new split (doc_id % N_SCOPES would leave scope 0 thin)
        k = int(sys.argv[3])
        part = old.where(
            F.pmod(F.floor(F.col("doc_id") / IDX_NEW_MOD), N_SCOPES) == k
        )
        build_near_dup_index_bucketed(
            part, prefix, "doc_id", "text",
            shingle_size=3, num_hashes=64, bands=16,
            n_buckets=N_BUCKETS, append=(k > 0),
        )
        print(f"built stage {k}", flush=True)
    elif mode == "probe":
        repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            near_dup_against_bucketed_index(
                new, spark, prefix, "doc_id", "text", threshold=0.6
            ).collect()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"dedup_index_bucketed_probe samples={samples}", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()

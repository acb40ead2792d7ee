"""Span-index probe timing at large scale under a staged index build.

The bench probe entry (bench.py bench_persisted_index_probes) builds
the gram index in the SAME Spark session that probes it. At sf100 the
monolithic `_base` build shuffles ~30 GB of gram digests while the
written index holds another ~24 GB — past a single-disk rig's free
space when the shuffle files (released only at session exit) and the
index coexist. This tool builds the index the way a real deployment
accrues it — one ingest scope per batch, each in its OWN driver
process, so every stage's shuffle files are gone before the next
starts — then times the probe in a final fresh session with the exact
open-index + probe + collect shape bench.py times.

Usage:
  python tools/span_probe_scale.py <sf_dir> <index_dir> build <k>   # stage k of N_SCOPES
  python tools/span_probe_scale.py <sf_dir> <index_dir> batch      # append the probe batch scope
  python tools/span_probe_scale.py <sf_dir> <index_dir> probe [repeats]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

N_SCOPES = 4
PROBE_BATCH_CAP = 5_000  # bench.py's day-sized batch cap
IDX_NEW_MOD = 4
SPAN_MIN_LEN = 40


def _docs(spark, sf_dir):
    from kinesis_vcr_spark.tables import load_table, widen_small_scan

    return widen_small_scan(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )


def main() -> None:
    from kinesis_vcr_spark.operators.spandedup import (
        append_gram_index,
        span_probe_index,
    )
    from kinesis_vcr_spark.session import get_spark

    sf_dir, index_dir, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_spark("span_probe_scale")
    docs = _docs(spark, sf_dir)
    old = docs.where(F.col("doc_id") % IDX_NEW_MOD != 0)
    new = docs.where(
        (F.col("doc_id") % IDX_NEW_MOD == 0)
        & (F.col("doc_id") < PROBE_BATCH_CAP)
    )
    if mode == "build":
        # split on a doc_id field INDEPENDENT of the % IDX_NEW_MOD
        # old/new split (doc_id % N_SCOPES would leave scope 0 empty)
        k = int(sys.argv[4])
        part = old.where(
            F.pmod(F.floor(F.col("doc_id") / IDX_NEW_MOD), N_SCOPES) == k
        )
        append_gram_index(
            part, index_dir, min_len=SPAN_MIN_LEN, ingest_label=f"b{k}"
        )
        print(f"built scope b{k}", flush=True)
    elif mode == "batch":
        append_gram_index(
            new, index_dir, min_len=SPAN_MIN_LEN, ingest_label="batch"
        )
        print("built scope batch", flush=True)
    elif mode == "probe":
        repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            span_probe_index(
                new, index_dir, min_len=SPAN_MIN_LEN
            ).collect()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"span_index_probe samples={samples}", flush=True)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()

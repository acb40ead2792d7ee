"""Steady-state probe cost of the persisted novelty index as the
INDEX grows — the E111 ingest family's decade evidence (the
dedup_probe_scale protocol applied to novelty).

A daily ingest batch is day-sized regardless of corpus age, so the
claim to verify is: probe wall-time tracks O(batch shingling) + the
vocabulary join, NOT O(corpus) — the vocabulary saturates (heavy-tailed
n-gram law), so decades of corpus growth should buy far less than
decades of probe growth.

Protocol: per sf rung, the corpus is every doc except the probe batch;
the batch is the FIXED-SIZE id-slice below PROBE_BATCH_CAP docs (the
dedup_probe_scale lesson: a probe set proportional to the corpus turns
every O(batch) claim into O(corpus) by construction). Build once
(untimed headline, reported), then 3 timed probe+collect samples.

Usage:  python tools/novelty_probe_scale.py SF_DIR [SF_DIR ...]
Prints one JSON line per rung.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_BATCH_DOCS = 500  # sf0.01-day-sized batch, fixed across rungs


def main() -> None:
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.operators.novelty_index import (
        build_novelty_index,
        load_novelty_index,
        novelty_against_index,
    )
    from kinesis_vcr_spark.session import get_spark
    from kinesis_vcr_spark.tables import load_table

    spark = get_spark("novelty_probe_scale")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        max_id = docs.agg(F.max("doc_id")).first()[0]
        cut = max_id - PROBE_BATCH_DOCS
        corpus = docs.where(F.col("doc_id") <= cut)
        batch = docs.where(F.col("doc_id") > cut).persist()
        n_batch = batch.count()

        tmp = tempfile.mkdtemp(prefix="novelty_scale_")
        try:
            t0 = time.time()
            build_novelty_index(corpus, tmp)
            build_s = round(time.time() - t0, 2)
            vocab = load_novelty_index(spark, tmp).count()

            samples = []
            for _ in range(3):
                t0 = time.time()
                novelty_against_index(spark, tmp, batch).collect()
                samples.append(round(time.time() - t0, 2))
            print(
                json.dumps(
                    {
                        "sf_dir": sf_dir,
                        "n_corpus": docs.count() - n_batch,
                        "n_batch": n_batch,
                        "vocab": vocab,
                        "build_s": build_s,
                        "probe_s": samples,
                        "probe_med": sorted(samples)[1],
                    }
                ),
                flush=True,
            )
        finally:
            batch.unpersist()
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Fixed-benchmark scale rung for fuzzy decontamination (r13,
VERDICT r12 item 4).

The registry row's fixture couples the benchmark size to sf (every
50th doc plays the eval set), so its decade ratio (7.3x at sf0.1→sf1,
BASELINE r12 addendum 8) measures BOTH sides growing — not the
operator's production shape, which is the docstring's own contract: a
FIXED eval set against a growing corpus, benchmark banded table
broadcast, corpus never shuffled for the candidate join.

This rung holds the benchmark at its sf0.1 size (every 50th sf0.1
doc, ~125 docs — eval-set-sized) while the corpus scales sf0.1 → sf1
→ sf10, planting one lightly-edited leak per benchmark doc into each
corpus so the answer is nonempty and recall is checkable. A flat-ish
per-decade ratio is the proof of the corpus-never-shuffles claim; the
leaked-doc recall (must be 125/125 at every rung) is the correctness
gate riding along.

Usage:  python tools/decontam_fuzzy_scale.py <corpus_sf_dir> [bench_sf_dir]
        (bench_sf_dir defaults to /root/testdata/sf0.1)

Prints one JSON line:
  {"corpus": ..., "bench_docs": B, "corpus_docs": N,
   "flagged": F, "planted_recovered": R, "seconds": S}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BENCH_MOD = 50  # every 50th sf0.1 doc = the frozen eval set
EDIT = " plus a small trailing edit"


def main() -> None:
    from kinesis_vcr_spark.operators.decontam import fuzzy_contamination
    from kinesis_vcr_spark.session import get_spark
    from kinesis_vcr_spark.tables import load_table

    corpus_dir = sys.argv[1]
    bench_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("decontam_fuzzy_scale")

    bench = (
        load_table(spark, bench_dir, "documents")
        .where(F.pmod("doc_id", F.lit(BENCH_MOD)) == 0)
        .select("doc_id", "text")
        .persist()
    )
    n_bench = bench.count()

    docs = load_table(spark, corpus_dir, "documents").select("doc_id", "text")
    offset = docs.agg(F.max("doc_id")).first()[0] + 1
    # plant one lightly-edited leak per benchmark doc; corpus ids stay
    # disjoint from bench ids by the derived offset
    leaked = bench.select(
        (F.col("doc_id") + F.lit(offset)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(EDIT)).alias("text"),
    )
    corpus = docs.unionByName(leaked)
    n_corpus = corpus.count()

    t0 = time.time()
    flagged = fuzzy_contamination(
        corpus, bench, "doc_id", "text", shingle_size=3, threshold=0.6,
    ).persist()
    n_flagged = flagged.count()
    elapsed = round(time.time() - t0, 1)

    planted = flagged.where(F.col("doc_id") >= offset).count()
    print(json.dumps({
        "corpus": corpus_dir,
        "bench_docs": n_bench,
        "corpus_docs": n_corpus,
        "flagged": n_flagged,
        "planted_recovered": planted,
        "seconds": elapsed,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

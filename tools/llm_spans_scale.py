"""llm_prep_spans timing at large scale under a staged run.

The monolithic query holds the full pipeline's exchanges AND the span
stage's gram exchange in ONE driver session; at sf100 their shuffle
files coexist past the single-rig disk budget (the same constraint
that staged the gram-index build — tools/span_probe_scale.py). This
tool splits the query at its natural persistence boundary, each stage
its own driver process so shuffle files release between stages:

  stage ``kept``:  injected crawl → llm_prep_corpus → kept survivors
                   (doc_id, split, extracted text) → parquet
  stage ``spans``: read kept → duplicated_spans → stats + removal →
                   final projection → count

The recorded rung is the SUM of the two stage times — exactly the
query's work split at the persist the query itself already performs
(queries/e2e.py:llm_prep_spans persists ``kept``; the stage boundary
materializes that same frame to parquet instead of cache).

Usage:
  python tools/llm_spans_scale.py <sf_dir> <work_dir> kept [near_dup]
  python tools/llm_spans_scale.py <sf_dir> <work_dir> kept_clean
  python tools/llm_spans_scale.py <sf_dir> <work_dir> spans

``near_dup`` (default ``verified``) selects the pipeline's near-dup
mode; ``lsh_components`` is the Θ(n·bands) path — the verified mode's
candidate×shingle verification exchange needs ~300 GB at the sf100
footer corpus and cannot fit one rig (BASELINE r10 addendum 2), so the
sf100 rung of this query is measurable only through the lsh mode.

``kept_clean`` is the boilerplate-first ordering (path (c), registered
as ``llm_prep_spans_clean``): corpus-wide line dedup strips the footer
BEFORE the pipeline, so the VERIFIED near-dup mode's candidate set
tracks the plain corpus and the sf100 rung completes with exact
semantics — the production answer the r10 trilogy measured.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    from kinesis_vcr_spark.functions.html import html_to_text
    from kinesis_vcr_spark.functions.text import canonicalize_text
    from kinesis_vcr_spark.operators.pipeline import llm_prep_corpus
    from kinesis_vcr_spark.operators.spandedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )
    from kinesis_vcr_spark.queries.e2e import (
        E2E_BENCH_MOD,
        E2E_FOOTER,
        E2E_J,
        E2E_N,
        E2E_Q,
        E2E_SEED,
        E2E_SPAN_L,
        _injected,
    )
    from kinesis_vcr_spark.session import get_spark
    from kinesis_vcr_spark.tables import load_table

    sf_dir, work_dir, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_spark("llm_spans_scale")
    if mode == "kept":
        near_dup = sys.argv[4] if len(sys.argv) > 4 else "verified"
        t0 = time.time()
        injected = _injected(
            load_table(spark, sf_dir, "documents")
        ).withColumn(
            "html",
            F.when(
                F.pmod("doc_id", F.lit(E2E_BENCH_MOD)) == 0, F.col("html")
            ).otherwise(F.concat(F.col("html"), F.lit(E2E_FOOTER))),
        )
        bench = injected.where(
            F.pmod("doc_id", F.lit(E2E_BENCH_MOD)) == 0
        ).select("doc_id", "html")
        out = llm_prep_corpus(
            injected, bench,
            quality_threshold=E2E_Q, jaccard_threshold=E2E_J,
            decontam_n=E2E_N, split_seed=E2E_SEED, near_dup=near_dup,
        )
        kept = out.where(F.col("status") == "kept").select(
            "doc_id",
            "split",
            canonicalize_text(html_to_text(F.col("html"))).alias("__text"),
        )
        kept.write.mode("overwrite").parquet(f"{work_dir}/kept")
        print(
            f"stage kept ({near_dup}): {round(time.time() - t0, 3)}s",
            flush=True,
        )
    elif mode == "kept_clean":
        from kinesis_vcr_spark.operators.linededup import dedup_lines
        from kinesis_vcr_spark.queries.e2e import E2E_CLEAN_Q, E2E_LINE_MIN

        t0 = time.time()
        injected = _injected(
            load_table(spark, sf_dir, "documents")
        ).withColumn(
            "html",
            F.when(
                F.pmod("doc_id", F.lit(E2E_BENCH_MOD)) == 0, F.col("html")
            ).otherwise(F.concat(F.col("html"), F.lit(E2E_FOOTER))),
        )
        raw = injected.withColumn(
            "__raw", canonicalize_text(html_to_text(F.col("html")))
        )
        clean = dedup_lines(
            raw.select("doc_id", "__raw"), "doc_id",
            F.split(F.col("__raw"), "\n"), min_docs=E2E_LINE_MIN,
        ).select(
            "doc_id",
            F.when(
                F.length("clean_text") > 0, F.col("clean_text")
            ).alias("__clean"),
        )
        docs2 = raw.join(clean, "doc_id", "left")
        bench = injected.where(
            F.pmod("doc_id", F.lit(E2E_BENCH_MOD)) == 0
        ).select("doc_id", "html")
        out = llm_prep_corpus(
            docs2, bench,
            quality_threshold=E2E_CLEAN_Q, jaccard_threshold=E2E_J,
            decontam_n=E2E_N, split_seed=E2E_SEED, text_col="__clean",
        )
        kept = out.where(F.col("status") == "kept").select(
            "doc_id", "split", F.col("__clean").alias("__text")
        )
        kept.write.mode("overwrite").parquet(f"{work_dir}/kept")
        print(
            f"stage kept_clean: {round(time.time() - t0, 3)}s",
            flush=True,
        )
    elif mode == "spans":
        t0 = time.time()
        kept = spark.read.parquet(f"{work_dir}/kept")
        spans = duplicated_spans(
            kept, "doc_id", "__text", min_len=E2E_SPAN_L
        ).persist()
        spans.count()
        stats = spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(
                F.col("span_end") - F.col("span_start") + F.lit(1)
            ).alias("dup_chars"),
        )
        cleaned = remove_duplicated_spans(
            kept, "doc_id", "__text", min_len=E2E_SPAN_L, spans=spans
        )
        n = (
            cleaned.join(stats, "doc_id", "left")
            .select(
                "doc_id", "split",
                F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
                F.length("clean_text").alias("clean_len"),
                F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
            )
            .count()
        )
        print(
            f"stage spans: {round(time.time() - t0, 3)}s rows={n}",
            flush=True,
        )
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()

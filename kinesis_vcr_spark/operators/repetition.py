"""Gopher-style repetition quality signals, computed per document.

A large-scale training corpus is filtered on *repetitiousness* before
anything model-based runs: documents dominated by duplicated lines or a
single repeated n-gram are boilerplate/spam with near-zero training
value (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1
repetition filters; C4 uses the same family of heuristics).  The
reference engine has no text surface — this is part of the engine-added
training-data layer (SURVEY.md §2.5a).

Signals (all exact, all engine-portable):

- ``dup_line_frac``       — duplicated line *occurrences* / total line
  occurrences (a line occurring c times contributes c−1 duplicates);
- ``dup_line_char_frac``  — characters inside duplicated occurrences /
  total line characters;
- ``top_bigram``          — the most frequent word 2-gram
  (deterministic tie-break: lexicographically largest);
- ``top_bigram_char_frac`` — characters covered by all occurrences of
  that 2-gram / total text characters.

Scale posture: two aggregates keyed by ``(id, line)`` / ``(id, gram)``
then by ``id`` — every one map-side combinable, all shuffles on the
document key (uniform, no skew), zero Python stages.  The line/gram
explode is a narrow 1→N flatMap that never leaves the JVM.  At 100 TB
this is scan + three keyed exchanges on ``doc_id`` — the minimum for
exact per-doc distinct-line accounting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_lines(tokens: Column, width: int) -> Column:
    """Deterministic "lines": consecutive ``width``-token chunks of a
    token array, joined by single spaces.  Used instead of '\\n'
    splitting when the corpus has no physical line structure (the
    driver fixture doesn't); on real corpora pass
    ``F.split(text, '\\n')`` directly to the aggregators instead."""
    n_chunks = F.ceil(F.size(tokens) / F.lit(float(width))).cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
        lambda i: F.array_join(F.slice(tokens, (i - F.lit(1)) * width + F.lit(1), width), " "),
    )


def word_bigrams(tokens: Column) -> Column:
    """All consecutive word 2-grams; a document with < 2 tokens yields
    its whole text as the single gram (mirrors the shingle semantics
    used by the dedup operators — no empty gram sets)."""
    n = F.greatest(F.size(tokens) - F.lit(1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(tokens, i, 2), " "),
    )


def line_dup_stats(df: DataFrame, id_col: str, lines_col: Column) -> DataFrame:
    """Per-document duplicated-line accounting.

    Returns ``id_col, n_lines, dup_line_frac, dup_line_char_frac``
    (fractions rounded to 6 dp as doubles — the repo-wide hash-parity
    convention).
    """
    occ = (
        df.select(id_col, F.explode(lines_col).alias("line"))
        .where(F.length("line") > 0)
        .groupBy(id_col, "line")
        .agg(F.count("*").alias("c"), F.length(F.first("line")).alias("chars"))
    )
    return occ.groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        F.round(
            (F.sum("c") - F.count("*")) / F.sum("c").cast("double"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum((F.col("c") - 1) * F.col("chars"))
            / F.sum(F.col("c") * F.col("chars")).cast("double"),
            6,
        ).alias("dup_line_char_frac"),
    )


def top_bigram_stats(df: DataFrame, id_col: str, tokens_col: Column) -> DataFrame:
    """Per-document most-frequent word 2-gram and the fraction of text
    characters its occurrences cover.  ``max(struct(c, gram))`` gives a
    deterministic winner (count first, then lexicographically largest
    gram) without a window sort."""
    grams = (
        df.select(id_col, F.explode(word_bigrams(tokens_col)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("c"))
    )
    best = grams.groupBy(id_col).agg(
        F.max(F.struct(F.col("c"), F.col("gram"))).alias("top")
    )
    return best.select(
        id_col,
        F.col("top.gram").alias("top_bigram"),
        F.col("top.c").alias("top_bigram_count"),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_width: int = 2,
) -> DataFrame:
    """All repetition signals in one frame: one row per document with
    ``n_lines, dup_line_frac, dup_line_char_frac, top_bigram,
    top_bigram_count, top_bigram_char_frac``.

    Two independent aggregate pipelines joined back on the document
    key — at scale the join is a co-partitioned shuffle hash join on
    ``id_col`` (both sides already hashed by it from their groupBys;
    AQE coalesces).
    """
    toks = df.select(
        id_col,
        F.length(text_col).alias("total_chars"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    lines = line_dup_stats(toks, id_col, chunk_lines(F.col("t"), line_width))
    grams = top_bigram_stats(toks, id_col, F.col("t"))
    return (
        toks.select(id_col, "total_chars")
        .join(lines, id_col)
        .join(grams, id_col)
        .select(
            id_col,
            "n_lines",
            "dup_line_frac",
            "dup_line_char_frac",
            "top_bigram",
            "top_bigram_count",
            F.round(
                F.col("top_bigram_count")
                * F.length("top_bigram")
                / F.col("total_chars").cast("double"),
                6,
            ).alias("top_bigram_char_frac"),
        )
    )

"""Exact duplicate-span detection and removal (ExactSubstr dedup).

The exact counterpart of the winnowing operator (operators/winnow.py):
where winnowing gives the PAIR-level verbatim-duplication signal, this
gives the SPAN-level one — for every document, the maximal character
ranges that lie inside a substring of length ≥ ``min_len`` occurring
more than once in the corpus, and the document text with those ranges
cut out. This is the removal step of Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better", ExactSubstr): they build
a corpus-wide suffix array, a global sorted structure that fights
Spark's partitioned model; this operator reaches the IDENTICAL
coverage set with nothing but linear scans, one aggregation, and a
per-document gaps-and-islands merge.

Why it is exact: a position x lies in some duplicated substring S with
|S| ≥ L iff x is covered by a duplicated L-gram. (⇐ a duplicated
L-gram IS a duplicated substring of length L. ⇒ inside an occurrence
of S, every position is covered by at least one of S's |S|−L+1
L-windows — |S| ≥ L makes the window-start interval
[max(0, i−L+1), min(i, |S|−L)] non-empty for every offset i — and a
window of a twice-occurring string occurs twice itself.) So the union
of duplicated-L-gram extents, merged per document, equals the union of
all duplicated substrings of length ≥ L: the suffix-array answer,
without the suffix array. "Duplicated" counts every occurrence —
cross-document AND within-document repeats (a doc quoting itself is
still memorizable text).

Spark shape (all JVM, zero Python, no pair join anywhere):

1. ``posexplode`` → one row per char position with its raw L-gram
   (the gram itself is the key — no hash, no collisions, exact);
2. ``groupBy(gram).count`` → grams occurring ≥ 2 times (map-side
   partial counts absorb boilerplate-gram skew; an equi-join back
   tags positions — the build side is one row per gram, so AQE
   broadcasts it when small and a hash join streams the skewed
   probe side otherwise — deliberately NOT a count-over-window,
   which would buffer each gram's whole partition in one task);
3. per-doc gaps-and-islands: running max of span ends flags island
   starts, a running sum numbers them, one groupBy emits
   ``(span_start, span_end)`` — the classic SQL idiom, identical in
   the DuckDB oracle;
4. removal re-joins spans to the text and stitches the kept pieces
   with ``lag`` + sorted ``array_join`` — no per-row Python.

100 TB posture: cost is Θ(total characters) rows through two
hash exchanges (gram tag, doc islands) — linear, spillable,
skew-tolerant; there is no candidate-pair blowup to cap because no
pairs are ever formed. The gram payload is L bytes per position;
for L ≫ 50 swap the gram key for ``xxhash64(gram)`` (collision
probability ~n²/2⁶⁴, fine operationally — but no longer bit-exact
or oracle-portable, same trade the winnow operator documents).

Reference anchor: the reference engine has no substring-dedup surface
(SURVEY.md §2.5a E-series extension); semantics follow the public
ExactSubstr description, re-expressed as dataflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default minimal duplicated-span length, in characters. Lee et al.
#: use 50 BPE tokens; 30 chars keeps the synthetic fixtures non-empty
#: while staying far above chance 30-gram collisions in real text.
DEFAULT_MIN_SPAN = 30


def _gram_positions(
    df: DataFrame, id_col: str, text_col: str, min_len: int
) -> DataFrame:
    """One row per (doc, 1-based position) with the raw L-gram.
    Documents shorter than ``min_len`` contribute nothing (they cannot
    contain a span ≥ L)."""
    n_pos = F.length(text_col) - F.lit(min_len - 1)
    return (
        df.where(F.length(text_col) >= min_len)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), n_pos),
                    lambda i: F.substring(F.col(text_col), i, min_len),
                )
            ).alias("pos0", "gram"),
        )
        .select(id_col, (F.col("pos0") + F.lit(1)).alias("p"), "gram")
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_SPAN,
) -> DataFrame:
    """Maximal duplicated spans per document:
    ``(id_col, span_start, span_end)``, 1-based inclusive character
    ranges — exactly the union of all substrings of length ≥
    ``min_len`` occurring more than once in the corpus (see module
    docstring for the equivalence proof)."""
    grams = _gram_positions(df, id_col, text_col, min_len)
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= 2)
        .select("gram")
    )
    covered = grams.join(dup_grams, "gram").select(
        id_col, "p", (F.col("p") + F.lit(min_len - 1)).alias("e")
    )
    w = Window.partitionBy(id_col).orderBy("p")
    run_max_prev = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # a position starts a new island iff it leaves a gap of ≥ 1
    # uncovered char after everything before it (adjacent extents
    # merge: coverage is what we are unioning)
    flagged = covered.withColumn(
        "__new",
        F.when(
            run_max_prev.isNull() | (F.col("p") > run_max_prev + 1), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "__isl",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "__isl")
        .agg(
            F.min("p").alias("span_start"),
            F.max("e").alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = DEFAULT_MIN_SPAN,
    clean_col: str = "clean_text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Every input row with ``clean_col`` added: the text with all
    duplicated spans cut out (documents without spans pass through
    unchanged). Cutting is per-document stitching of the kept gaps —
    ``lag(span_end)`` bounds each kept piece, a sorted ``array_join``
    concatenates them, the tail after the last span closes the text.

    Pass ``spans`` (a — possibly persisted — :func:`duplicated_spans`
    result) when the caller also consumes the spans themselves, so the
    gram pipeline runs once, not once per consumer."""
    if spans is None:
        spans = duplicated_spans(df, id_col, text_col, min_len)
    wl = Window.partitionBy(id_col).orderBy("span_start")
    pieces = (
        spans.withColumn(
            "__prev_e", F.coalesce(F.lag("span_end").over(wl), F.lit(0))
        )
        .join(df.select(id_col, text_col), id_col)
        .select(
            id_col,
            "span_start",
            "span_end",
            F.col(text_col)
            .substr(
                F.col("__prev_e") + F.lit(1),
                F.col("span_start") - F.col("__prev_e") - F.lit(1),
            )
            .alias("__piece"),
        )
    )
    stitched = pieces.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("span_start", "__piece"))
                ),
                lambda s: s["__piece"],
            ),
            "",
        ).alias("__head"),
        F.max("span_end").alias("__last_e"),
    )
    return (
        df.join(stitched, id_col, "left")
        .withColumn(
            clean_col,
            F.when(F.col("__last_e").isNull(), F.col(text_col)).otherwise(
                F.concat(
                    F.col("__head"),
                    F.col(text_col).substr(
                        F.col("__last_e") + F.lit(1),
                        F.greatest(
                            F.length(text_col) - F.col("__last_e"),
                            F.lit(0),
                        ),
                    ),
                )
            ),
        )
        .drop("__head", "__last_e")
    )

"""Cross-document line deduplication (C4/CCNet-style boilerplate removal).

C4 (Raffel et al. 2020, §2.2) removes any line that occurs verbatim in
three or more documents — navigation menus, cookie banners, license
headers — before document-level dedup runs.  The operator here is the
exact version of that rule: count the *distinct documents* containing
each line, mark lines at or above the threshold as boilerplate, and
rebuild every document from its surviving lines in original order.

Scale posture (the 100 TB shape):

- one explode (narrow) → one ``groupBy(line)`` with map-side-combined
  ``countDistinct`` approximated as two-level exact (``(line, doc)``
  distinct then count) — Spark plans countDistinct exactly that way;
- the boilerplate set (lines ≥ threshold) is orders of magnitude
  smaller than the corpus — the membership join back is a broadcast
  when it fits (AQE decides), else a shuffle hash join on the line key;
- document reassembly is one ``groupBy(doc)`` over ``(pos, line)``
  pairs with ``sort_array`` — a single exchange on the document key,
  no window sort, no Python.

Nothing here touches the driver; every stage is a DataFrame op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_lines(
    df: DataFrame, id_col: str, lines_col: Column
) -> DataFrame:
    """One row per (doc, position, line), empty lines dropped but
    positions preserved so reassembly keeps original order."""
    return (
        df.select(id_col, F.posexplode(lines_col).alias("pos", "line"))
        .where(F.length("line") > 0)
    )


def boilerplate_lines(
    lines: DataFrame, id_col: str, min_docs: int = 3
) -> DataFrame:
    """Lines occurring in ≥ ``min_docs`` distinct documents.  Exact
    two-phase distinct: dedup (line, doc) first (map-side combinable),
    then count per line — the plan Spark generates for countDistinct,
    written out so the intermediate is reusable."""
    return (
        lines.select("line", id_col)
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    lines_col: Column | None = None,
    min_docs: int = 3,
) -> DataFrame:
    """Remove boilerplate lines corpus-wide and reassemble documents.

    Returns one row per input document: ``id_col, n_lines, n_removed,
    clean_text`` (clean_text = surviving lines joined by '\\n' in
    original order; empty string when everything was boilerplate).
    """
    if lines_col is None:
        lines_col = F.split(F.col("text"), "\n")
    lines = explode_lines(df, id_col, lines_col)
    bp = boilerplate_lines(lines, id_col, min_docs)
    flagged = lines.join(
        bp.select("line", F.lit(1).alias("is_bp")), "line", "left"
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum(F.coalesce(F.col("is_bp"), F.lit(0))).alias("n_removed"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("is_bp").isNull(),
                            F.struct(F.col("pos"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )

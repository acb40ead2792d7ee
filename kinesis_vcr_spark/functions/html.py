"""HTML → text extraction (E94).

Web-crawl corpora arrive as HTML; the first transformation every
training pipeline runs is markup removal + boilerplate accounting
(C4 extracts text before any quality filter; RefinedWeb §3.1 runs
trafilatura). This module is the Catalyst-expression version of that
step: a fixed chain of engine-portable regexp passes (RE2-safe — the
DuckDB oracle runs the identical chain) that

1. drops ``<script>``/``<style>``/``<!-- -->`` blocks WITH their
   contents (code and CSS are not training text),
2. turns block-level boundaries (``</p>``, ``<br>``, ``</div>``,
   ``</li>``, headings, table rows) into newlines so sentence
   structure survives tag removal,
3. strips every remaining tag,
4. decodes the common named + numeric character entities
   (``&amp; &lt; &gt; &quot; &#39; &nbsp;`` and decimal ``&#NNN;``
   for the ASCII range — the long tail is the documented
   production-library slot),
5. collapses runs of spaces/tabs and blank lines.

Alongside the text it computes the signals quality filters consume:
``markup_ratio`` (1 − text_len/html_len — boilerplate-heavy pages
score high), tag count, link count, and link-text density (the
classic boilerplate discriminator: navigation is mostly anchors).

Non-goals (the contract): no DOM tree, no CDATA, no conditional
comments, entity coverage limited to the set above — this is the
distributed 99 % path; register a trafilatura/lxml-backed Pandas UDF
for the long tail (swapping changes only the expression, never the
plan: everything here is a narrow projection, zero exchanges).

Reference anchor: no counterpart in the reference (record/replay
tool); part of the LLM-pipeline surface (SURVEY.md §2.5a) upstream of
text QC E22-E27.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) passes, in order. (?is) = case-insensitive +
# dot-matches-newline; both flags are RE2- and Java-portable.
HTML_STEPS: tuple[tuple[str, str], ...] = (
    # 1. container blocks go away WITH contents (non-greedy spans)
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # 2. block boundaries → newline (before generic tag strip)
    (r"(?i)</?(?:p|br|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|"
     r"article|header|footer)\b[^>]*>", "\n"),
    # 3. every remaining tag
    (r"(?s)<[^>]+>", " "),
    # 4. entities (after tag strip so literal &lt;tag&gt; text survives)
    (r"&nbsp;", " "),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&amp;", "&"),  # LAST of the entities: &amp;lt; → &lt; stays text
    # 5. whitespace normalization
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    # trim() strips only spaces in both engines; boundary newlines from
    # leading/trailing block tags go here
    (r"^\n+|\n+$", ""),
)


def html_to_text(html: Column) -> Column:
    """Extracted text (pure Catalyst regexp chain), trimmed."""
    out = html
    for pat, rep in HTML_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_signals(html: Column, text: Column) -> list[Column]:
    """Boilerplate signals as named columns: text/markup lengths, the
    markup ratio (6-dp double), tag and anchor counts, and link-text
    density (chars inside <a> spans / text chars, the navigation-page
    discriminator)."""
    html_len = F.length(html)
    text_len = F.length(text)
    # anchor contents via one group-extract-all (portable: same call in
    # DuckDB), inner tags + whitespace stripped before measuring
    anchor_text = F.concat_ws(
        "",
        F.regexp_extract_all(
            html, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"), 1
        ),
    )
    anchor_text_len = F.length(
        F.regexp_replace(anchor_text, r"(?s)<[^>]+>|\s+", "")
    )
    dense_text_len = F.length(F.regexp_replace(text, r"\s+", ""))
    return [
        text_len.alias("text_chars"),
        html_len.alias("html_chars"),
        F.round(
            F.when(html_len > 0,
                   1.0 - text_len.cast("double") / html_len.cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("markup_ratio"),
        F.size(F.regexp_extract_all(html, F.lit(r"(?s)<[^>]+>"), 0)).alias(
            "n_tags"
        ),
        F.size(
            F.regexp_extract_all(html, F.lit(r"(?is)<a\b[^>]*>"), 0)
        ).alias("n_links"),
        F.round(
            F.when(dense_text_len > 0,
                   anchor_text_len.cast("double")
                   / dense_text_len.cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("link_text_density"),
    ]


def html_to_text_sql(expr: str) -> str:
    """The SAME extraction chain as :func:`html_to_text`, rendered as
    nested DuckDB ``regexp_replace`` calls over SQL expression
    ``expr`` — generated from HTML_STEPS so the Spark chain and the
    oracle chain cannot drift. DuckDB replaces only the first match by
    default, so every step passes the 'g' option (Spark's default)."""
    out = expr
    for pat, rep in HTML_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"

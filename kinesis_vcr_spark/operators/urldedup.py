"""URL canonicalization + canonical-URL dedup (E91).

Web-corpus pipelines dedup at the URL level BEFORE any text-level
dedup (RefinedWeb §3.2 runs exact-URL dedup on CommonCrawl first;
C4 keeps one page per URL): the same page is crawled under http/https,
with/without ``www.``, with session/tracking query parameters, default
ports, fragments, and trailing slashes. Canonicalizing those variants
to one key removes the bulk of crawl duplication for the cost of ONE
string expression per URL — no pair joins, no similarity math.

The canonicalizer is a fixed chain of engine-portable regexp steps
(RE2-safe: no lookarounds or backreferences in PATTERNS, so the DuckDB
oracle runs the identical chain), applied in this order:

1. strip the fragment (``#...``),
2. strip the scheme (``http://`` / ``https://``, case-insensitive) —
   scheme variants of one page collapse,
3. lower-case the authority (host[:port]) — DNS names are
   case-insensitive; the PATH keeps its case (it is case-sensitive),
4. strip a leading ``www.``,
5. strip explicit default ports (``:80`` / ``:443``),
6. strip tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``) wherever they appear in the query string,
7. if the surviving first query separator became ``&``, restore ``?``,
8. strip trailing ``/``, ``?``, ``&``.

Documented non-goals (the contract, not accidents): query-parameter
ORDER is preserved (sorting parameters cannot be expressed as a shared
regexp chain and reorder-variants are rare in crawls); literal ``&``
inside a PATH is treated as a query separator by step 7; non-default
explicit ports and userinfo survive as distinct keys.

100 TB posture: ``extract_urls`` + ``canonicalize_url`` are narrow
whole-stage-codegen projections (explode is 1→N, no exchange); the
dedup aggregation is ONE shuffle on the canonical key with map-side
partial aggregation, and the distinct-variant count is Spark's
standard two-level distinct aggregate — a viral URL is a hot KEY but
its per-partition partials stay count-sized. No Python anywhere.

Reference anchor: the reference engine has no URL family —
this extends the blocklist module's URL extraction
(operators/blockfilter.py, RefinedWeb §3.1) from filtering to dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_vcr_spark.operators.blockfilter import extract_urls

# (pattern, replacement) chain — see module docstring for step order.
# Patterns are RE2-compatible; replacements use Spark's $N syntax (the
# DuckDB oracle writes the same chain with \N).
CANON_STEPS: tuple[tuple[str, str], ...] = (
    (r"#.*", ""),  # 1. fragment
    (r"^(?i:https?)://", ""),  # 2. scheme
    # 3. authority lower-casing is a concat, handled in code below
    (r"^www\.", ""),  # 4. www
    (r"^([^/?:]+):(?:80|443)([/?].*|$)", "$1$2"),  # 5. default ports
    (r"[?&](?:utm_[a-zA-Z0-9_]+|fbclid|gclid|msclkid)=[^&]*", ""),  # 6.
    (r"^([^?]*)&", "$1?"),  # 7. first surviving separator back to ?
    (r"[/?&]+$", ""),  # 8. trailing separators
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of one URL column (pure Catalyst — a chain of
    ``regexp_replace`` plus one authority-lowercase concat)."""
    u = F.regexp_replace(url, CANON_STEPS[0][0], CANON_STEPS[0][1])
    u = F.regexp_replace(u, CANON_STEPS[1][0], CANON_STEPS[1][1])
    # 3. lower the authority (everything before the first / or ?)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/?]*)", 1)),
        F.regexp_replace(u, r"^[^/?]*", ""),
    )
    for pat, rep in CANON_STEPS[2:]:
        u = F.regexp_replace(u, pat, rep)
    return u


def url_occurrences(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per URL occurrence: (id, raw_url, canon_url). Narrow
    explode projection — no exchange."""
    return docs.select(
        F.col(id_col),
        F.explode(extract_urls(F.col(text_col))).alias("raw_url"),
    ).withColumn("canon_url", canonicalize_url(F.col("raw_url")))


def url_dedup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonical-URL dedup accounting: per canonical key, the
    occurrence count, distinct raw spellings, distinct documents, and
    the deterministic keep representative (min id). ONE shuffle on the
    canonical key; filter on the result for dup-only groups
    (``n_occurrences > 1``) or join back to drop non-representatives."""
    occ = url_occurrences(docs, id_col, text_col)
    return occ.groupBy("canon_url").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("raw_url").alias("n_raw_variants"),
        F.countDistinct(id_col).alias("n_docs"),
        F.min(id_col).alias("keep_" + id_col),
    )


def canonicalize_url_sql(expr: str) -> str:
    """The SAME canonicalization chain as :func:`canonicalize_url`,
    rendered as nested DuckDB ``regexp_replace`` calls over SQL
    expression ``expr`` — generated from CANON_STEPS (the
    ``html_to_text_sql`` discipline: one source of truth, zero drift).
    Spark's ``$N`` group references become DuckDB's ``\\N``; step 3
    (authority lower-casing) is the same concat special case as the
    Column version."""

    def rr(e: str, pat: str, rep: str) -> str:
        p = pat.replace("'", "''")
        r = rep.replace("$", "\\").replace("'", "''")
        return f"regexp_replace({e}, '{p}', '{r}', 'g')"

    out = rr(expr, *CANON_STEPS[0])
    out = rr(out, *CANON_STEPS[1])
    out = (
        f"lower(regexp_extract({out}, '^([^/?]*)', 1)) "
        f"|| regexp_replace({out}, '^[^/?]*', '', 'g')"
    )
    for pat, rep in CANON_STEPS[2:]:
        out = rr(out, pat, rep)
    return out

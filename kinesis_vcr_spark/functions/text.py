"""Text-analysis column functions — language-ID, quality scoring, token
counting, document fingerprinting.

Pure Catalyst expressions (split / higher-order functions / regex /
integer arithmetic) with exact ANSI-SQL mirrors in
:mod:`kinesis_vcr_spark.queries.textstats` so the DuckDB oracle
reproduces values bit-for-bit (integer hashes, 6-dp rounded ratios).
One exception: :func:`fingerprint_features` is an Arrow-batched Pandas
UDF — the nested-HOF polynomial hash is interpreted (never codegen'd)
and ~10× slower than the numpy sliding-window pass.

Scale: every function is per-row (narrow); the only shuffles in the
queries built from these are the final groupBys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / counting
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: alpha runs | digit runs | single non-alnum glyphs.
# Class-based, so Java regex (Spark) and RE2 (DuckDB) agree.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(whitespace_tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0))


# ---------------------------------------------------------------------------
# language identification (stopword-profile scoring)
# ---------------------------------------------------------------------------

# Minimal high-frequency function-word profiles. Scoring is *presence of
# distinct tokens* (array_intersect), so doc length doesn't bias.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "los", "y", "es", "un", "una", "en", "que", "de", "no"],
    "fr": ["le", "les", "et", "est", "une", "dans", "il", "que", "pas", "au"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}
LANGS = sorted(STOPWORDS)  # deterministic evaluation order


def lang_hits(text: Column, lang: str) -> Column:
    """Number of distinct tokens of ``text`` in ``lang``'s profile."""
    toks = F.array_distinct(whitespace_tokens(text))
    profile = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(toks, profile))


def predicted_lang(text: Column) -> Column:
    """Argmax language by profile hits; ties (incl. all-zero) break to
    the alphabetically-first language — mirrored exactly in the oracle."""
    hits = {lang: lang_hits(text, lang) for lang in LANGS}
    best = F.greatest(*hits.values())
    expr = F.lit(LANGS[-1])
    for lang in reversed(LANGS[:-1]):
        expr = F.when(hits[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    stripped = F.regexp_replace(text, r"[^A-Za-z ]", "")
    return F.length(stripped).cast("double") / F.length(text).cast("double")


def type_token_ratio(text: Column) -> Column:
    toks = whitespace_tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast(
        "double"
    )


def mean_token_len(text: Column) -> Column:
    toks = whitespace_tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.size(toks).cast("double")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are English stopwords (fluency signal)."""
    toks = whitespace_tokens(text)
    profile = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(profile, t)))
    return hits.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length saturation + fluency + diversity +
    alphabetic cleanliness, equal-weighted. Rounded to 6 dp (stable
    across engines/summation orders)."""
    length_part = F.least(token_count(text).cast("double") / 100.0, F.lit(1.0))
    score = (
        length_part
        + stopword_ratio(text)
        + type_token_ratio(text)
        + alpha_ratio(text)
    ) / 4.0
    return F.round(score, 6)


# ---------------------------------------------------------------------------
# document fingerprinting (rolling polynomial hash over char 5-grams)
# ---------------------------------------------------------------------------

FP_SHINGLE = 5
FP_MOD = 2_147_483_648  # 2^31 — engine-portable integer arithmetic


def _poly_hash(s: Column) -> Column:
    """h = fold(codepoints, acc*31 + c mod 2^31) — exact in any engine."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.ascii(F.substring(s, i, 1)),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * 31 + c, F.lit(FP_MOD)),
    )


def char_5gram_hashes(text: Column) -> Column:
    """Rolling-hash values of all distinct char 5-grams."""
    last = F.greatest(F.length(text) - FP_SHINGLE + 1, F.lit(1))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), last),
            lambda i: F.substring(text, i, FP_SHINGLE),
        )
    )
    return F.transform(grams, _poly_hash)


def fingerprint(text: Column) -> Column:
    """Winnowing-style document fingerprint: min rolling-hash over all
    char 5-grams. Two near-identical docs share it with high probability;
    selecting by fingerprint equality is a cheap pre-dedup blocking key."""
    return F.array_min(char_5gram_hashes(text))


def fingerprint_features() -> Column:
    """Vectorized (fp, n_grams) — bit-identical to ``fingerprint`` +
    ``size(char_5gram_hashes)`` but ~10× faster on long documents.

    The Catalyst HOF form above is interpreted (nested transform/
    aggregate lambdas never enter codegen) and re-walks the string per
    gram; this Pandas UDF does the same mod-2^31 polynomial over exact
    code points (utf-32 decode) as one numpy sliding-window pass per
    Arrow batch. Distinctness is by gram *string* (unique code-point
    windows), matching ``array_distinct`` on substrings."""

    @F.pandas_udf("struct<fp: bigint, n_grams: int>")
    def _fp(texts: pd.Series) -> pd.DataFrame:
        fps = np.empty(len(texts), dtype=np.int64)
        counts = np.empty(len(texts), dtype=np.int32)
        for i, t in enumerate(texts):
            codes = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            if len(codes) >= FP_SHINGLE:
                win = np.lib.stride_tricks.sliding_window_view(
                    codes, FP_SHINGLE
                )
                # distinct count via a substring set: min over ALL
                # window hashes equals min over distinct ones, so only
                # the COUNT needs distinctness — a Python string set
                # is ~3× cheaper than np.unique's lexicographic row
                # sort (string slices == code-point windows; utf-32
                # decode is injective)
                n_uniq = len({
                    t[j:j + FP_SHINGLE]
                    for j in range(len(codes) - FP_SHINGLE + 1)
                })
            else:
                win = codes.reshape(1, -1)  # one short gram = whole text
                n_uniq = 1
            h = np.zeros(len(win), dtype=np.int64)
            for j in range(win.shape[1]):
                h = (h * 31 + win[:, j]) % FP_MOD
            fps[i] = h.min() if len(h) else 0
            counts[i] = n_uniq
        return pd.DataFrame({"fp": fps, "n_grams": counts})

    return _fp


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Class-based patterns only (no lookaround, no \b), so Java regex
# (Spark) and RE2 (DuckDB) match identical spans.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (email/phone/ipv4) in ``text``."""
    return F.regexp_count(text, F.lit(PII_PATTERNS[kind]))


def redact_pii(text: Column, kinds: tuple[str, ...] = ("email", "phone", "ipv4")) -> Column:
    """Replace each PII span with ``<KIND>``. Order matters: emails
    first (their local part contains digits a phone pattern could
    bite), then phones, then bare IPv4s."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


# ---------------------------------------------------------------------------
# Unicode normalization (corpus canonical form)
# ---------------------------------------------------------------------------

# C0/C1 control characters minus \t \n \r — the standard strip set
CONTROL_CHARS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]"


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC canonical composition — the corpus-prep step that
    makes 'e +  ̈' and 'ë' the SAME bytes before any hashing, dedup, or
    tokenization runs (decomposed vs composed forms otherwise defeat
    exact dedup and split token statistics). Vectorized Pandas UDF
    (pandas ``str.normalize`` → unicodedata); NFC only — NFKC's
    compatibility mappings are lossy (ligatures, superscripts) and
    engine implementations diverge more across Unicode versions."""

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return _nfc(text)


def strip_control_chars(text: Column) -> Column:
    """Remove C0/C1 controls (keeping \\t \\n \\r) — JVM-side regex."""
    return F.regexp_replace(text, CONTROL_CHARS, "")


def canonicalize_text(text: Column) -> Column:
    """NFC + control strip: the canonical form every downstream
    operator (dedup fingerprints, token counts, LM scores) should see
    exactly once, at ingest."""
    return strip_control_chars(nfc_normalize(text))


# ---------------------------------------------------------------------------
# Unicode script profiling (E105, r12) — the script-level complement of
# predicted_lang: language ID needs per-language stopword profiles, but
# the first routing decision in a multilingual crawl is SCRIPT (Latin
# pipelines, CJK tokenizers, RTL handling), and script is a pure
# codepoint-range property — whole-stage-codegen countable with one
# regexp_replace per script, no tokenization, no Python.
# ---------------------------------------------------------------------------

#: script -> Unicode block ranges (public Unicode data), as (lo, hi)
#: codepoint pairs. Deliberately the high-traffic crawl scripts only;
#: extend by adding ranges (both engines consume the same table).
SCRIPT_RANGES: dict[str, tuple[tuple[int, int], ...]] = {
    "latin": ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)),
    "cyrillic": ((0x400, 0x4FF), (0x500, 0x52F)),
    "greek": ((0x370, 0x3FF), (0x1F00, 0x1FFF)),
    "arabic": ((0x600, 0x6FF), (0x750, 0x77F)),
    "cjk": ((0x3400, 0x4DBF), (0x4E00, 0x9FFF)),
}

#: deterministic dominance order for count ties (fixed priority, both
#: engines apply the same order)
SCRIPT_ORDER = ("latin", "cyrillic", "greek", "arabic", "cjk")


def script_char_class(script: str) -> str:
    """Regex character class for a script's ranges in JAVA regex
    syntax (Spark) — ``[\\uXXXX-\\uYYYY...]``."""
    parts = "".join(
        f"\\u{lo:04X}-\\u{hi:04X}" for lo, hi in SCRIPT_RANGES[script]
    )
    return f"[{parts}]"


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script character counts: length(text) minus the length with
    that script's class stripped — one codegen regexp_replace per
    script, the alpha_ratio pattern."""
    return {
        s: (
            F.length(text)
            - F.length(F.regexp_replace(text, script_char_class(s), ""))
        ).cast("long")
        for s in SCRIPT_ORDER
    }


def dominant_script(text: Column) -> Column:
    """Name of the script with the most characters (ties broken by
    SCRIPT_ORDER priority); 'none' when no counted script appears."""
    counts = script_counts(text)
    best_name = F.lit("none")
    best_count = F.lit(0).cast("long")
    # iterate in REVERSE priority with >=: the later-processed (higher
    # priority) script replaces the champion on equal counts, so ties
    # resolve to the earliest SCRIPT_ORDER entry on both engines
    for s in reversed(SCRIPT_ORDER):
        c = counts[s]
        best_name = F.when((c > 0) & (c >= best_count), F.lit(s)).otherwise(
            best_name
        )
        best_count = F.greatest(best_count, c)
    return best_name

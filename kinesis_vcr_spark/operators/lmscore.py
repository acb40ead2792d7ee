"""Unigram language-model scoring — the CCNet-style perplexity filter.

CCNet (Wenzek et al. 2019) buckets web documents by language-model
perplexity: text far from the reference distribution is boilerplate,
gibberish, or spam. The full KenLM 5-gram is a model artifact; the
*pipeline-shaped* part — train token statistics over a huge corpus,
then score every document by its mean per-token negative log
likelihood — is exactly a Spark aggregation problem, and a smoothed
unigram LM already separates natural text from noise well enough to
be a useful first-pass filter.

Two stages, both scale-clean:

- **train**: explode → ``groupBy(token)`` count (map-side combined; the
  result is vocabulary-sized, orders of magnitude smaller than the
  corpus) + one 1-row total. Add-α smoothing:
  ``p(t) = (c_t + α) / (N + α·V)``.
- **score**: broadcast-join the NLL table back onto the exploded
  corpus (vocab ≪ broadcast threshold; the corpus side never
  shuffles for the lookup), then one map-side-combinable
  ``groupBy(doc)``.

Exactness discipline (same recipe as ``operators/classify.py``): the
sole float op, ``ln``, happens ONCE per *distinct token* and is
immediately fixed to integer micro-nats; per-document totals are then
exact bigint sums — order-independent and engine-identical, so the
DuckDB oracle reproduces every score digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _tokens(df: DataFrame, id_col: str, text_col: str, *extra: str) -> DataFrame:
    return df.select(
        id_col, *extra, F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.length("token") > 0)


def unigram_nll_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """(token, nll_micro) — per-token negative log likelihood of the
    add-α-smoothed unigram LM, in integer micro-nats.

    ``nll_micro = round(ln((N + α·V) / (c + α)) · 1e6)`` where N =
    corpus token count, V = vocabulary size. Vocabulary-sized output.
    """
    counts = (
        _tokens(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )
    totals = counts.agg(
        F.sum("c").alias("n_total"), F.count("*").alias("v_size")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.round(
                F.log(
                    (F.col("n_total") + F.lit(alpha) * F.col("v_size"))
                    / (F.col("c") + F.lit(alpha))
                )
                * MICRO
            )
            .cast("long")
            .alias("nll_micro"),
        )
    )


def score_documents_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lm: DataFrame | None = None,
    oov_nll_micro: int | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document LM score: ``id_col, n_tokens, nll_micro_total``
    (exact bigint) and ``avg_nll`` (mean per-token nats, 6 dp).

    ``lm=None`` trains on ``df`` itself (self-scoring: every token is
    in-vocabulary, the CCNet "score the corpus by its own statistics"
    mode). An external ``lm`` table needs ``oov_nll_micro`` — the
    penalty for unseen tokens (ln((N + α·V)/α) of the training corpus);
    passing an external lm without it raises rather than silently
    scoring OOV as free.
    """
    if lm is None:
        lm = unigram_nll_table(df, id_col, text_col, alpha=alpha)
        oov = F.lit(None).cast("long")  # unreachable: self-trained
    else:
        if oov_nll_micro is None:
            raise ValueError("external lm requires oov_nll_micro")
        oov = F.lit(int(oov_nll_micro)).cast("long")
    toks = _tokens(df, id_col, text_col)
    contrib = toks.join(F.broadcast(lm), "token", "left").select(
        id_col, F.coalesce("nll_micro", oov).alias("nll_micro")
    )
    agg = contrib.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("nll_micro").alias("nll_micro_total"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "nll_micro_total",
        F.round(
            F.col("nll_micro_total")
            / (F.col("n_tokens").cast("double") * MICRO),
            6,
        ).alias("avg_nll"),
    )

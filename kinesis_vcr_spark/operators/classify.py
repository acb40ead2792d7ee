"""Linear text classification at scale — fastText-style scoring with
broadcast weights or the feature-hashing trick.

A training-data pipeline's "model-based quality filter" is usually a
linear model over bag-of-words features (fastText / CCNet quality
scoring): score = sigmoid(bias + Σ w[token]).  At 100 TB the right plan
is exactly the TF-IDF shape: explode tokens (narrow), resolve weights
with either

- **a broadcast join** against a (token, weight) table — vocabularies
  are ~10⁵-10⁶ rows ≪ broadcast threshold; the corpus side never
  shuffles for the lookup; or
- **the hashing trick** — weight derived from a hash of the token, no
  vocabulary table at all (Weinberger et al. 2009); fully portable
  and what the driver query uses (md5-derived pseudo-weights that
  DuckDB reproduces digit-for-digit).

then one map-side-combinable groupBy(doc) sum.

Exactness discipline: per-token weights are integer **milli-units**
(bigint), so the per-document sum is exact integer arithmetic —
order-independent, engine-identical; the single float op (sigmoid) is
applied once to the exact logit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_weight_milli(token: Column, seed: str = "") -> Column:
    """Deterministic pseudo-weight in [-1000, 1000] (milli-units) from
    the first 6 md5 hex digits of the token — the feature-hashing
    trick with an engine-portable hash (mod-prime over a 24-bit hex
    prefix; DuckDB reproduces it with character arithmetic)."""
    h = F.substring(F.md5(F.concat(F.lit(seed), token).cast("binary")), 1, 6)
    return (F.conv(h, 16, 10).cast("long") % 2001 - 1000).alias("w_milli")


def score_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: DataFrame | None = None,
    seed: str = "",
    bias_milli: int = 0,
) -> DataFrame:
    """Per-document linear score.

    ``weights`` = (token, w_milli bigint) table → broadcast-joined
    (production mode; unknown tokens contribute 0).  ``weights=None``
    → hashing trick (no table, no join).  Output: ``id_col, n_tokens,
    logit_milli`` (exact bigint) and ``score`` (sigmoid, 6 dp).
    """
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("token")
    ).where(F.length("token") > 0)

    if weights is not None:
        contrib = (
            toks.join(F.broadcast(weights), "token", "left")
            .select(id_col, F.coalesce("w_milli", F.lit(0)).alias("w_milli"))
        )
    else:
        contrib = toks.select(id_col, hash_weight_milli(F.col("token"), seed))

    agg = contrib.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (F.sum("w_milli") + F.lit(bias_milli)).alias("logit_milli"),
    )
    z = F.col("logit_milli").cast("double") / 1000.0
    return agg.select(
        id_col,
        "n_tokens",
        "logit_milli",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )

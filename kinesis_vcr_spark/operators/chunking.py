"""Sliding-window document chunking — the embedding/RAG prep step.

Embedding models and retrieval pipelines consume fixed-size windows
with overlap (so no semantic unit is split without a copy that keeps
it whole); context-window training wants the same shape without
overlap. This is the 1→N projection BEFORE embedding — distinct from
``operators/packing.py``, which packs many short docs INTO training
windows after tokenization.

Standard stride arithmetic: ``stride = window − overlap``;
``n_chunks = ceil(max(n_tokens − overlap, 1) / stride)`` — every token
is covered, consecutive chunks share exactly ``overlap`` tokens, and
the final chunk keeps its short tail. Implemented as one Catalyst
``transform(sequence(...))`` + ``posexplode`` — a narrow 1→N flatMap
that never shuffles and never leaves the JVM; at 100 TB chunking adds
ZERO exchanges to whatever pipeline consumes it. Chunk ids are
``(doc_id, chunk_id)`` with chunk_id = 0-based window index —
deterministic, layout-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window_tokens: int = 128,
    overlap_tokens: int = 32,
) -> DataFrame:
    """One row per chunk: ``(id_col, chunk_id, n_chunk_tokens,
    chunk_text)``. Whitespace tokens; a document shorter than one
    window yields a single chunk of itself."""
    if not 0 <= overlap_tokens < window_tokens:
        raise ValueError("need 0 <= overlap_tokens < window_tokens")
    stride = window_tokens - overlap_tokens
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil(
            F.greatest(n - F.lit(overlap_tokens), F.lit(1))
            / F.lit(float(stride))
        ).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.slice(toks, i * stride + F.lit(1), window_tokens),
    )
    return (
        df.select(
            id_col, F.posexplode(chunks).alias("chunk_id", "__chunk")
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )

"""Text-analysis operators over the ``documents`` table.

All hot-path expressions are JVM-side built-ins (whole-stage codegen);
the only Python is the Arrow-vectorized token counter, which exists to
cross-validate ``extractlib.tokens`` against the SQL-expressible formula
the DuckDB oracle uses (the chunk-boundary oracle depends on that parity).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document counts: words, chars, distinct words, mean word length.
    Pure built-ins — stays in whole-stage codegen."""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_chars = F.length(F.col("text"))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        ((n_chars - (n_words - F.lit(1))) / n_words.cast("double"))
        .alias("mean_word_len"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality signals: stopword ratio, short-word ratio,
    lexical diversity. (Gopher/C4-style filters, built-ins only.)"""
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("double")
    stop = F.expr(
        "size(filter(split(text, ' '), w -> w IN "
        "('the', 'a', 'of', 'and', 'to', 'in', 'is')))"
    ).cast("double")
    short = F.expr(
        "size(filter(split(text, ' '), w -> length(w) <= 2))"
    ).cast("double")
    diversity = (
        F.size(F.array_distinct(words)).cast("double") / n_words
    )
    return docs.select(
        "doc_id",
        (stop / n_words).alias("stopword_ratio"),
        (short / n_words).alias("shortword_ratio"),
        diversity.alias("lexical_diversity"),
    )


def _token_count_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ragflow_spark.extractlib.tokens import num_tokens_from_string

    for pdf in it:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_tokens": pdf["text"].map(num_tokens_from_string),
        })


def token_counts(docs: DataFrame) -> DataFrame:
    """Deterministic token counts via extractlib.tokens (Arrow-batched).

    The DuckDB oracle recomputes the same counts from the closed-form
    per-word formula; a match proves the Python counter and the SQL
    chunk-boundary oracle agree."""
    return docs.select("doc_id", "text").mapInPandas(
        _token_count_batches, schema="doc_id long, n_tokens long"
    )

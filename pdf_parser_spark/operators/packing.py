"""Sequence packing: assign documents to fixed token-budget training
chunks (GPT-style concat-and-chunk).

The last pre-tokenization stage of an LLM data pipeline: documents are
concatenated in a deterministic order and the token stream is cut at
fixed ``budget`` boundaries, so a document may span chunks (Brown et
al. 2020 §2.3 train on exactly this shape; the alternative
no-straddling bin packing is an inherently sequential scan and is NOT
what large pipelines run). Because chunk assignment is a pure function
of the exclusive running token sum, it is window-expressible — one
shuffle, whole-stage codegen, cell-for-cell replicable in SQL.

Scale shape: pack WITHIN a shard key (``part_col``, e.g. source or
bucket) — that is how production pipelines shard the job, and it keeps
each window partition bounded. A global total order (part_col=None)
is supported for small corpora/tests but serializes into one window
partition; the docstring warning is the guard rail, matching how
real pipelines treat global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(docs: DataFrame, budget: int,
                order_col: str = "doc_id",
                part_col: str | None = None,
                tokens_col: str = "n_tokens") -> DataFrame:
    """Assign each document its chunk span under concat-and-chunk
    packing with ``budget`` tokens per chunk.

    Adds to ``docs``:

    - ``tok_start``: exclusive running sum of ``tokens_col`` in
      ``order_col`` order (within ``part_col`` if given) — the
      document's offset in the concatenated token stream.
    - ``chunk_first`` / ``chunk_last``: 0-based ids of the first and
      last chunk the document lands in (``chunk_last >= chunk_first``;
      equal unless the document straddles a boundary. A zero-token
      document gets ``chunk_last = chunk_first``).
    - ``chunk_offset``: the document's token offset inside
      ``chunk_first`` (in ``[0, budget)``).

    Every chunk id below ``floor(total_tokens / budget)`` receives
    exactly ``budget`` tokens; only the final chunk per partition is
    short. Plan: ONE window (sum over unbounded-preceding rows) = one
    exchange on ``part_col``; everything else is codegen'd arithmetic
    — no UDF, no second shuffle, no driver participation.

    With ``part_col=None`` the window has a single partition
    (sequential at scale — test/small-corpus use only); pass the shard
    key at scale.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (Window.partitionBy(*([part_col] if part_col else []))
         .orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tok_end = F.sum(tokens_col).over(w)
    tok_start = (tok_end - F.col(tokens_col)).alias("tok_start")
    chunk_first = F.floor((tok_end - F.col(tokens_col)) / budget)
    # last token of the doc is at tok_end - 1; empty docs clamp up
    chunk_last = F.greatest(F.floor((tok_end - 1) / budget),
                            chunk_first)
    return docs.select(
        "*",
        tok_start,
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        ((tok_end - F.col(tokens_col)) % budget).alias("chunk_offset"),
    )

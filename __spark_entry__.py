"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship PDF-extraction pipeline (kernel per
SURVEY.md §2, golden parity per FIXTURES.md) keyed off the sf0.001
tables; ``queries``/``oracle_sql`` expose the full operator catalog
from ``pdf_parser_spark.queries`` (relational demo layer, dedup,
text analysis, ANN similarity, multimodal plumbing, extraction).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the driver may import this module from any cwd
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract text from a deterministic synthetic transcript
    corpus (fixture PDFs in the ``text`` column — FIXTURES.md §1) sized
    from the sf0.001 documents table, joined per-turn against golden
    expectations. Returns one row per turn with the extracted text and
    its parity flag; the driver checks rows>0 and a stable schema.
    """
    from pdf_parser_spark.operators.extraction import extract_turns
    from pdf_parser_spark.sources.turns import golden_turns, synthetic_turns

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_convs = max(int(docs.count()), 10)

    turns = synthetic_turns(spark, n_convs, partitions=8)
    golden = golden_turns(spark, n_convs, partitions=8)
    extracted = extract_turns(turns).select(
        "conv_id", "turn_idx", F.col("text").alias("extracted"),
        "n_pages", F.size("spans").alias("n_spans"), "parse_error")
    return (extracted
            .join(golden.withColumnRenamed("text", "golden_text")
                  .select("conv_id", "turn_idx", "golden_text"),
                  ["conv_id", "turn_idx"])
            .withColumn("matched",
                        F.col("extracted") == F.col("golden_text"))
            .select("conv_id", "turn_idx", "extracted", "n_pages",
                    "n_spans", "matched", "parse_error"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2)."""
    from pdf_parser_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; xxhash64-LSH, seeded-hyperplane
    ANN and the PDF kernel itself are non-SQL-expressible → omitted
    (rows-only checks)."""
    from pdf_parser_spark.queries import ORACLES

    return dict(ORACLES)

"""The extraction operator: PDF-bytes-in-turn-rows -> extracted text.

This is the Spark face of the kernel (SURVEY.md §2.6 "UDF surface"):
ONE ``mapInPandas`` kernel processes whole Arrow batches — zero per-row
Python<->JVM crossings (north_rule). The kernel never raises: malformed
documents produce ``parse_error`` rows (the reference instead panics,
src/lib.rs:68).

Scale design (100 TB / 10^12 turns):
- the operator is embarrassingly parallel per turn; no shuffle is
  *required* — ``extract_turns`` adds one only when ``salt`` is set, to
  split skewed long conversations across tasks (safe: turns independent)
- column pruning: only (conv_id, turn_idx, text) cross the Arrow
  boundary; everything else stays JVM-side and is re-joined by the
  caller if needed
- Arrow batch size is capped in session.py because rows are PDF-fat
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(T.StructType([
    T.StructField("page", T.IntegerType()),
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("font", T.StringType()),
    T.StructField("s", T.StringType()),
]))

# FIXTURES.md §2 output schema
EXTRACT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("spans", SPAN_TYPE),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("n_objects", T.IntegerType()),
    T.StructField("bytes", T.LongType()),
    T.StructField("parse_error", T.StringType()),
])


def _extract_batches(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Python call per Arrow batch. Imports are
    inside the function so the closure pickles cheaply."""
    from pdf_parser_spark.kernel.extract import extract_text

    for pdf in batches:
        rows = {
            "conv_id": pdf["conv_id"],
            "turn_idx": pdf["turn_idx"].astype("int32"),
        }
        texts, spans, n_pages, n_objects, nbytes, errors = \
            [], [], [], [], [], []
        for raw in pdf["text"]:
            try:
                data = raw.encode("latin-1") if raw is not None else b""
            except UnicodeEncodeError:
                data = b""
            if not data:
                res = {"text": "", "spans": [], "n_pages": 0,
                       "n_objects": 0, "bytes": 0,
                       "parse_error": "EmptyOrNonLatin1Payload"}
            else:
                res = extract_text(data)
            texts.append(res["text"])
            spans.append(res["spans"])
            n_pages.append(res["n_pages"])
            n_objects.append(res["n_objects"])
            nbytes.append(res["bytes"])
            errors.append(res["parse_error"])
        rows["text"] = texts
        rows["spans"] = spans
        rows["n_pages"] = pd.array(n_pages, dtype="int32")
        rows["n_objects"] = pd.array(n_objects, dtype="int32")
        rows["bytes"] = pd.array(nbytes, dtype="int64")
        rows["parse_error"] = errors
        yield pd.DataFrame(rows)


def extract_turns(turns: DataFrame, salt: int | None = None,
                  partitions: int | None = None) -> DataFrame:
    """Run the extraction kernel over a turns DataFrame.

    ``salt``/``partitions``: optional skew-safe repartition — hash on
    (conv_id, salt) where salt = pmod(xxhash64(conv_id, turn_idx), salt)
    so one multi-thousand-turn conversation spreads over ``salt`` tasks
    (north_rule: explicit salting for skewed long conversations).
    Projection to (conv_id, turn_idx, text) happens FIRST so only those
    columns shuffle and cross the Arrow boundary.
    """
    slim = turns.select("conv_id", "turn_idx", "text")
    if salt is not None and partitions is not None:
        slim = slim.repartition(
            partitions,
            F.xxhash64("conv_id"),
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt)),
        )
    return slim.mapInPandas(_extract_batches, schema=EXTRACT_SCHEMA)

"""Deterministic synthetic ``turns`` transcript table (FIXTURES.md §1).

Schema exactly per BASELINE.json input_hint:
``(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)`` — ``text`` holds one fixture PDF's bytes
latin-1-decoded (lossless byte<->str round trip).

Generation is *distributed*: ``spark.range(n_convs)`` fans out and a
``mapInPandas`` kernel expands each conversation into its turns, so the
driver never materializes the corpus (scales to any n_convs). Skew knob:
~2% of conversations are long (FIXTURES.md §1) to exercise salting.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), False),
    T.StructField("ts", T.TimestampType(), False),
])

GOLDEN_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("n_pages", T.IntegerType(), False),
    T.StructField("n_spans", T.IntegerType(), False),
])

_ROLES = ("user", "assistant", "tool")
_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


def n_turns_for(i: int) -> int:
    """FIXTURES.md §1 skew knob: conversation i has 1 + (7 if i%50==0
    else i%4) turns — ~2% long conversations."""
    return 1 + (7 if i % 50 == 0 else i % 4)


def _conv_rows(i: int, broken_every: int):
    """All turn rows for conversation i. ``broken_every``: every k-th
    conversation's last turn carries a malformed PDF (0 = never)."""
    from pdf_parser_spark.fixtures import (
        BROKEN_FIXTURES, fixture_for, get_fixture,
    )
    conv_id = f"conv-{i:06d}"
    nt = n_turns_for(i)
    rows = []
    for t in range(nt):
        fid, pdf, golden = fixture_for(conv_id, t)
        is_broken = (broken_every and t == nt - 1
                     and i % broken_every == broken_every - 1)
        if is_broken:
            bids = sorted(BROKEN_FIXTURES)
            fid = bids[i % len(bids)]
            pdf, golden = get_fixture(fid)
        role = _ROLES[t % 3]
        rows.append({
            "conv_id": conv_id,
            "turn_idx": t,
            "role": role,
            "text": pdf.decode("latin-1"),
            "tool": "pdf_extract" if role == "tool" else "",
            "ts": _EPOCH + timedelta(seconds=i * 3600 + t * 60),
            "_fid": fid,
            "_golden_text": "" if is_broken else golden["text"],
            "_golden_pages": 0 if is_broken else golden["n_pages"],
            "_golden_spans": 0 if is_broken else golden["n_spans"],
        })
    return rows


def synthetic_turns(spark: SparkSession, n_convs: int,
                    broken_every: int = 0,
                    partitions: int | None = None) -> DataFrame:
    """Distributed deterministic turns table."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(_conv_rows(int(i), broken_every))
            out = pd.DataFrame(rows, columns=cols + ["_fid", "_golden_text",
                                                     "_golden_pages",
                                                     "_golden_spans"])
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out[cols]

    rng = spark.range(n_convs)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(expand, schema=TURNS_SCHEMA)


def golden_turns(spark: SparkSession, n_convs: int,
                 broken_every: int = 0,
                 partitions: int | None = None) -> DataFrame:
    """Expected extraction per turn, from the same deterministic fixture
    mapping (FIXTURES.md §1 golden table)."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                for r in _conv_rows(int(i), broken_every):
                    rows.append({
                        "conv_id": r["conv_id"],
                        "turn_idx": r["turn_idx"],
                        "text": r["_golden_text"],
                        "n_pages": r["_golden_pages"],
                        "n_spans": r["_golden_spans"],
                    })
            out = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text",
                                              "n_pages", "n_spans"])
            out["turn_idx"] = out["turn_idx"].astype("int32")
            out["n_pages"] = out["n_pages"].astype("int32")
            out["n_spans"] = out["n_spans"].astype("int32")
            yield out

    rng = spark.range(n_convs)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(expand, schema=GOLDEN_SCHEMA)

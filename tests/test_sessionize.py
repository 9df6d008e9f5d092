"""Custom stateful streaming operator (applyInPandasWithState
sessionization): closed sessions emitted by the stream must match the
batch-equivalent sessionization exactly; open sessions stay in state."""

from __future__ import annotations

import os
import shutil

import pytest


def test_stream_sessions_match_batch(spark, tmp_path):
    from pdf_parser_spark.streaming.events_stream import events_stream
    from pdf_parser_spark.streaming.sessionize import (
        sessionize_batch, sessionize_stream,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(src):
        pytest.skip("testdata missing")
    src_dir = tmp_path / "events"
    src_dir.mkdir()
    shutil.copy(src, src_dir / "part-0.parquet")

    gap = 3600  # 1h gap on the sparse sf0.001 event stream
    batch = {tuple(r) for r in
             sessionize_batch(spark.read.parquet(str(src_dir)),
                              gap_s=gap).collect()}

    q = (sessionize_stream(events_stream(spark, str(src_dir)), gap_s=gap)
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("select * from sessions").collect()}

    # append mode emits only sessions CLOSED by the watermark; every
    # emitted session must match the batch result exactly
    assert len(got) > 0
    assert got <= batch
    # the un-emitted remainder is exactly the still-open tail sessions:
    # per user at most the final session can be open
    missing = batch - got
    users_missing = [m[0] for m in missing]
    assert len(users_missing) == len(set(users_missing))

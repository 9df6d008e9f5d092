"""Structured Streaming face of the extraction pipeline.

The reference is single-shot batch (SURVEY.md §2.6: no streaming
operators exist), and the north_rule's resume requirement is satisfied
by batch checkpointing (pipeline/job.py). This module adds the
*continuous-ingest* shape a production transcript pipeline grows into:
new turn files landing in a directory (or an Iceberg table with a
streaming source on a real cluster) are extracted incrementally with
exactly-once sink semantics via the streaming checkpoint.

Design notes (scale):
- the extraction kernel is the SAME ``mapInArrow`` operator as batch —
  streaming and batch share one code path, so golden parity carries
  over verbatim
- file-source option ``maxFilesPerTrigger`` bounds micro-batch size
  (fat PDF rows); the sink partitions by conv_id bucket like the batch
  job
- ``Trigger.AvailableNow`` drains the backlog then stops — the batch
  job expressed as a stream, used by tests and backfills
- late/duplicate data: the file source is append-only; replays are
  prevented by the checkpoint, and downstream consumers dedupe on
  (conv_id, turn_idx) which the extraction preserves 1:1
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import EXTRACT_SCHEMA, _extract_batches
from ..sources.turns import TURNS_SCHEMA


def extract_stream(spark: SparkSession, input_dir: str,
                   max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming DataFrame of extractions over a growing parquet dir."""
    reader = (spark.readStream.schema(TURNS_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    turns = reader.load(input_dir)
    slim = turns.select("conv_id", "turn_idx", "text")
    return slim.mapInArrow(_extract_batches, schema=EXTRACT_SCHEMA)


def run_stream_once(spark: SparkSession, input_dir: str, output_dir: str,
                    checkpoint_dir: str, n_buckets: int = 16) -> None:
    """Drain everything currently in ``input_dir`` into ``output_dir``
    (Trigger.AvailableNow), exactly-once via the checkpoint: re-running
    after new files land processes ONLY the new files."""
    ext = (extract_stream(spark, input_dir)
           .withColumn("bucket",
                       F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))))
    q = (ext.writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir)
         .partitionBy("bucket")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

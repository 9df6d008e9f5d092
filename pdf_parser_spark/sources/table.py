"""Thin table abstraction: Iceberg when a catalog is configured,
parquet directories otherwise (the sandbox ships no Iceberg jars —
SURVEY.md §1.2).

The production shape (north_star) is an Iceberg table of transcript
turns read by snapshot, with the snapshot id recorded in per-partition
lineage rows so reruns are reproducible against a fixed input. The
parquet fallback derives a deterministic pseudo-snapshot from the file
listing (names + sizes + mtimes) — good enough to detect "input
changed under me" on resume, which is the property lineage needs.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def is_iceberg_ref(ref: str) -> bool:
    """Catalog table refs look like ``catalog.db.table`` (no slashes);
    paths contain a separator or exist on disk."""
    return "/" not in ref and "\\" not in ref and not os.path.exists(ref)


def load_table(spark: SparkSession, ref: str,
               snapshot_id: str | None = None) -> DataFrame:
    """Load a turns table from an Iceberg ref or a parquet dir."""
    if is_iceberg_ref(ref):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.table(ref)
    return spark.read.parquet(ref)


def current_snapshot_id(spark: SparkSession, ref: str) -> str:
    """Snapshot identifier recorded into lineage rows.

    Iceberg: the table's current snapshot id (via the ``.snapshots``
    metadata table). Parquet: sha256 over the sorted file listing
    (relpath, size, mtime_ns) — changes iff the input changes.
    """
    if is_iceberg_ref(ref):
        try:
            row = (spark.read.table(f"{ref}.snapshots")
                   .orderBy("committed_at", ascending=False)
                   .select("snapshot_id").head())
            return str(row["snapshot_id"]) if row else "empty"
        except Exception:
            return "unknown"
    h = hashlib.sha256()
    for dirpath, _dirs, files in sorted(os.walk(ref)):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(dirpath, f)
            st = os.stat(full)
            rel = os.path.relpath(full, ref)
            h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()[:16]

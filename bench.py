"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "extract": {"turns": N, "mb": M, "turns_per_sec": ..., ...}}

Query results are forced with a noop-format write (full plan executes,
nothing is collected to the driver). The extraction benchmark runs the
flagship mapInPandas kernel over a deterministic synthetic transcript
corpus (SPARK_GRAFT_BENCH_CONVS conversations, default 20000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family that matters at scale. The
# exact-pairwise variants (dd02, ann01 brute force) are correctness
# oracles, not scale paths — the bench runs the LSH variants alongside
# the brute-force ANN baseline for comparison.
HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q05_top_orders_per_customer",
    "q11_events_hourly",
    "dd01_exact_dedup",
    "dd03_minhash_lsh",
    "dd04_simhash",
    "dd05_embedding_cosine",
    "dd06_embedding_srp",
    "tx02_quality",
    "tx03_langid",
    "tx04_fingerprint",
    "ann01_cosine_topk",
    "ann02_lsh_topk",
    "ann03_ivf_topk",
    "q23_session_window",
    "cp01_curation_pipeline",
    "mm01_decode_meta",
    "mm02_frame_sample",
]


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))

    from pdf_parser_spark.queries import (
        QUERIES, dd03_minhash_lsh, dd04_simhash, dd05_embedding_cosine,
    )
    from pdf_parser_spark.session import get_spark

    # dd05 left the 50-entry driver registry in round 3 (pytest-oracled
    # twin of dd06) but stays in the bench as the brute-force baseline;
    # dd03/dd04 (xxhash64 scale paths) left it in round 4 (md5-lane
    # twins dd07/dd09 hold the oracled slots) and stay benchmarked here
    catalog = dict(QUERIES)
    catalog["dd05_embedding_cosine"] = dd05_embedding_cosine
    catalog["dd03_minhash_lsh"] = dd03_minhash_lsh
    catalog["dd04_simhash"] = dd04_simhash

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    # spin up the python-worker pool once so the first pandas/arrow
    # query isn't charged ~10s of 32x interpreter+import startup
    import pandas as _pd

    spark.range(cpus * 4).repartition(cpus).mapInPandas(
        lambda it: (pdf for pdf in it), "id long") \
        .write.mode("overwrite").format("noop").save()

    # three full passes over the list, per-query min across passes: JIT
    # warm-up and host-slow windows (microVM steal drifts 2-3x over
    # minutes — a whole pass can land in one) then can't hit the same
    # query in every sample
    times: dict[str, float] = {}
    for _pass in range(3):
        for name in HEADLINE:
            fn = catalog[name]
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            if name not in times or dt < times[name]:
                times[name] = dt
    times = {k: round(v, 3) for k, v in times.items()}

    # extraction throughput (flagship kernel) — production shape: read
    # a materialized turns table, extract; one warm-up run discarded
    import tempfile

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from pdf_parser_spark.operators.extraction import extract_turns
    from pdf_parser_spark.sources.turns import synthetic_turns

    # input materialized into cpus*2 splits; extraction reads them
    # directly — no repartition (a forced shuffle of the PDF payloads
    # measured 2x the extraction itself; production tables arrive in
    # thousands of splits, and salting stays opt-in for skew)
    data_dir = tempfile.mkdtemp(prefix="bench-turns-") + "/turns"
    synthetic_turns(spark, n_convs, partitions=cpus * 2) \
        .write.mode("overwrite").parquet(data_dir)
    turns = spark.read.parquet(data_dir)
    force(extract_turns(turns))  # warm-up
    obs = Observation("bench")
    ext = extract_turns(turns).observe(
        obs, F.count(F.lit(1)).alias("turns"),
        F.sum("bytes").alias("bytes"))
    t0 = time.perf_counter()
    force(ext)
    ext_sec = time.perf_counter() - t0
    m = dict(obs.get)
    times["pdf_extract"] = round(ext_sec, 3)
    extract = {
        "turns": int(m["turns"]),
        "mb": round(m["bytes"] / 1e6, 2),
        "sec": round(ext_sec, 3),
        "turns_per_sec": round(m["turns"] / ext_sec, 1),
        "mb_per_sec": round(m["bytes"] / 1e6 / ext_sec, 2),
        "n_convs": n_convs,
        "cpus": cpus,
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_plus_pdf_extract_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extract": extract,
    }))


if __name__ == "__main__":
    main()

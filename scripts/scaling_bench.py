"""Two-parallelism scaling evidence (BASELINE.md protocol).

The north_rule's ≥0.8 scaling-efficiency criterion from N to 4N
executors can't use a real cluster in this sandbox; per BASELINE.md the
proxy is the same extraction job at local[4] vs local[16] on identical
input. Spark can't change master within one JVM, so each measurement
runs in its own subprocess (``--cpus``); the default (no args) mode
orchestrates both and prints the combined JSON.

Usage:
  python scripts/scaling_bench.py                  # full report
  python scripts/scaling_bench.py --cpus 8 --convs 40000   # one level
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fixed task granularity at both levels: same split plan, both levels
# get many task waves (granularity must not favor either side)
PARTITIONS = 256
WARMUP_CONVS = 500


def measure(cpus: int, n_convs: int) -> dict:
    """Extraction throughput over a MATERIALIZED turns table (the
    production shape: read stored transcripts → extract), best of 2
    runs after one full-size warm-up run (JIT + codegen + python-worker
    pool dominate the first run and would otherwise bias whichever
    level runs first). The orchestrator interleaves levels and keeps
    the per-level best across rounds."""
    import tempfile

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from pdf_parser_spark.operators.extraction import extract_turns
    from pdf_parser_spark.session import get_spark
    from pdf_parser_spark.sources.turns import synthetic_turns

    spark = get_spark(f"scaling-{cpus}", cpus=cpus,
                      shuffle_partitions=cpus)

    tmp = tempfile.mkdtemp(prefix=f"scaling-turns-{cpus}-")
    data_dir = f"{tmp}/turns"
    # input written as PARTITIONS splits -> both levels read the
    # identical split plan directly, no shuffle in the measured job
    # (the production shape; a forced repartition of the PDF payloads
    # costs as much as the extraction itself)
    synthetic_turns(spark, n_convs, partitions=PARTITIONS) \
        .write.mode("overwrite").parquet(data_dir)
    turns = spark.read.parquet(data_dir)

    def run() -> tuple[float, dict]:
        obs = Observation()
        ext = extract_turns(turns).observe(
            obs, F.count(F.lit(1)).alias("turns"),
            F.sum("bytes").alias("bytes"))
        t0 = time.perf_counter()
        ext.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0, dict(obs.get)

    run()  # full-size warm-up, discarded
    samples = [run() for _ in range(2)]
    # best sample: we are measuring capability at each parallelism
    # level; microVM noise (steal time, host GC) only ever adds time
    sec = min(s for s, _ in samples)
    m = samples[0][1]
    spark.stop()
    return {
        "cpus": cpus,
        "n_convs": n_convs,
        "turns": int(m["turns"]),
        "mb": round(m["bytes"] / 1e6, 2),
        "sec": round(sec, 2),
        "secs_all": [round(s, 2) for s, _ in samples],
        "turns_per_sec": round(m["turns"] / sec, 1),
        "mb_per_sec": round(m["bytes"] / 1e6 / sec, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--convs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SCALE_CONVS",
                                               "30000")))
    args = ap.parse_args()

    if args.cpus is not None:
        print(json.dumps(measure(args.cpus, args.convs)))
        return

    results: dict[int, dict] = {}
    # N=4 vs 4N=16 on the 32-core box: both levels keep idle headroom,
    # so the comparison isolates the software's scaling from single-
    # machine physics (all-core turbo drop + shared L3) that a real 4N-
    # EXECUTOR cluster would not have. The 8-vs-32 numbers are also
    # reported in BASELINE.md with that caveat.
    #
    # Levels are INTERLEAVED (4,16,4,16,...) because the sandbox host's
    # absolute speed drifts ~2x over minutes (steal time); interleaving
    # exposes both levels to the same drift, and best-per-level compares
    # like with like.
    for cpus in (4, 16, 4, 16, 4, 16):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cpus", str(cpus), "--convs", str(args.convs)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if cpus not in results or r["sec"] < results[cpus]["sec"]:
            prev = results.get(cpus)
            r["secs_all"] = (prev["secs_all"] if prev else []) + r["secs_all"]
            results[cpus] = r
        else:
            results[cpus]["secs_all"] += r["secs_all"]

    n, n4 = results[4], results[16]
    eff = (n4["turns_per_sec"] / n["turns_per_sec"]) / (16 / 4)
    print(json.dumps({
        "protocol": "same input, local[4] vs local[16], 256 fixed "
                    "partitions, warmed sessions, separate JVMs, "
                    "best of 3 interleaved rounds x 2 runs after warm-up",
        "n": n, "4n": n4,
        "speedup": round(n4["turns_per_sec"] / n["turns_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "criterion": "efficiency >= 0.8 (north_rule)",
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()

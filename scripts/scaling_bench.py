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
    samples = [run() for _ in range(3)]
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


def hardware_ceiling(n: int, n4: int, dur: float = 5.0) -> dict:
    """Calibrate the MACHINE's own N->4N ceiling with a pure-Python
    busy loop (no Spark, no I/O): per-process iteration rate at n vs
    n4 concurrent processes. On a single box the 4N level runs each
    core slower (all-core turbo droop + SMT sibling sharing + host
    steal under load), so even PERFECT software cannot exceed
    ceiling = 4 * rate(n4) / rate(n) / 4 = rate(n4)/rate(n). A real
    4N-EXECUTOR cluster (4x machines, same per-core clocks) has
    ceiling ~1.0 — this calibration separates the software's scaling
    from single-machine physics."""
    import multiprocessing as mp

    def burn(q, d):
        t0 = time.perf_counter()
        x = 0
        while time.perf_counter() - t0 < d:
            for _ in range(10000):
                x += 1
        q.put(x)

    rates = {}
    for nproc in (n, n4):
        q = mp.Queue()
        procs = [mp.Process(target=burn, args=(q, dur))
                 for _ in range(nproc)]
        for p in procs:
            p.start()
        # Bounded get: if a child dies before reporting (fork failure
        # under memory pressure), fail loudly instead of hanging the
        # whole scaling run on an empty queue.
        try:
            tots = [q.get(timeout=dur * 10 + 30) for _ in procs]
        except Exception as e:
            for p in procs:
                p.terminate()
            raise RuntimeError(
                f"hardware_ceiling: busy-loop child never reported "
                f"at nproc={nproc} ({e!r})") from e
        for p in procs:
            p.join()
        rates[nproc] = sum(tots) / len(tots) / dur
    return {"per_core_rate_n": round(rates[n] / 1e6, 1),
            "per_core_rate_4n": round(rates[n4] / 1e6, 1),
            "ceiling": round(rates[n4] / rates[n], 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--convs", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SCALE_CONVS",
                                               "30000")))
    ap.add_argument("--levels", type=str, default="4,16",
                    help="N,4N parallelism pair (default 4,16; use 2,8 "
                         "when the host shows heavy contention — both "
                         "levels must keep idle headroom)")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    if args.cpus is not None:
        print(json.dumps(measure(args.cpus, args.convs)))
        return

    lo, hi = (int(x) for x in args.levels.split(","))
    results: dict[int, dict] = {}
    # N vs 4N on the 32-core box: both levels keep idle headroom, so
    # the comparison isolates the software's scaling from single-
    # machine physics (all-core turbo drop, SMT sibling sharing,
    # shared L3, host steal under load) that a real 4N-EXECUTOR
    # cluster would not have. hardware_ceiling() measures that
    # physics directly and is reported alongside.
    #
    # Levels are INTERLEAVED (N,4N,N,4N,...) because the sandbox
    # host's absolute speed drifts 2-3x over minutes (steal time);
    # interleaving exposes both levels to the same drift, and
    # best-per-level compares like with like. --rounds interleaved
    # rounds x 3 measured runs each: steal windows last whole
    # minutes — enough samples that each level hits a quiet window.
    for cpus in (lo, hi) * args.rounds:
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

    n, n4 = results[lo], results[hi]
    eff = (n4["turns_per_sec"] / n["turns_per_sec"]) / (hi / lo)
    ceil = hardware_ceiling(lo, hi)
    print(json.dumps({
        "protocol": f"same input, local[{lo}] vs local[{hi}], 256 "
                    "fixed partitions, warmed sessions, separate JVMs, "
                    f"best of {args.rounds} interleaved rounds x 3 "
                    "runs after warm-up",
        "n": n, "4n": n4,
        "speedup": round(n4["turns_per_sec"] / n["turns_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling": ceil,
        "efficiency_vs_ceiling": round(eff / ceil["ceiling"], 3),
        "criterion": "efficiency >= 0.8 (north_rule)",
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()

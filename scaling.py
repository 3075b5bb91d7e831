#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the identical
flagship job at two parallelism levels (local[N] and local[4N]) on the
same input; report throughput at both + efficiency = (thr_4N/thr_N)/4.

Measurement protocol (this sandbox is a shared host with heavy,
minute-scale CPU-steal noise — single runs swing 4×; generated-code
JIT needs ~2 full passes to reach steady state):
* one JVM per level, taskset-pinned to exactly N CPUs; 3 warmup passes,
  then 5 measured passes
* the reported figure per level is the MINIMUM over measured passes —
  the least-contended steady-state estimate; all samples recorded

Usage:  python scaling.py [--n-seq 10000000] [--base-cores 8]
Writes BENCH_SCALING.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
import pyspark.sql.functions as F
from loggie_spark.session import get_spark
from loggie_spark.datagen import generate_sequences
from loggie_spark.examples import reference_pipeline
from loggie_spark.pipeline import Pipeline
from loggie_spark.sinks.metrics import sink_metrics

cpus = int(sys.argv[1]); n = int(sys.argv[2]); path = sys.argv[3]
warmups = int(sys.argv[4]); passes = int(sys.argv[5])
job = sys.argv[6] if len(sys.argv) > 6 else "flagship"
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
import os
if not os.path.isdir(path):
    generate_sequences(spark, n, partitions=64).write.mode("overwrite").parquet(path)

if job == "raw":
    # Zero-parse ingest: in-task pyarrow read+decode -> one-sink route
    # -> exact counts (the reference-210-MiB/s-comparable job).
    from loggie_spark.pipeline import PipelineConfig, SourceSpec
    from loggie_spark.sinks.router import SinkSpec
    from loggie_spark.sources.arrow_reader import read_sequences_arrow

    cfg = PipelineConfig(name="raw", sources=[SourceSpec("all")],
                         sinks=[SinkSpec("kafka", "${source}")], keep_tokens=False)
    pipe = Pipeline(cfg)

    def once():
        t0 = time.monotonic()
        seq = read_sequences_arrow(spark, path, parallelism=cpus)
        rows = sink_metrics(pipe.transform(seq), cfg.name).collect()
        assert rows
        return time.monotonic() - t0
else:
    cfg = reference_pipeline(time_col_name="_ptime")
    pipe = Pipeline(cfg)

    def once():
        t0 = time.monotonic()
        seq = spark.read.parquet(path).withColumn(
            "_ptime", F.lit("2024-03-01 00:00:00").cast("timestamp"))
        routed = pipe.transform(seq)
        rows = sink_metrics(routed, cfg.name).collect()
        assert rows
        return time.monotonic() - t0

# Generated-code JIT needs ~2 full passes to reach steady state
# (observed: 92s -> 61s -> 22s on identical input); 3 warmups, then
# every measured run is steady.
for _ in range(warmups):
    once()
times = [round(once(), 3) for _ in range(passes)]
print(json.dumps({"cpus": cpus, "sec": times}))
spark.stop()
"""


def run_round(cpus: int, n: int, path: str, warmups: int = 3, passes: int = 5, job: str = "flagship") -> float:
    # Pin the whole process tree (JVM task threads, GC/JIT threads,
    # python workers) to exactly `cpus` CPUs — otherwise the "N-core"
    # level borrows idle cores for GC and Arrow workers and the
    # baseline throughput is overstated (unfair 4N comparison; a real
    # N-core executor has no spare cores to borrow).
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", WORKER,
         str(cpus), str(n), path, str(warmups), str(passes), job],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed at {cpus} cores:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])["sec"]  # list of measured secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seq", type=int, default=10_000_000)
    ap.add_argument("--base-cores", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--warmups", type=int, default=3)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--job", choices=["flagship", "raw"], default="flagship")
    args = ap.parse_args()

    path = f"/tmp/loggie_bench_seq_{args.n_seq}"
    lo_times = run_round(args.base_cores, args.n_seq, path, args.warmups, args.passes, args.job)
    print(f"{args.base_cores}c: {lo_times}", file=sys.stderr)
    hi_times = run_round(args.base_cores * 4, args.n_seq, path, args.warmups, args.passes, args.job)
    print(f"{args.base_cores * 4}c: {hi_times}", file=sys.stderr)

    lo, hi = min(lo_times), min(hi_times)
    thr_lo, thr_hi = args.n_seq / lo, args.n_seq / hi
    result = {
        "job": ("raw ingest: pyarrow in-task read+decode -> route -> exact counts" if args.job == "raw" else "flagship parse->enrich->route->aggregate"),
        "n_seq": args.n_seq,
        "protocol": f"one JVM per level, {args.warmups} JIT-warmup passes + {args.passes} measured; min over passes (shared host with minute-scale CPU-steal noise)",
        "levels": [
            {
                "cpus": args.base_cores,
                "best_sec": lo,
                "all_sec": lo_times,
                "seq_per_sec": round(thr_lo, 1),
            },
            {
                "cpus": args.base_cores * 4,
                "best_sec": hi,
                "all_sec": hi_times,
                "seq_per_sec": round(thr_hi, 1),
            },
        ],
        "scaling_efficiency_N_to_4N": round((thr_hi / thr_lo) / 4.0, 3),
    }
    print(json.dumps(result, indent=2))
    suffix = "_RAW" if args.job == "raw" else ""
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), f"BENCH_SCALING{suffix}.json")
    # MERGE into the evidence file: earlier rounds' pairs (and their
    # stage-isolation / control-experiment sections) must survive a
    # re-run — append this measurement to `pairs` instead of clobbering.
    existing: dict = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                existing = json.load(f)
        except (OSError, json.JSONDecodeError):
            existing = {}
    pair = {k: result[k] for k in ("n_seq", "levels", "scaling_efficiency_N_to_4N")}
    if "pairs" in existing:
        existing["pairs"].append(pair)
        existing["scaling_efficiency_N_to_4N"] = result["scaling_efficiency_N_to_4N"]
        result = existing
    else:
        # First write (or corrupt/absent file): emit the pairs-list
        # format from the start so the NEXT run appends instead of
        # clobbering this measurement.
        result = {**result, "pairs": [pair]}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Flagship-throughput reconciliation harness (driver protocol).

The r04 driver bench sampled the flagship at 260k seq/s vs 446k in r03
with NO parse-path code change — every side signal (raw ingest FASTER
in the same run, same-day clean passes at 436k) says host-noise window,
but the repo's evidence bar (set by the grok r3 and simhash r4
reconciliations) is a RECORDED interleaved A/B under the driver
protocol. This harness produces it:

- each SAMPLE is a FRESH JVM (subprocess) running exactly bench.py's
  flagship measurement (2 warm passes, min of 4 timed) at
  sf-equivalent N_SEQ on local[CPUS] — the driver protocol;
- interleaved with each flagship sample, the same JVM times a fixed
  CPU-bound CONTROL job (xxhash64 fold over range(2e8), no IO, no
  Python) — host-health thermometer: a slow control marks a stolen-CPU
  window, independent of any repo code;
- samples spread over minutes (the observed noise granularity).

Usage: python flagship_ab.py [n_samples]    # default 5
Prints one JSON line per sample and a summary; paste into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, os, time
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
CPUS = int(os.environ["SPARK_GRAFT_CPUS"])
import bench
from loggie_spark.session import get_spark

spark = get_spark(app_name="flagship-ab", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).selectExpr("sum(id)").collect()

# control BEFORE and AFTER the flagship so a noise window overlapping
# either edge of the measurement is visible
def control() -> float:
    t0 = time.monotonic()
    # bit_xor, not sum: ANSI mode overflows a long sum of 64-bit hashes
    spark.range(200_000_000).selectExpr("bit_xor(xxhash64(id))").collect()
    return time.monotonic() - t0

control()  # JIT warm for the control itself
c_before = control()
elapsed, rows = bench.flagship_elapsed(spark)
c_after = control()
print("SAMPLE " + json.dumps({
    "flagship_sec": round(elapsed, 3),
    "seq_per_sec": round(rows / elapsed, 1),
    "control_before_sec": round(c_before, 3),
    "control_after_sec": round(c_after, 3),
}))
spark.stop()
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    samples = []
    for i in range(n):
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=1800,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("SAMPLE ")]
        if not line:
            print(json.dumps({"sample": i, "error": proc.stderr[-2000:]}))
            continue
        s = json.loads(line[-1][len("SAMPLE "):])
        s["sample"] = i
        s["wall_sec"] = round(time.monotonic() - t0, 1)
        samples.append(s)
        print(json.dumps(s), flush=True)
    if samples:
        best = max(s["seq_per_sec"] for s in samples)
        print(json.dumps({
            "summary": {
                "n": len(samples),
                "best_seq_per_sec": best,
                "median_seq_per_sec": sorted(
                    s["seq_per_sec"] for s in samples
                )[len(samples) // 2],
                "min_control_sec": min(
                    min(s["control_before_sec"], s["control_after_sec"])
                    for s in samples
                ),
            }
        }))


if __name__ == "__main__":
    main()

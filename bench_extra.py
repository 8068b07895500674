"""Extra benchmarks for optimization work (NOT the driver's harness —
bench.py is frozen for measurement; this file exists so per-query
isolation numbers cited in OPTIMIZATION_r06.md are reproducible).

Per guide §1.4: each query is materialized through the noop sink
(every column of every row computed, nothing optimized away by a
count-only plan, no output cost), after one warmup pass at a DIFFERENT
sf dir so process/JIT startup stays out of the timers. Jobs are
labeled for the UI.

Usage:
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
        python bench_extra.py q1,q2,... [repeats]

Prints one JSON line: {"queries": {name: [sec, ...]}, "sf": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WARM_DIR = os.environ.get("FLAME_BENCH_WARM_DIR", "/root/testdata/sf0.001")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from flame_spark.queries import QUERIES
    from flame_spark.session import get_spark

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else []
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("FATAL")
    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup {name}")
        try:
            noop(QUERIES[name](spark, WARM_DIR))
        except Exception as exc:
            print(f"  warmup {name} skipped: {exc}", file=sys.stderr)
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"timed {name} #{i}")
            t0 = time.perf_counter()
            noop(QUERIES[name](spark, SF_DIR))
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(f"  {name}: {samples}", file=sys.stderr)
    print(
        json.dumps(
            {
                "queries": out,
                "sf": SF_DIR,
                "cpus": CPUS,
                "load_1m": round(os.getloadavg()[0], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness: run every registered query at a scale factor and
print ONE JSON line the driver records as BENCH_r{N}.json.

Usage:  python bench.py            # $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1

Execution is forced through the noop sink (full JVM-side materialisation
of every partition, no Arrow/driver transfer), so timings measure the
engine's plans, not result serialisation. Tables are read through the
normal io.load path — no caching — so every query's timing includes its
parquet scan, the same way the driver would run it cold.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uchr_scetl_spark import get_session, load_registry  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    only = set(sys.argv[2:])

    registry = load_registry()
    spark = get_session("uchr-bench")
    # JVM/session warmup on a trivial plan so the first measured query
    # doesn't absorb one-time codegen/classloading costs.
    force(spark.range(1000).selectExpr("sum(id) AS s"))

    timings: dict[str, float] = {}
    total = 0.0
    for key, spec in sorted(registry.items()):
        if only and key not in only:
            continue
        t0 = time.perf_counter()
        try:
            force(spec.fn(spark, sf_dir))
        except Exception as exc:  # record the failure, keep benching
            print(f"# BENCH ERROR {key}: {exc!r}", file=sys.stderr)
            timings[key] = -1.0
            continue
        dt = round(time.perf_counter() - t0, 3)
        timings[key] = dt
        total += dt
        print(f"# {key}: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

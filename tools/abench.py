"""A/B timing harness: run the named registry keys R times each inside
ONE warmed session and print per-rep wall times plus min/median.

Unlike bench.py (cold, one shot per key — matches how the driver runs),
this exists to separate plan cost from machine noise when iterating on
a single operator: the min over reps is stable under background load,
and back-to-back reps in one process share identical JVM/codegen state.
Keys whose cost lives in a per-session memo (dedup_* caches) are only
meaningfully measured on rep 1 — later reps hit the memo; interpret
accordingly (or use bench.py for those).

Usage: python tools/abench.py [-r REPS] [sf_dir] key [key ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uchr_scetl_spark import get_session, load_registry  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args[0]
        args = args[1:]
    keys = args
    registry = load_registry()
    spark = get_session("uchr-abench")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    for key in keys:
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            registry[key].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        reps_s = " ".join(f"{t:6.2f}" for t in times)
        print(
            f"{key:30s} min={min(times):6.2f} med={statistics.median(times):6.2f}"
            f"  reps: {reps_s}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

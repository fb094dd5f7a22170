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
    argv = [a for a in sys.argv[1:] if a != "--full-only"]
    # --full-only: print just the full per-key JSON line (for
    # BENCH_LOCAL.json, which tools parse as a single JSON document);
    # without it, a compact summary line brackets the full line so the
    # driver's 2000-char tail capture always holds a complete record
    full_only = "--full-only" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if argv:
        sf_dir = argv[0]
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    only = set(argv[1:])

    registry = load_registry()
    spark = get_session("uchr-bench")
    # JVM/session warmup so the first measured queries don't absorb
    # one-time costs that a long-running cluster pays exactly once:
    # janino compilation of whole-stage-codegen frames, Parquet
    # vectorized-reader classloading, shuffle/sort/join operator
    # classes, and the Arrow python-worker pool.  The warmup runs a
    # compound plan over the tiny sf0.001 corpus (never the measured
    # sf_dir) exercising scan → filter → join → hash agg → window →
    # sort and one pandas-UDF batch.
    force(spark.range(1000).selectExpr("sum(id) AS s"))
    try:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        warm_dir = "/root/testdata/sf0.001"
        li = spark.read.parquet(f"{warm_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{warm_dir}/orders.parquet")
        j = li.where(F.col("l_quantity") > 0).join(
            o, li.l_orderkey == o.o_orderkey
        )
        agg = j.groupBy("l_returnflag").agg(
            F.sum("l_extendedprice").alias("s"),
            F.countDistinct("l_partkey").alias("d"),
            F.approx_count_distinct("l_suppkey").alias("a"),
        )
        force(agg.withColumn("r", F.row_number().over(
            Window.orderBy(F.col("s").desc()))).orderBy("r"))
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import pandas_udf

        # NOTE: no type hints here — string annotations resolve against
        # module globals, and `pd` is local to main(), which makes
        # pandas_udf raise PySparkNotImplementedError
        @pandas_udf("double")
        def _warm(v):
            return v * 1.0

        force(li.select(_warm(F.col("l_quantity")).alias("w")))

        # the other Python-execution shapes the engine uses: an
        # array-typed scalar pandas UDF (SimHash packing) and a
        # grouped-map applyInPandas (matmul pruners) — each spins its
        # own worker/serializer path the first time it runs
        @pandas_udf("array<long>")
        def _warm_arr(v):
            return v

        emb = spark.read.parquet(f"{warm_dir}/embeddings.parquet")
        force(
            emb.select(
                _warm_arr(F.expr("transform(embedding, x -> 1L)")).alias("w")
            )
        )

        def _warm_grouped(pdf):
            return pdf

        force(
            emb.select("label", "vec_id")
            .groupBy("label")
            .applyInPandas(_warm_grouped, "label int, vec_id long")
        )
        # iterative ops: localCheckpoint path (first use starts the
        # block-manager cleanup machinery)
        spark.range(10).localCheckpoint().count()

        # Python DataSource worker pool (a separate worker path from
        # pandas UDFs): register + read a 100-row throwaway source
        from pyspark.sql.datasource import DataSource, DataSourceReader

        class _WarmReader(DataSourceReader):
            def read(self, partition):
                for i in range(100):
                    yield (i,)

        class _WarmSource(DataSource):
            @classmethod
            def name(cls):
                return "uchr_bench_warm"

            def schema(self):
                return "i bigint"

            def reader(self, schema):
                return _WarmReader()

        spark.dataSource.register(_WarmSource)
        force(spark.read.format("uchr_bench_warm").load())
    except Exception as exc:  # warmup must never fail the bench
        print(f"# BENCH WARMUP SKIPPED: {exc!r}", file=sys.stderr)

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

    # Driver-capture shape (round-11 verdict #6): the driver keeps only
    # the LAST 2000 chars of stdout, so the ~10 KB full per-key JSON
    # always truncates mid-map and its artifact "parsed" field has been
    # null every round. Print a compact self-contained summary line
    # FIRST (per the verdict's prescription, covers any head capture)
    # and again LAST (guaranteed inside the 2000-char tail) around the
    # unchanged full JSON line; the committed BENCH_LOCAL.json remains
    # the full-map record.
    ok = {k: v for k, v in timings.items() if v >= 0}
    summary = json.dumps(
        {
            "metric": "total_query_wall_seconds",
            "value": round(total, 3),
            "unit": "sec",
            "sf": sf,
            "n_keys": len(timings),
            "n_errors": len(timings) - len(ok),
            "slowest": {
                k: ok[k]
                for k in sorted(ok, key=ok.get, reverse=True)[:10]
            },
            "summary": True,
        }
    )
    if not full_only:
        print(summary)
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
    if not full_only:
        # Round-15 verdict item 1: the driver keeps only the LAST 2000
        # chars of stdout, so the full 309-key map above always
        # truncates and PERF per_query / scaling came back empty every
        # round.  The FINAL line is a compact summary carrying per-key
        # seconds for exactly the driver's oracle sample (the 50
        # alphabetically-first registry keys, 2 decimals — ~1.5 KB,
        # fits the tail) so the driver's per-query comparison and the
        # low-core scaling ratios populate.  `value` stays the total
        # over ALL keys; the full map line above is unchanged and
        # remains the committed BENCH_LOCAL.json record.
        sample = sorted(registry)[:50]
        print(
            json.dumps(
                {
                    "metric": "total_query_wall_seconds",
                    "value": round(total, 3),
                    "unit": "sec",
                    "sf": sf,
                    "n_keys": len(timings),
                    "n_errors": len(timings) - len(ok),
                    "queries": {
                        k: round(timings[k], 2)
                        for k in sample
                        if k in timings
                    },
                    "summary": True,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

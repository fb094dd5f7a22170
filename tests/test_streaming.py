"""Structured Streaming tests (§2.10): each streaming mirror must agree
with its oracle-checked batch twin when fed the same events, and the
watermark must actually drop late data. All synchronous
(processAllAvailable + memory sink), single event directory."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from uchr_scetl_spark.io import load
from uchr_scetl_spark.streaming import batch as B
from uchr_scetl_spark.streaming.streams import (
    EVENTS_STREAM_SCHEMA,
    dedup_stream,
    read_events_stream,
    run_to_memory,
    session_windows_stream,
    tumbling_counts_stream,
    user_locf_state_stream,
    user_running_state_stream,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark):
    """events table re-written as a multi-file parquet dir (a realistic
    file-stream source: several files → several micro-batches)."""
    out = tempfile.mkdtemp(prefix="uchr_stream_src_")
    (
        load(spark, SF_SMOKE, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_tumbling_counts_matches_batch(spark, events_dir):
    stream = tumbling_counts_stream(
        read_events_stream(spark, events_dir, max_files_per_trigger=1)
    )
    run_to_memory(stream, "t_tumbling", output_mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("t_tumbling").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in B.stream_tumbling_counts(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_session_windows_stream_runs(spark, events_dir):
    stream = session_windows_stream(
        read_events_stream(spark, events_dir)
    )
    run_to_memory(stream, "t_sessions", output_mode="complete")
    rows = spark.table("t_sessions").collect()
    assert len(rows) > 0
    # session bounds are ordered and event counts positive
    assert all(r.session_start <= r.session_end and r.n_events > 0 for r in rows)


def test_dedup_stream_drops_duplicates(spark, events_dir):
    # feed the SAME directory twice worth of rows by unioning two reads
    # is not possible in one file stream; instead duplicate files:
    dup_dir = tempfile.mkdtemp(prefix="uchr_stream_dup_")
    src = spark.read.parquet(events_dir)
    src.unionByName(src).repartition(3).write.mode("overwrite").parquet(dup_dir)
    try:
        stream = dedup_stream(read_events_stream(spark, dup_dir))
        run_to_memory(stream, "t_dedup", output_mode="append")
        n_distinct = src.select("event_id").distinct().count()
        got = spark.table("t_dedup").select("event_id").distinct().count()
        total = spark.table("t_dedup").count()
        assert got == n_distinct
        # every id exactly once (dup tracking within watermark horizon)
        assert total == n_distinct
    finally:
        shutil.rmtree(dup_dir, ignore_errors=True)


def test_user_running_state(spark, events_dir):
    stream = user_running_state_stream(
        read_events_stream(spark, events_dir)
    )
    run_to_memory(stream, "t_state", output_mode="update")
    # last update per user must equal the batch per-user totals
    final = (
        spark.table("t_state")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    want = (
        spark.read.parquet(events_dir).groupBy("user_id").count()
    )
    got = {r.user_id: r.n_events for r in final.collect()}
    expect = {r.user_id: r["count"] for r in want.collect()}
    assert got == expect


def test_watermark_drops_late_rows(spark):
    """Two micro-batches: batch 1 advances the watermark far ahead;
    batch 2's stale row falls behind the watermark and must be dropped
    from an append-mode windowed aggregation."""
    src = tempfile.mkdtemp(prefix="uchr_late_src_")
    ckpt = tempfile.mkdtemp(prefix="uchr_late_ckpt_")

    def write_batch(rows, path):
        spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    on_time = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=3), 1, "click", 1.0, "{}"),
    ]
    late = [(3, t0 + dt.timedelta(minutes=30), 1, "click", 1.0, "{}")]

    write_batch(on_time, f"{src}/b1")
    stream = tumbling_counts_stream(
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a row 2.5h older than the max event time seen (3h),
        # beyond the 10-minute watermark and its window already closed
        write_batch(late, f"{src}/b2")
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)

    emitted = spark.table("t_late").collect()
    # append mode emits only closed windows; the late row's 00:00 window
    # closed when the watermark passed 00:10 + 1h — its count must NOT
    # include event_id 3
    counts = {r.window_start: r.n_events for r in emitted}
    assert counts.get(t0) == 1, f"late row leaked into closed window: {counts}"


def test_enrich_static_stream_matches_batch(spark, events_dir):
    from uchr_scetl_spark.io import load
    from uchr_scetl_spark.streaming.streams import enrich_static_stream

    customer = load(spark, SF_SMOKE, "customer")
    stream = enrich_static_stream(
        read_events_stream(spark, events_dir, max_files_per_trigger=2), customer
    )
    run_to_memory(stream, "t_enrich", output_mode="complete")
    got = {
        (r.window_start, r.c_mktsegment): r.n_events
        for r in spark.table("t_enrich").collect()
    }
    want = {
        (r.window_start, r.c_mktsegment): r.n_events
        for r in (
            spark.read.parquet(events_dir)
            .join(customer, F.col("user_id") == F.col("c_custkey"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "c_mktsegment", "n_events")
        ).collect()
    }
    assert got == want


def test_interval_join_stream_matches_batch(spark, events_dir):
    from uchr_scetl_spark.streaming.streams import interval_join_stream

    ev = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    stream = interval_join_stream(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
    )
    run_to_memory(stream, "t_ivjoin", output_mode="append")
    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.table("t_ivjoin").collect()
    }
    src = spark.read.parquet(events_dir)
    v = src.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = src.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in v.join(
            p,
            (F.col("v_user_id") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        ).collect()
    }
    assert got == want


def test_foreach_batch_idempotent_parquet_sink(spark, events_dir):
    """foreachBatch → parquet, the streaming-ETL load pattern: each
    micro-batch overwrites its own batch_id partition (dynamic
    partition overwrite), so a retried batch rewrites the same
    partition instead of duplicating rows — exactly-once at the sink
    without a transactional table format."""
    out = tempfile.mkdtemp(prefix="uchr_febatch_out_")
    shutil.rmtree(out, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix="uchr_febatch_ckpt_")

    def write_batch(df, batch_id: int):
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("batch_id")
            .parquet(out)
        )

    q = (
        read_events_stream(spark, events_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    try:
        written = spark.read.parquet(out)
        src_n = spark.read.parquet(events_dir).count()
        assert written.count() == src_n
        # several micro-batches actually happened (one per file)
        assert written.select("batch_id").distinct().count() > 1
        # re-writing batch 0's partition with the same data must not
        # change the total (idempotence of the per-partition overwrite)
        b0 = written.where(F.col("batch_id") == 0).drop("batch_id")
        write_batch(b0, 0)
        assert spark.read.parquet(out).count() == src_n
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_restart_resumes_from_checkpoint(spark):
    """Kill-and-restart recovery: a file-source → parquet-sink stream
    stopped after batch 1 and RESTARTED with the same checkpoint must
    process only the files that arrived while it was down — no row
    lost, no row duplicated (the checkpoint's source offsets + the
    file sink's transaction log together give exactly-once)."""
    src = tempfile.mkdtemp(prefix="uchr_restart_src_")
    out = tempfile.mkdtemp(prefix="uchr_restart_out_")
    ckpt = tempfile.mkdtemp(prefix="uchr_restart_ckpt_")
    shutil.rmtree(out, ignore_errors=True)

    base = load(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    a = base.where(F.col("event_id") % 2 == 0)
    b = base.where(F.col("event_id") % 2 == 1)

    def run_once():
        q = (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    try:
        a.coalesce(1).write.mode("append").parquet(src)
        run_once()
        n_phase1 = spark.read.parquet(out).count()
        assert n_phase1 == a.count()

        b.coalesce(1).write.mode("append").parquet(src)
        run_once()
        result = spark.read.parquet(out)
        assert result.count() == a.count() + b.count()
        # exactly-once: every event id appears exactly once
        assert (
            result.groupBy("event_id").count().where(F.col("count") > 1).count()
            == 0
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_complete_mode_replaces_result_table(spark, events_dir):
    """Complete output mode: every trigger re-emits the FULL result
    table (unlike append/update) — required for global aggregates a
    dashboard polls. The memory sink must hold exactly one row per
    event_type whose counts equal the batch aggregation."""
    agg = (
        read_events_stream(spark, events_dir)
        .groupBy("event_type")
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("uchr_complete_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = {
        r["event_type"]: r["count"]
        for r in spark.sql("SELECT * FROM uchr_complete_counts").collect()
    }
    want = {
        r["event_type"]: r["count"]
        for r in spark.read.parquet(events_dir)
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert got == want


def test_foreach_batch_sink_is_idempotent_under_redelivery(spark, tmp_path):
    """foreachBatch is at-least-once: after a failure the SAME
    (batch_df, batch_id) is delivered again. The idempotent sink must
    make the redelivery a no-op (exactly-once downstream), keep
    distinct batches separate, and expose its commit log. Driven both
    directly (simulated redelivery — the failure mode a live stream
    can't be forced to reproduce on demand) and through a real
    foreachBatch stream run."""
    import os

    from uchr_scetl_spark.streaming.streams import (
        committed_batches,
        idempotent_batch_sink,
        read_events_stream,
    )

    target = str(tmp_path / "sink")
    sink = idempotent_batch_sink(target)
    b0 = spark.range(5).selectExpr("id", "id * 2 AS v")
    sink(b0, 0)
    sink(b0, 0)  # redelivery of the same batch
    sink(spark.range(3).selectExpr("id + 100 AS id", "id AS v"), 1)
    assert committed_batches(spark, target) == [0, 1]
    back = spark.read.parquet(target)
    assert back.count() == 8  # 5 + 3, the redelivered 5 not doubled
    assert back.where("batch_id = 0").count() == 5

    # end-to-end: a real micro-batch stream through the same sink
    events_dir = str(tmp_path / "events")
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(200)
    ev.coalesce(1).write.mode("overwrite").parquet(events_dir)
    stream_target = str(tmp_path / "stream_sink")
    q = (
        read_events_stream(spark, events_dir)
        .writeStream.foreachBatch(idempotent_batch_sink(stream_target))
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in 120s"
    assert committed_batches(spark, stream_target)
    assert spark.read.parquet(stream_target).count() == 200


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Checkpoint recovery semantics: a restarted query resumes from
    its checkpoint and processes ONLY data that arrived since — no
    reprocessing (which would duplicate through a naive sink), no
    loss. Run 1 drains the first file, new files land, run 2 restarts
    with the SAME checkpoint; combined with the idempotent sink the
    readback must equal the full source exactly once."""
    import os

    from uchr_scetl_spark.streaming.streams import (
        committed_batches,
        idempotent_batch_sink,
        read_events_stream,
    )

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(300)
    first = ev.where("event_id % 3 = 0")
    rest = ev.where("event_id % 3 != 0")
    first.coalesce(1).write.mode("append").parquet(events_dir)

    sink_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            read_events_stream(spark, events_dir)
            .writeStream.foreachBatch(idempotent_batch_sink(sink_dir))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in 120s"

    run_once()
    n_first = spark.read.parquet(sink_dir).count()
    assert n_first == first.count()

    rest.coalesce(1).write.mode("append").parquet(events_dir)
    run_once()  # restart from the same checkpoint

    back = spark.read.parquet(sink_dir)
    assert back.count() == 300  # all rows exactly once, none re-run
    assert back.select("event_id").distinct().count() == 300
    assert len(committed_batches(spark, sink_dir)) >= 2


def _time_ordered_chunks(spark, tmp_path, n_chunks=3):
    """events split into n time-contiguous single-file chunks whose
    file mtimes follow event time, so a maxFilesPerTrigger=1 stream
    consumes them oldest-first and the watermark ADVANCES between
    micro-batches (the file source orders by modification time)."""
    import glob
    import os

    src_dir = str(tmp_path / "chunked_events")
    os.makedirs(src_dir)
    ev = load(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / n_chunks
    for i in range(n_chunks):
        start = lo + i * span
        end = hi if i == n_chunks - 1 else lo + (i + 1) * span
        cond = (F.col("ts") >= F.lit(start)) & (
            F.col("ts") <= F.lit(end) if i == n_chunks - 1 else F.col("ts") < F.lit(end)
        )
        stage = str(tmp_path / f"stage_{i}")
        ev.where(cond).coalesce(1).write.parquet(stage)
        (part,) = glob.glob(f"{stage}/part-*.parquet")
        dest = os.path.join(src_dir, f"chunk_{i:03d}.parquet")
        os.rename(part, dest)
        os.utime(dest, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return src_dir, ev.count()


def test_max_files_per_trigger_backpressure(spark, tmp_path):
    """maxFilesPerTrigger=1 must actually split the source into one
    bounded micro-batch per file — the backpressure dial that keeps a
    catch-up restart from loading a week of files into one giant
    batch. Measured from StreamingQueryProgress, not assumed."""
    from uchr_scetl_spark.streaming.streams import run_with_progress

    src_dir, total = _time_ordered_chunks(spark, tmp_path)
    stream = read_events_stream(spark, src_dir, max_files_per_trigger=1)
    progress = run_with_progress(
        stream.select("event_id", "ts", "event_type"), "t_backpressure"
    )
    fed = [p for p in progress if p["numInputRows"] > 0]
    assert len(fed) == 3  # one micro-batch per file, no coalescing
    assert all(p["numInputRows"] < total for p in fed)  # each batch bounded
    assert sum(p["numInputRows"] for p in fed) == total  # nothing lost
    assert spark.table("t_backpressure").count() == total


def test_windowed_state_bounded_by_watermark_eviction(spark, tmp_path):
    """The bounded-state claim, measured: feeding time-ordered chunks
    through a watermarked tumbling aggregation must show the state
    store EVICTING windows that fall behind the advancing watermark
    (numRowsRemoved > 0) and ending far below one-state-row-per-window
    (numRowsTotal << distinct windows) — the property that separates a
    pipeline that runs forever from one whose state grows without
    bound."""
    from uchr_scetl_spark.streaming.streams import run_with_progress

    src_dir, _ = _time_ordered_chunks(spark, tmp_path)
    stream = tumbling_counts_stream(
        read_events_stream(spark, src_dir, max_files_per_trigger=1)
    )
    progress = run_with_progress(stream, "t_state_metrics", output_mode="update")
    stateful = [p for p in progress if p["stateOperators"]]
    assert stateful, "no state operator metrics captured"
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in stateful)
    final_rows = stateful[-1]["stateOperators"][0]["numRowsTotal"]
    n_windows = (
        spark.table("t_state_metrics")
        .select("window_start", "event_type")
        .distinct()
        .count()
    )
    assert removed > 0  # watermark eviction actually ran
    # end-state is a fraction of the windows the stream produced: state
    # holds only windows the watermark hasn't closed yet
    assert final_rows < n_windows


def test_outer_interval_join_emits_null_completed_rows(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched views must emit with
    NULL purchase columns — but only after the watermark PROVES no
    match can arrive (watermark > view_ts + 1h window + 10m delay).
    The test drives that proof explicitly: first pass processes the
    real events (tail views stay withheld in state), then a flush
    batch with a far-future timestamp advances both watermarks and
    the withheld null-completed rows drain. The emitted sets must
    equal the batch twins exactly: matches = batch inner join,
    null-completed = batch left-anti."""
    import datetime as dt

    from uchr_scetl_spark.streaming.streams import (
        interval_join_stream_outer,
    )

    src_dir = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    base = load(spark, SF_SMOKE, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    base.repartition(2).write.mode("overwrite").parquet(src_dir)

    ev = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    stream = interval_join_stream_outer(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_outer_ivjoin")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    withheld_at_tail = spark.table("t_outer_ivjoin").where(
        F.col("purchase_id").isNull()
    ).count()

    # flush: one view + one purchase far past every real event, so
    # BOTH sides' watermarks jump and every withheld view completes
    max_ts = base.agg(F.max("ts")).collect()[0][0]
    flush_ts = max_ts + dt.timedelta(hours=3)
    spark.createDataFrame(
        [
            (10_000_001, flush_ts, -1, "view", 0.0, "{}"),
            (10_000_002, flush_ts, -1, "purchase", 0.0, "{}"),
        ],
        EVENTS_STREAM_SCHEMA,
    ).write.mode("append").parquet(src_dir)
    q.processAllAvailable()
    q.stop()

    got = spark.table("t_outer_ivjoin").where(F.col("view_user_id") >= 0)
    got_matched = {
        (r.view_user_id, r.view_id, r.purchase_id)
        for r in got.where(F.col("purchase_id").isNotNull()).collect()
    }
    got_null = {
        (r.view_user_id, r.view_id)
        for r in got.where(F.col("purchase_id").isNull()).collect()
    }

    src = spark.read.parquet(src_dir).where(F.col("user_id") >= 0)
    v = src.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = src.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    pred = (
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    want_matched = {
        (r.v_user_id, r.view_id, r.purchase_id)
        for r in v.join(p, pred).collect()
    }
    want_null = {
        (r.v_user_id, r.view_id)
        for r in v.join(p, pred, "left_anti").collect()
    }
    assert got_matched == want_matched
    assert got_null == want_null
    # the withheld set really was withheld before the flush proved it
    assert withheld_at_tail < len(want_null)


def test_user_locf_state_converges_to_batch_key(spark, events_dir):
    """The stateful LOCF carrier through multiple micro-batches must
    converge to exactly the values the registered batch key
    stream_locf_state computes over the same events — counts AND the
    struct-argmax carried value (the batch/stream parity contract of
    this module's docstring, applied to the round-10 key)."""
    stream = user_locf_state_stream(
        read_events_stream(spark, events_dir, max_files_per_trigger=1)
    )
    run_to_memory(stream, "t_locf", output_mode="update")
    final = (
        spark.table("t_locf")
        .groupBy("user_id")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("n_observed").alias("n_observed"),
            F.max_by("last_observed_value", "n_rows").alias(
                "last_observed_value"
            ),
        )
    )
    got = {
        r.user_id: (r.n_rows, r.n_observed, r.last_observed_value)
        for r in final.collect()
    }
    from uchr_scetl_spark import load_registry

    # events_dir is a re-layout of SF_SMOKE's events rows, so the
    # batch key over SF_SMOKE is the exact expected convergence
    want_rows = (
        load_registry()["stream_locf_state"].fn(spark, SF_SMOKE).collect()
    )
    expect = {
        r.user_id: (r.n_rows, r.n_observed, r.last_observed_value)
        for r in want_rows
    }
    assert got == expect


def test_stateful_restart_recovers_window_state(spark, tmp_path):
    """Checkpoint-RESTART recovery for a STATEFUL watermarked
    aggregation (round-12 axis, verdict task #4): the earlier restart
    tests prove source-offset recovery through STATELESS pass-through
    pipelines; this one kills a windowed aggregation mid-stream —
    with partially-counted windows and an advanced watermark living
    only in the state store — restarts it from the same checkpoint,
    and requires the final emitted result to equal the uninterrupted
    batch oracle.

    The cut is deliberately MID-WINDOW (a 55%% row split of the
    time-ordered stream, not aligned to any hour boundary), so the
    boundary window's count is partial at the stop: if the restarted
    query lost its state store, that window would finalize with only
    its post-restart rows; if it lost the watermark, earlier windows
    could re-open or late handling would change — either corrupts
    the count and fails the oracle equality. A far-future flush row
    after the restart pushes the watermark past every real window so
    the append-mode parquet sink (whose transaction log must also
    dedup across the restart) holds the complete finalized set."""
    import os

    from pyspark.sql import Window

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    ev = (
        load(spark, SF_SMOKE, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .orderBy("ts", "event_id")
    )
    rows = ev.count()
    cut = int(rows * 0.55)
    w = F.row_number().over(Window.orderBy("ts", "event_id"))
    numbered = ev.withColumn("rn", w)
    phase1 = numbered.where(F.col("rn") <= cut).drop("rn")
    phase2 = numbered.where(F.col("rn") > cut).drop("rn")

    # anti-vacuity: the cut row's window must receive rows in BOTH
    # phases (the partial state the restart has to recover). Derive
    # the boundary hours from the row numbers directly — head()/tail()
    # after a where/drop does not guarantee sort order survives.
    hour = F.date_trunc("hour", F.col("ts"))
    boundary_1 = {
        r[0] for r in numbered.where(F.col("rn") == cut).select(hour).collect()
    }
    boundary_2 = {
        r[0]
        for r in numbered.where(F.col("rn") == cut + 1).select(hour).collect()
    }
    assert boundary_1 == boundary_2, "cut landed on an hour boundary"

    def run_once():
        q = (
            tumbling_counts_stream(
                read_events_stream(spark, src, max_files_per_trigger=1)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in 180s"

    phase1.coalesce(2).write.mode("append").parquet(src)
    run_once()  # several micro-batches, then a clean mid-stream stop
    n_emitted_1 = spark.read.parquet(out).count()

    # restart input: the rest of the stream + a far-future flush row
    # that advances the watermark past every real window
    phase2.coalesce(2).write.mode("append").parquet(src)
    flush_ts = ev.agg(F.max("ts")).collect()[0][0] + dt.timedelta(days=10)
    spark.createDataFrame(
        [(999999999, flush_ts, 0, "__flush__", 0.0, None)],
        schema=phase1.schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart from the same checkpoint

    got_df = spark.read.parquet(out).where(F.col("event_type") != "__flush__")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in got_df.collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in B.stream_tumbling_counts(spark, SF_SMOKE).collect()
    }
    assert got == want
    # the restart finalized real work (run 1 alone held back at least
    # the boundary window), and nothing was emitted twice
    assert n_emitted_1 < len(want)
    assert got_df.count() == len(got)

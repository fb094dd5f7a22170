"""Unit tests for the as-of join algebra (SURVEY.md §4.3): window-edge
null handling, tie semantics (>=), multiple keys, empty right side."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from uchr_scetl_spark.operators.asof import asof_join


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_ties(spark):
    left = _mk(
        spark,
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (2, _ts("2024-01-01T09:00:00"), "c"),
        ],
        "k long, ts timestamp_ntz, tag string",
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01T10:00:00"), 10.0),
            (1, _ts("2024-01-01T11:00:00"), 11.0),
            (2, _ts("2024-01-01T09:30:00"), 9.5),
        ],
        "k long, ts timestamp_ntz, v double",
    )
    out = asof_join(left, right, on="k", ts="ts", payload=["v"])
    got = {(r.k, r.tag): r.v for r in out.collect()}
    # tie at 10:00 matches (>= semantics); 12:00 takes latest prior (11.0)
    assert got == {(1, "a"): 10.0, (1, "b"): 11.0, (2, "c"): None}


def test_asof_empty_right(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T10:00:00"), "a")],
               "k long, ts timestamp_ntz, tag string")
    right = _mk(spark, [], "k long, ts timestamp_ntz, v double")
    out = asof_join(left, right, on="k", ts="ts", payload=["v"]).collect()
    assert len(out) == 1 and out[0].v is None


def test_asof_preserves_left_rowcount(spark):
    left = _mk(
        spark,
        [(1, _ts("2024-01-01T10:00:00"), "a")] * 3,
        "k long, ts timestamp_ntz, tag string",
    )
    right = _mk(
        spark,
        [(1, _ts("2024-01-01T09:00:00"), 1.0)],
        "k long, ts timestamp_ntz, v double",
    )
    assert asof_join(left, right, on="k", ts="ts", payload=["v"]).count() == 3


def test_asof_null_payload_field_stays_atomic(spark):
    """A matched right row with a NULL payload FIELD must be carried
    whole: (id=20, value=NULL), never a stitched row mixing id=20 with
    an older row's value (the per-column last/first(ignoreNulls)
    formulation did exactly that)."""
    t = dt.datetime(2024, 1, 1)

    def at(m):
        return t + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [Row(k=1, ts=at(6), click=100)], "k long, ts timestamp, click long"
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=at(1), pid=10, pv=5.0),
            Row(k=1, ts=at(5), pid=20, pv=None),
        ],
        "k long, ts timestamp, pid long, pv double",
    )
    out = asof_join(
        left, right, on="k", ts="ts", payload=["pid", "pv"]
    ).collect()
    assert len(out) == 1
    assert out[0].pid == 20 and out[0].pv is None

    fwd_left = spark.createDataFrame(
        [Row(k=1, ts=at(0), click=100)], "k long, ts timestamp, click long"
    )
    fwd_right = spark.createDataFrame(
        [
            Row(k=1, ts=at(2), pid=30, pv=None),
            Row(k=1, ts=at(4), pid=40, pv=9.0),
        ],
        "k long, ts timestamp, pid long, pv double",
    )
    out = asof_join(
        fwd_left, fwd_right, on="k", ts="ts", payload=["pid", "pv"],
        direction="forward",
    ).collect()
    assert len(out) == 1
    assert out[0].pid == 30 and out[0].pv is None


def test_asof_null_keys_and_ts_never_match(spark):
    """SQL ASOF semantics on nullable inputs: NULL join keys / NULL
    timestamps match nothing — left rows survive with NULL payload,
    right rows with NULL key/ts are invisible. The naive window
    formulation would co-group NULL keys and hand a NULL-ts left row
    the earliest right row in the forward direction."""
    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            Row(k=1, ts=t, click=1),                 # normal row
            Row(k=None, ts=t, click=2),              # NULL key
            Row(k=1, ts=None, click=3),              # NULL ts
        ],
        "k long, ts timestamp, click long",
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=t - dt.timedelta(minutes=1), pid=10),
            Row(k=None, ts=t - dt.timedelta(minutes=1), pid=20),
            Row(k=1, ts=None, pid=30),
        ],
        "k long, ts timestamp, pid long",
    )
    for direction in ("backward", "forward"):
        d = -1 if direction == "backward" else 1
        rr = right.withColumn(
            "ts",
            F.when(F.col("pid") == 10, F.col("ts") + F.expr(
                f"INTERVAL {0 if d < 0 else 2} MINUTES"
            )).otherwise(F.col("ts")),
        )
        rows = asof_join(
            left, rr, on="k", ts="ts", payload=["pid"],
            direction=direction,
        ).collect()
        # rowcount BEFORE the dict collapse: a NULL-path regression
        # that duplicates a left row would be hidden by keying on click
        assert len(rows) == 3
        out = {r.click: r.pid for r in rows}
        assert out[1] == 10          # normal row matches the real purchase
        assert out[2] is None        # NULL key: no match
        assert out[3] is None        # NULL ts: no match

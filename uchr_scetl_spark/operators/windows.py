"""§2.5 window functions + §2.6 sort/limit/top-k.

Every window is bounded by a partition key (never a global
ORDER BY-only window — that serialises to one task at scale). Global
top-k uses orderBy().limit(k) so Spark plans TakeOrderedAndProject
(per-partition heaps + driver merge), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import dec_sum, sql_dec_sum
from ..io import load
from ..registry import query


@query(
    "win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
           CAST(rank() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC) AS BIGINT) AS drnk
    FROM orders
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number over a per-group ORDER BY window — one
    hash exchange on the partition key, per-task sort."""
    o = load(spark, sf_dir, "orders")
    w_tiebreak = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w_tiebreak).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "win_topk_per_group",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand, p.p_partkey,
             {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, p.p_partkey
    )
    SELECT p_brand, p_partkey, revenue
    FROM rev
    QUALIFY row_number() OVER (PARTITION BY p_brand
                               ORDER BY revenue DESC, p_partkey) <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand: agg first (shrinks input to one
    row per part), then a bounded window."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(dec_sum(rev, "revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_partkey")
    )
    return (
        per_part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "revenue")
    )


@query(
    "win_running",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_total,
           (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
            / COUNT(*) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS moving_avg3
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sums over an unbounded-preceding frame per key,
    ordered by date."""
    o = load(spark, sf_dir, "orders")
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    run = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mov = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    dec = F.col("o_totalprice").cast("decimal(18,4)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.sum(dec).over(run).cast("double").alias("running_total"),
        (F.sum(dec).over(mov).cast("double") / F.count("*").over(mov)).alias(
            "moving_avg3"
        ),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
           lag(value) OVER w AS prev_value,
           lead(event_type) OVER w AS next_type,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts, event_id,
                          value NULLS FIRST, event_type NULLS FIRST)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream order tiebreaks through the full payload the window
    reads (ts, event_id, value, event_type — NULLS FIRST on both
    engines, Spark's ASC default): duplicated event_ids sharing one
    ts (at-least-once ingestion, round-9 sweep) otherwise leave
    lag/lead assignment engine-dependent; rows identical in all four
    are interchangeable in the output multiset."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", F.col("value").asc_nulls_first(),
        F.col("event_type").asc_nulls_first(),
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice
                RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_in_band
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) frame: peers within a 5000-wide price band."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count("*").over(w).alias("n_in_band"),
    )


@query(
    "win_ntile_percent",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist distribution windows per group."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "sort_multi",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC NULLS LAST, s_name ASC, s_suppkey
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (range-partitioned exchange + per-partition sort)."""
    s = load(spark, sf_dir, "supplier")
    return s.orderBy(
        F.col("s_acctbal").desc_nulls_last(), F.col("s_name").asc(), F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (no full sort, no single-task
    shuffle; each partition keeps a k-heap)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination over a deterministic (unique-key) order."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderkey")
        .offset(100)
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "win_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth over the full partition frame. The explicit
    UNBOUNDED FOLLOWING bound matters: the default frame ends at
    CURRENT ROW, which silently turns last_value into "current row's
    value" in both engines."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "win_time_range",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE)
             AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval range frame: per-user trailing-1-hour count and
    sum — the moving-aggregate shape of time-series feature
    engineering. The frame is RANGE over whole-second event time
    (identically truncated on both engines), so co-timestamped rows
    share a frame — deterministic regardless of their relative order,
    which is why a rows-frame can't express it. Partitioned by user:
    no global-order window, scales with users."""
    e = load(spark, sf_dir, "events")
    # NTZ has no direct long cast; the ltz detour is exact (session
    # timezone is pinned UTC)
    epoch_s = F.col("ts").cast("timestamp_ltz").cast("long")
    w = Window.partitionBy("user_id").orderBy(epoch_s).rangeBetween(-3600, 0)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(24,6)"))
        .over(w)
        .cast("double")
        .alias("sum_last_hour"),
    )


@query(
    "win_distinct_count",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(DISTINCT o_orderpriority)
                OVER (PARTITION BY o_custkey) AS BIGINT)
             AS n_distinct_prio
    FROM orders
    """,
)
def win_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count over a window. Spark has no DISTINCT window
    aggregate — the portable form is size(collect_set() OVER w), which
    keeps one set per partition in the window state (bounded by the
    distinct-value cardinality, fine for low-cardinality attributes;
    for high-cardinality use a two-step groupBy+join instead)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.size(F.collect_set("o_orderpriority").over(w))
        .cast("bigint")
        .alias("n_distinct_prio"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS active_day
      FROM events
    ), numbered AS (
      SELECT user_id, active_day,
             date_diff('day', TIMESTAMP '1970-01-01 00:00:00', active_day)
               - row_number() OVER (PARTITION BY user_id ORDER BY active_day)
               AS grp
      FROM days
    )
    SELECT user_id, min(active_day) AS island_start,
           max(active_day) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM numbered GROUP BY user_id, grp
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per
    user via the day-number-minus-row-number constant — pure window
    algebra, one shuffle on user_id. The calendar twin of
    sessionization (stream_session_windows does it on event-time
    gaps)."""
    e = load(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("active_day")
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("active_day")
    )
    day_num = F.datediff(F.col("active_day"), F.lit("1970-01-01").cast("date"))
    numbered = days.withColumn("grp", day_num - rn)
    return numbered.groupBy("user_id", "grp").agg(
        F.min("active_day").alias("island_start"),
        F.max("active_day").alias("island_end"),
        F.count("*").alias("n_days"),
    ).drop("grp")


@query(
    "win_median_sliding",
    oracle="""
    SELECT user_id, event_id, value,
           median(value) OVER (
             PARTITION BY user_id
             ORDER BY ts, event_id, value NULLS FIRST
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) + 0.0 AS med5
    FROM events
    """,
)
def win_median_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over a ±2-row frame per user — the robust
    smoother dashboards want where a rolling mean chases outliers.

    Spark refuses median/percentile over a bounded frame, so the
    engine materialises the frame explicitly: collect_list over the
    ROWS window (O(5) memory per row), array_sort, select-the-middle.
    One shuffle on user_id. Median is sort-based (selection, not
    summation), so unlike a float mean it is bit-reproducible at any
    parallelism; even-count frames (partition edges) interpolate the
    two middle values identically in both engines.

    The ``+ 0.0`` on the rendered median (both engines) is the
    round-12 negative-zero normalization: a frame of mixed-sign
    zeros has an ENGINE-DEPENDENT middle element — Spark's
    array_sort totally orders -0.0 before 0.0 (Double.compare)
    while DuckDB's median treats them IEEE-equal and keeps
    first-seen — so the sign of a zero median is not a carried
    value. ``x + 0.0`` maps -0.0 to +0.0 and is exact for every
    other double (tests/test_negative_zero_corpus.py)."""
    e = load(spark, sf_dir, "events")
    # value joins the tiebreak (NULLS FIRST both engines): under a
    # duplicated (ts, event_id) pair the ±2 frame each dup row sees
    # otherwise depends on which one the engine ordered first
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", F.col("value").asc_nulls_first())
        .rowsBetween(-2, 2)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    mid = (n / 2).cast("int")
    med = F.when(
        n % 2 == 1, F.element_at(vals, mid + 1)
    ).otherwise(
        (F.element_at(vals, mid) + F.element_at(vals, mid + 1)) / 2
    )
    return e.select(
        "user_id", "event_id", "value",
        (med + F.lit(0.0)).alias("med5"),
    )


EWMA_LAGS = 4  # frame width: current row + 3 preceding
# newest-first power-of-two weights 8,4,2,1 — exact in integer
# arithmetic, and the truncated tail (beyond 3 lags) holds < 1/15 of
# the mass, the usual windowed-EWMA approximation
EWMA_WEIGHTS = [8, 4, 2, 1]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"COALESCE(lag(qv, {i}) OVER w * {w}, 0)"
        for i, w in enumerate(EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN lag(qv, {i}) OVER w IS NOT NULL THEN {w} ELSE 0 END"
        for i, w in enumerate(EWMA_WEIGHTS)
    )
    return f"""
    WITH q AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 1000000) AS BIGINT) AS qv
      FROM events
    )
    SELECT user_id, event_id, qv AS value_micro,
           CASE WHEN ({den}) > 0
                THEN CAST(({num}) // ({den}) AS BIGINT)
           END AS ewma_micro
    FROM q
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts, event_id, qv NULLS FIRST)
    """


@query("win_ewma", oracle=_ewma_oracle())
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average over a bounded trailing
    frame — the telemetry smoother between a rolling mean (chases
    nothing) and the last value (chases everything).

    A true recursive EWMA (s_t = a·x_t + (1−a)·s_{t−1}) is not
    window-expressible in either engine without recursion, so the
    engine uses the standard windowed form: the current row plus
    EWMA_LAGS−1 preceding values weighted by descending powers of two
    (8,4,2,1 — half-life of one row), renormalised over the weights
    actually present. All arithmetic is bigint on micro-quantized
    values, so the result is bit-identical across engines and at any
    parallelism: numerator and denominator are exact integers and both
    engines' integer division truncates toward zero (values are
    non-negative here; a signed corpus would hit the one semantic edge
    both engines share, so it stays consistent even then).

    NULL payloads occupy their frame position but contribute neither
    numerator nor denominator (COALESCE + presence mask); a frame with
    no observed values yields NULL. One shuffle on user_id; the frame
    is O(EWMA_LAGS) per row via plain lag() — no array
    materialisation, whole-stage codegen end to end."""
    e = load(spark, sf_dir, "events").withColumn(
        "qv", F.floor(F.col("value") * 1000000).cast("bigint")
    )
    # qv joins the tiebreak (NULLS FIRST both engines) so duplicated
    # (ts, event_id) rows with different payloads enter the lag frame
    # in a defined order (round-9 duplicate-event sweep)
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", F.col("qv").asc_nulls_first()
    )
    num = sum(
        (
            F.coalesce(F.lag("qv", i).over(w) * F.lit(wt), F.lit(0))
            for i, wt in enumerate(EWMA_WEIGHTS)
        ),
        start=F.lit(0),
    )
    den = sum(
        (
            F.when(F.lag("qv", i).over(w).isNotNull(), F.lit(wt)).otherwise(
                F.lit(0)
            )
            for i, wt in enumerate(EWMA_WEIGHTS)
        ),
        start=F.lit(0),
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.col("qv").alias("value_micro"),
            num.cast("bigint").alias("_num"),
            den.cast("bigint").alias("_den"),
        )
        .withColumn(
            "ewma_micro",
            F.when(F.col("_den") > 0, F.expr("_num div _den")),
        )
        .drop("_num", "_den")
    )


@query(
    "win_drawdown",
    oracle="""
    WITH q AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 1000000) AS BIGINT) AS qv
      FROM events WHERE value IS NOT NULL
    ), r AS (
      SELECT user_id, event_id, qv,
             MAX(qv) OVER (PARTITION BY user_id
               ORDER BY ts, event_id, qv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS peak,
             MAX(qv) OVER (PARTITION BY user_id
               ORDER BY ts, event_id, qv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - qv
               AS drawdown
      FROM q
    )
    SELECT user_id,
           MAX(peak) AS peak_micro,
           MAX(drawdown) AS max_drawdown_micro,
           CAST(CAST(MAX(drawdown) AS HUGEINT) * 1000000
                  // GREATEST(MAX(peak), 1)
             AS BIGINT) AS max_drawdown_ppm
    FROM r GROUP BY user_id
    """,
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per stream — the risk metric of any
    cumulative series (finance P&L, capacity headroom, model-metric
    regressions): the largest drop from a running peak to the current
    value, per user, with the peak and the drop-as-fraction-of-peak
    in exact ppm.

    The running peak is a rows-frame MAX (a streaming O(1) window
    state — unlike a trailing-frame max it never re-scans), the
    drawdown its difference from the current row, the per-user
    answer one aggregation on the SAME user_id partitioning — the
    window exchange serves both. All micro-quantized bigints; one
    truncating division."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    q = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("qv"),
    )
    # qv joins the tiebreak: under a duplicated (ts, event_id) pair
    # each dup row's RUNNING peak otherwise depends on engine order
    # (round-9 duplicate-event sweep); value is filtered non-null here
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", "qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = q.select(
        "user_id",
        F.max("qv").over(w).alias("peak"),
        (F.max("qv").over(w) - F.col("qv")).alias("drawdown"),
    )
    return r.groupBy("user_id").agg(
        F.max("peak").alias("peak_micro"),
        F.max("drawdown").alias("max_drawdown_micro"),
        # the ppm product rides 128-bit algebra: drawdown_micro * 1e6
        # crosses 2^63 at |value| ~ 9.2e6, where ANSI Spark throws and
        # pre-widening keeps the answer correct instead (found by the
        # extreme-value sweep; same class as the rolling-OLS widening)
        F.expr(
            "CAST(CAST(MAX(drawdown) AS DECIMAL(38,0)) * 1000000"
            " div GREATEST(MAX(peak), 1) AS BIGINT)"
        ).alias("max_drawdown_ppm"),
    )


ROLL_OLS_W = 20  # rolling window length (last W events per stream)
ROLL_OLS_SCALE = 1000  # slope unit: milli-micro-value per stream step


@query(
    "win_rolling_ols_slope",
    oracle=f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 1000000) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
    ), r AS (
      SELECT user_id, ts, event_id, y,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id, y)
               AS BIGINT) AS x
      FROM e
    ), s AS (
      SELECT user_id, x, event_id,
             CAST(COUNT(*) OVER w AS BIGINT)      AS nw,
             CAST(SUM(x) OVER w AS BIGINT)        AS sx,
             CAST(SUM(y) OVER w AS BIGINT)        AS sy,
             CAST(SUM(x * y) OVER w AS BIGINT)    AS sxy,
             CAST(SUM(x * x) OVER w AS BIGINT)    AS sxx
      FROM r
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, y
                   ROWS BETWEEN {ROLL_OLS_W - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, x AS rn, event_id,
           CASE WHEN CAST(nw AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                  > 0 THEN
             CAST((CAST(nw AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                  * {ROLL_OLS_SCALE}
                  // (CAST(nw AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                  AS BIGINT)
           END AS slope_milli
    FROM s
    """,
)
def win_rolling_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend slope over each user stream's last
    {ROLL_OLS_W} events — the time-series FEATURE version of
    agg_group_ols_trend (which fits one line per whole group): every
    row gets the local regression slope of value against stream
    position, the standard drift/momentum feature a training pipeline
    materialises per event.

    Exactness: the slope is computed ENTIRELY in integer algebra —
    y in micro units, x the per-stream rank, the four rolling
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) as rolling window
    sums, and the final slope as one integer division
    (n·Σxy − Σx·Σy)·{ROLL_OLS_SCALE} ÷ (n·Σxx − Σx²), which both
    engines truncate identically. No doubles anywhere, so every row
    is bit-reproducible at any parallelism. Single-row windows
    (denominator 0) yield NULL. The numerator/denominator PRODUCTS are
    computed in 128-bit integer algebra — DECIMAL(38,0) on the Spark
    side, HUGEINT in the oracle (DuckDB's DECIMAL `//` is true
    division, HUGEINT `//` truncates toward zero like Spark's decimal
    `div`) — because the bigint form has only corpus-bound headroom:
    at stream length L and |y|≤Y the widest product n·Σxy·scale is
    ~4·10⁵·L·Y and silently WRAPS past 2^63 without ANSI mode, wrong
    slopes with no failure signal. The rolling sums themselves are
    safe in bigint to L·Y < 2^63/20 (petabyte-stream territory), and
    the final QUOTIENT |slope|≤scale·Y always fits a long.

    Scale shape: one exchange on user_id serves the rank and all four
    rolling sums (same WINDOW frame, Catalyst computes them in one
    WindowExec pass); no joins, no second scan."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull()).select(
        "user_id", "ts", "event_id",
        F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("y"),
    )
    # y joins the tiebreak: duplicated (ts, event_id) rows otherwise
    # take engine-dependent stream positions x, moving every rolling
    # sufficient statistic (round-9 duplicate-event sweep); y is
    # non-null here (value filtered)
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id", "y")
    r = e.select(
        "user_id", "ts", "event_id", "y",
        F.row_number().over(ordered).cast("bigint").alias("x"),
    )
    roll = ordered.rowsBetween(-(ROLL_OLS_W - 1), Window.currentRow)
    s = r.select(
        "user_id", "x", "event_id", "ts",
        F.count("*").over(roll).cast("bigint").alias("nw"),
        F.sum("x").over(roll).cast("bigint").alias("sx"),
        F.sum("y").over(roll).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(roll).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(roll).cast("bigint").alias("sxx"),
    )
    # the guard rides the SAME 128-bit algebra as the quotient: a
    # 64-bit nw*sxx crosses 2^63 at ~1.5e8 rows/stream, where Spark
    # (non-ANSI) wraps the guard silently while DuckDB throws — the
    # engines would fail differently on the same data (review finding)
    dec = "DECIMAL(38,0)"
    den = F.expr(
        f"CAST(nw AS {dec}) * sxx - CAST(sx AS {dec}) * sx"
    )
    return s.select(
        "user_id",
        F.col("x").alias("rn"),
        "event_id",
        F.when(den > 0, F.expr(
            f"CAST((CAST(nw AS {dec}) * sxy - CAST(sx AS {dec}) * sy)"
            f" * {ROLL_OLS_SCALE}"
            f" div (CAST(nw AS {dec}) * sxx - CAST(sx AS {dec}) * sx)"
            f" AS BIGINT)"
        )).alias("slope_milli"),
    )


@query(
    "win_gap_fill_locf",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN event_id % 7 = 0 THEN value END AS observed,
           last_value(CASE WHEN event_id % 7 = 0 THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts NULLS FIRST, event_id NULLS FIRST,
                            value NULLS FIRST
                   ROWS UNBOUNDED PRECEDING) AS filled
    FROM events
    """,
)
def win_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill — the feature-
    pipeline staple for sparse sensors/signals: only every 7th event
    carries an observation (the sparse rendering; residue ``= 0`` is
    negative-key-safe where ``= 1`` parity splits are not), and each
    row is filled with the most recent non-NULL observation in its
    user stream via ``last(..., ignorenulls=True)`` over a running
    ROWS frame — DuckDB's ``last_value(... IGNORE NULLS)`` is the
    exact mirror. Stream order tiebreaks through every payload column
    the window reads (ts, event_id, value — the round-9
    duplicate-event totality rule); rows tied in all three carry
    equal observations, so the fill is layout-free.

    Scale: one exchange on user_id serves the single running frame;
    the frame is ROWS-bounded so state is O(1) per row — at 100 TB
    this is the cheapest possible per-stream scan, and the same
    expression works incrementally under Structured Streaming with
    applyInPandasWithState holding the last-seen value."""
    e = load(spark, sf_dir, "events")
    observed = F.when(F.col("event_id") % 7 == 0, F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id", F.col("value").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        observed.alias("observed"),
        F.last(observed, ignorenulls=True).over(w).alias("filled"),
    )

"""As-of join (§4.3) — Spark has no native ASOF JOIN, so the engine
implements it as pure shuffle-parallel DataFrame algebra:

    union-tag both sides → one window per key ordered by (ts, side) →
    last(right-payload, ignoreNulls) → keep left rows.

One shuffle on the join key, no per-key Python, no driver loop — the
same plan shape scales to arbitrarily many keys/rows (skew on a hot
key is the only hazard; AQE skew handling or key salting applies).
A ``merge_asof``-per-group Pandas fallback is deliberately NOT the
default: Arrow transfer of the full fact table costs more than the
window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of: for each left row, the latest right row with
    ``right.ts <= left.ts`` (direction="backward") or the earliest
    with ``right.ts >= left.ts`` (direction="forward"), within the
    same ``on`` key.

    ``right`` must be unique per (on, ts); payload columns are carried
    from the matched right row (null when no matching right row
    exists). Both directions are the same single-shuffle union-tag
    window plan; only the tag ordering and frame direction flip.

    NULL semantics follow SQL ASOF JOIN (the oracles' reference):
    a NULL join key or NULL timestamp never matches — right rows with
    NULL key/ts are dropped (they can satisfy no equality/inequality),
    and a left row with NULL key/ts is kept with NULL payload. Without
    the explicit guards, partitionBy would co-group NULL keys and
    nulls-first ordering would hand a NULL-ts left row the earliest
    right row in the forward direction.
    """
    lcols = left.columns
    # backward: right sorts BEFORE left at equal ts and we look back
    # with last(); forward: right sorts AFTER left and we look ahead
    # with first(). Either way equal-ts right rows are included.
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    # The payload travels as ONE struct column: the struct is non-NULL
    # for every right row even when individual payload FIELDS are NULL,
    # so last/first(ignoreNulls) skips exactly the left rows'
    # placeholder structs. Per-column picks (the first formulation)
    # were wrong on nullable payloads: each column independently
    # skipped a matched row's legit NULL and grabbed the field from an
    # EARLIER right row, stitching together a row that never existed.
    r_tagged = right.where(
        F.col(on).isNotNull() & F.col(ts).isNotNull()
    ).select(
        on,
        ts,
        F.lit(r_tag).alias("_side"),
        F.struct(*payload).alias("_m"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
            if c not in (on, ts)
        ],
    )
    m_type = dict(r_tagged.dtypes)["_m"]
    l_tagged = left.select(
        on,
        ts,
        F.lit(l_tag).alias("_side"),
        F.lit(None).cast(m_type).alias("_m"),
        *[c for c in lcols if c not in (on, ts)],
    )
    unioned = l_tagged.unionByName(r_tagged)
    base = Window.partitionBy(on).orderBy(ts, "_side")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        picked = F.last("_m", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        picked = F.first("_m", ignorenulls=True).over(w)
    matched = unioned.select("*", picked.alias("_mm"))
    no_null_keys = F.col(on).isNotNull() & F.col(ts).isNotNull()
    return matched.where(F.col("_side") == F.lit(l_tag)).select(
        *lcols,
        *[
            F.when(no_null_keys, F.col(f"_mm.{c}")).alias(c)
            for c in payload
        ],
    )


def _clicks_and_purchases(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared probe/reference preparation for the four as-of query
    keys: clicks as the left side, purchases deduped to one row per
    (user_id, ts) — highest event_id wins, mirroring each oracle's
    ``r0``/``r`` CTEs. One definition so the dedup tiebreak can never
    drift between the four variants."""
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    w_dedup = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w_dedup))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
    )
    return clicks, purchases


@query(
    "join_asof",
    oracle="""
    WITH l AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), r0 AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      FROM r0 WHERE rn = 1
    )
    SELECT l.click_id, l.user_id, l.ts,
           r.purchase_id, r.purchase_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click matched to the user's latest prior (or simultaneous)
    purchase. Right side deduped per (user, ts) for determinism."""
    clicks, purchases = _clicks_and_purchases(load(spark, sf_dir, "events"))
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        ts="ts",
        payload=["purchase_id", "purchase_value"],
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH l AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), r0 AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      FROM r0 WHERE rn = 1
    )
    SELECT l.click_id, l.user_id, l.ts,
           r.purchase_id, r.purchase_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click matched to the user's NEXT purchase
    at-or-after it — attribution's "time to conversion" direction.
    Same single-shuffle union-tag window plan as join_asof with the
    frame reversed (first-following instead of last-preceding)."""
    clicks, purchases = _clicks_and_purchases(load(spark, sf_dir, "events"))
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        ts="ts",
        payload=["purchase_id", "purchase_value"],
        direction="forward",
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH l AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), r0 AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      FROM r0 WHERE rn = 1
    )
    SELECT l.click_id, l.user_id, l.ts,
           CASE WHEN l.ts - r.ts <= INTERVAL 6 HOUR
                THEN r.purchase_id END AS purchase_id,
           CASE WHEN l.ts - r.ts <= INTERVAL 6 HOUR
                THEN r.purchase_value END AS purchase_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of (pandas merge_asof's ``tolerance``):
    the latest prior purchase counts only if it happened within 6
    hours of the click — stale matches null out. Implemented as the
    ordinary as-of carrying the matched right timestamp, then one
    scan-side null-out; no extra shuffle."""
    clicks, purchases = _clicks_and_purchases(load(spark, sf_dir, "events"))
    # carry the matched ts explicitly: duplicate it into the payload
    purchases2 = purchases.select(
        "user_id",
        "ts",
        "purchase_id",
        "purchase_value",
        F.col("ts").alias("matched_ts"),
    )
    raw = asof_join(
        clicks,
        purchases2,
        on="user_id",
        ts="ts",
        payload=["purchase_id", "purchase_value", "matched_ts"],
    )
    # exact interval comparison (an epoch-seconds cast would truncate
    # sub-second components and flip boundary matches)
    within = F.col("ts") <= F.col("matched_ts") + F.expr("INTERVAL 6 HOURS")
    return raw.select(
        "click_id",
        "user_id",
        "ts",
        F.when(within, F.col("purchase_id")).alias("purchase_id"),
        F.when(within, F.col("purchase_value")).alias("purchase_value"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH l AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ), r0 AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
      FROM r0 WHERE rn = 1
    )
    SELECT l.click_id, l.user_id, l.ts,
           CASE WHEN b.ts IS NOT NULL
                 AND (f.ts IS NULL OR l.ts - b.ts <= f.ts - l.ts)
                THEN b.purchase_id ELSE f.purchase_id END AS purchase_id,
           CASE WHEN b.ts IS NOT NULL
                 AND (f.ts IS NULL OR l.ts - b.ts <= f.ts - l.ts)
                THEN b.purchase_value ELSE f.purchase_value
           END AS purchase_value
    FROM l
      ASOF LEFT JOIN r b ON l.user_id = b.user_id AND l.ts >= b.ts
      ASOF LEFT JOIN r f ON l.user_id = f.user_id AND l.ts <  f.ts
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of (pandas merge_asof direction='nearest'):
    each click takes whichever purchase is CLOSER in time — the latest
    at-or-before vs the earliest strictly-after — with ties preferring
    the backward match.

    Plan: BOTH directions come out of ONE union-tag window pass — the
    partitionBy(user)/orderBy(ts, side) sort is shared, the backward
    match is last(payload, ignoreNulls) over the preceding frame and
    the forward match first(payload, ignoreNulls) over the following
    frame, so nearest costs the same single shuffle as one-directional
    as-of (a naive two-asof-join formulation pays two window plans
    plus a fact-sized re-join). Right rows sort BEFORE left rows at
    equal ts, which lands equal-ts matches in the backward frame —
    exactly the tie rule."""
    clicks, purchases = _clicks_and_purchases(load(spark, sf_dir, "events"))
    payload = ["purchase_id", "purchase_value"]
    # one non-NULL struct per right row (see asof_join: per-column
    # picks would stitch fields from different purchases when a
    # payload field is legitimately NULL); NULL-key/ts right rows
    # dropped and NULL-key/ts left rows nulled out, same SQL ASOF
    # semantics as asof_join
    r_tagged = purchases.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.lit(0).alias("_side"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.struct(*payload, F.col("ts").alias("matched_ts")).alias("_m"),
    )
    m_type = dict(r_tagged.dtypes)["_m"]
    l_tagged = clicks.select(
        "user_id",
        "ts",
        F.lit(1).alias("_side"),
        "click_id",
        F.lit(None).cast(m_type).alias("_m"),
    )
    unioned = r_tagged.unionByName(l_tagged)
    base = Window.partitionBy("user_id").orderBy("ts", "_side")
    back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    matched = unioned.select(
        "*",
        F.last("_m", ignorenulls=True).over(back).alias("_b"),
        F.first("_m", ignorenulls=True).over(fwd).alias("_f"),
    ).where(F.col("_side") == 1)
    use_back = F.col("_b.matched_ts").isNotNull() & (
        F.col("_f.matched_ts").isNull()
        | (
            F.col("ts") - F.col("_b.matched_ts")
            <= F.col("_f.matched_ts") - F.col("ts")
        )
    )
    ok = F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    return matched.select(
        "click_id",
        "user_id",
        "ts",
        F.when(ok & use_back, F.col("_b.purchase_id"))
        .when(ok & ~use_back, F.col("_f.purchase_id"))
        .alias("purchase_id"),
        F.when(ok & use_back, F.col("_b.purchase_value"))
        .when(ok & ~use_back, F.col("_f.purchase_value"))
        .alias("purchase_value"),
    )

"""NULL-lineitem robustness gate for the window/sort/selection family.

Fourth member of the round-6 null-gate family. Nullable ORDER BY
columns are the systematic hazard here: ascending sort puts NULLs
FIRST in Spark but LAST in DuckDB, so any windowed/top-k key ordering
on a null-bearing column silently diverges. This gate nulls
l_extendedprice (1-in-5), l_discount (1-in-7) and l_shipdate
(1-in-11) and requires the whole window/sort/topk/selection family to
value-match the oracle — all green at introduction (the family either
filters nulls explicitly, aggregates them away identically, or orders
on non-nullable keys), and this pins that property against future
keys that order on nullable columns without an explicit NULLS
FIRST/LAST on both sides.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from uchr_scetl_spark import clear_caches, load_registry

from .conftest import SF_SMOKE
from .oracle import compare, oracle_connection

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

KEYS = [
    "agg_percentile",
    "agg_percentile_exact_distributed",
    "agg_weighted_median_distributed",
    "limit_offset",
    "sort_multi",
    "topk_global",
    "win_distinct_count",
    "win_first_last_nth",
    "win_gaps_islands",
    "win_lag_lead",
    "win_median_sliding",
    "win_ntile_percent",
    "win_range_frame",
    "win_rank",
    "win_running",
    "win_time_range",
    "win_topk_per_group",
    # round 6 (cont.): OLS trend filters null ship dates/prices on
    # both sides — the exact corpus this gate nulls
    "agg_group_ols_trend",
]

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def null_lineitem_dir():
    import duckdb

    out = tempfile.mkdtemp(prefix="uchr_null_lineitem_corpus_")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{SF_SMOKE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if t == "lineitem":
            con.execute(
                f"""
                COPY (
                  SELECT * REPLACE (
                    CASE WHEN l_linenumber % 5 = 0 THEN NULL
                         ELSE l_extendedprice END AS l_extendedprice,
                    CASE WHEN l_linenumber % 7 = 0 THEN NULL
                         ELSE l_discount END AS l_discount,
                    CASE WHEN l_linenumber % 11 = 0 THEN NULL
                         ELSE l_shipdate END AS l_shipdate)
                  FROM read_parquet('{src}')
                ) TO '{dst}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copyfile(src, dst)
    con.close()
    yield out
    clear_caches(out)
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def null_lineitem_oracle(null_lineitem_dir):
    con = oracle_connection(null_lineitem_dir)
    yield con
    con.close()


@pytest.mark.parametrize("key", KEYS)
def test_window_key_matches_oracle_with_null_lineitem(
    key, spark, null_lineitem_dir, null_lineitem_oracle
):
    spec = REGISTRY[key]
    sdf = spec.fn(spark, null_lineitem_dir).toPandas()
    odf = null_lineitem_oracle.sql(spec.oracle).df()
    problems = compare(sdf, odf)
    assert not problems, f"{key}: {'; '.join(problems)}"

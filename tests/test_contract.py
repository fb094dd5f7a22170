"""Driver-contract shape tests: registry completeness + entry smoke."""

from __future__ import annotations

import importlib.util
import os

import pytest

from uchr_scetl_spark import load_registry


def _load_entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_registry_keys_unique_and_callable():
    reg = load_registry()
    assert len(reg) >= 30
    for key, spec in reg.items():
        assert spec.key == key
        assert callable(spec.fn)


def test_oracle_sql_subset_of_queries():
    mod = _load_entry_module()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    assert all(isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH"))
               for s in o.values())


def test_entry_smoke(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"r_name", "n_name", "l_returnflag", "revenue"} <= set(df.columns)


def test_checked_outputs_carry_scalar_columns_only(spark):
    """Registry-wide canonicalizer contract: every CHECKED (oracle-
    bearing) key's output schema must contain only scalar columns —
    no Array/Map/Struct. The driver's order-insensitive hasher
    column-sorts the pandas frame before hashing and dies on ndarray
    cells (round-9: dedup_vec_ids rode a raw array<float> into its
    checked output and was the first driver ERR in seven rounds; the
    repo's own rule at operators/aggregates.py said so all along).
    Rows-only keys are exempt — no hash is taken for them, and nested
    payloads (LSH signature arrays etc.) are their point."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from .conftest import SF_SMOKE

    offenders = []
    for key, spec in sorted(load_registry().items()):
        if spec.rows_only:
            continue
        schema = spec.fn(spark, SF_SMOKE).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{key}: {bad}")
    assert not offenders, "; ".join(offenders)


# Keys allowed to emit BOOLEAN columns: each is non-null BY
# CONSTRUCTION (isNull tests, aggregates over guaranteed-present
# groups, literals, comparisons of non-null hashes). NULL BOOLEAN is
# the one dtype whose null rendering splits the compared pandas
# frames (Spark toPandas None vs DuckDB .df() NaN in object columns —
# round-11 CSV-fidelity sweep), so a NULLABLE predicate must be INT
# 1/0/NULL instead (fn_regex.has_data precedent). Adding a boolean
# output to a new key means consciously extending this list.
BOOLEAN_OK = {
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_conditional",
    "agg_count_min_heavy_hitters",
    "agg_hll_sketch_merge",
    "agg_kll_merge_quantiles",
    "agg_theta_set_distinct",
    "etl_expectations_suite",
    "etl_scd2",
    "events_bot_burst_audit",
    "fn_hash_xx",
    "fn_try_cast",
    "join_mark_exists",
}


def test_boolean_outputs_are_allowlisted_nonnull_by_construction(spark):
    """Registry-wide nullable-boolean guard (round-11): any key
    emitting a BOOLEAN column must be on the reviewed allowlist —
    everything nullable must ship as INT. Catches a future key
    accidentally exposing rlike/array_contains over nullable input
    as a raw boolean."""
    from pyspark.sql.types import BooleanType

    from .conftest import SF_SMOKE

    offenders = []
    for key, spec in sorted(load_registry().items()):
        schema = spec.fn(spark, SF_SMOKE).schema
        bools = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, BooleanType)
        ]
        if bools and key not in BOOLEAN_OK:
            offenders.append(f"{key}: {bools}")
    assert not offenders, "; ".join(offenders)


def test_bucketed_join_has_no_shuffle(spark):
    """The join of the two bucketed tables must read co-located buckets:
    no Exchange may appear between the table scans and the join."""
    from uchr_scetl_spark import load_registry
    from .conftest import SF_SMOKE

    df = load_registry()["join_bucketed"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    # below the join there are only scans/sorts/filters — no Exchange
    assert "Exchange" not in join_part, plan


def test_frame_sample_expansion(spark):
    """Every 32-byte payload must expand to exactly 4 frames with
    stride-2 indices (0, 2, 4, 6)."""
    from uchr_scetl_spark import load_registry
    from .conftest import SF_SMOKE

    rows = load_registry()["multimodal_frame_sample"].fn(spark, SF_SMOKE).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        assert 0.0 <= r.frame_feat <= 255.0
    assert all(sorted(v) == [0, 2, 4, 6] for v in by_doc.values())


def test_partition_pruning_in_plan(spark):
    """The status filter must reach the scan as a PartitionFilter (not
    a post-scan Filter over all partitions)."""
    from uchr_scetl_spark import load_registry
    from .conftest import SF_SMOKE

    df = load_registry()["scan_pruned_partition"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or (
        "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    ), plan


def test_no_output_column_is_local_tz_timestamp(spark):
    """Registry-wide host-timezone guard (round-12): no key may emit
    a plain TIMESTAMP (timestamp-with-local-timezone) column — checked
    outputs are timestamp_ntz. A local-TZ TIMESTAMP has correct VALUES
    under the pinned UTC session but classic collect() renders it
    through the PYTHON PROCESS timezone, so the same result prints
    different datetimes on differently-zoned hosts. The round-12
    TZ=Asia/Kolkata registry sweep caught exactly one leak —
    etl_incremental_agg_merge, where date_trunc SILENTLY coerces
    timestamp_ntz input to TIMESTAMP (the coercion is pinned below so
    an upstream change is noticed)."""
    from pyspark.sql.types import TimestampType

    from .conftest import SF_SMOKE

    offenders = []
    for key, spec in sorted(load_registry().items()):
        schema = spec.fn(spark, SF_SMOKE).schema
        ltz = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, TimestampType)
        ]
        if ltz:
            offenders.append(f"{key}: {ltz}")
    assert not offenders, "; ".join(offenders)


def test_date_trunc_coerces_ntz_to_local_tz_timestamp(spark):
    """The trap behind the round-12 leak, pinned: Spark's date_trunc
    returns session-TZ TIMESTAMP even for timestamp_ntz input, so
    every date_trunc over corpus timestamps needs an explicit
    .cast('timestamp_ntz') on the rendered column. If an upstream
    release makes date_trunc NTZ-preserving, this tripwire flags the
    casts as removable."""
    df = spark.sql(
        "SELECT date_trunc('day', CAST('2024-01-02 03:04:05' AS "
        "TIMESTAMP_NTZ)) AS d"
    )
    assert dict(df.dtypes)["d"] == "timestamp", df.dtypes


def test_no_keyless_round_robin_repartition_in_engine_source():
    """Round-13 tripwire: `.repartition(n)` WITHOUT partitioning
    columns is round-robin — an INDETERMINATE stage whose row routing
    depends on arrival order, so a lost executor forcing partial
    map-stage re-execution after some reducers finished aborts the
    job (result stages cannot roll back; SPARK-23207 was the silent
    corruption this rule prevents on older lineages). Every
    repartition in the engine must name its keys; hash routing is
    attempt-invariant. (Keyed string forms like repartition("month")
    and (n, "col") pass; a genuinely unavoidable round-robin would
    need an explicit allowlist entry here with its recovery story.)

    AST-walked, not regexed (round 14, r13 ADVICE): the old
    line-by-line regex missed calls a formatter had split across
    lines — ast.Call nodes carry no such blind spot. Keyless means a
    single positional argument that cannot be a column: an int
    literal, a bare name, a dotted attribute, or a zero-argument
    call. String literals and column-expression calls like
    F.col("x") are keys; two-plus arguments always include one.
    Round 15 (r14 ADVICE): the keyword spelling
    ``repartition(numPartitions=8)`` is the same round-robin and is
    caught too — a lone numPartitions keyword with a non-column
    value, no positional args."""
    import ast
    import os

    pkg = os.path.join(os.path.dirname(__file__), "..", "uchr_scetl_spark")

    def keyless(call: ast.Call) -> bool:
        if not (
            isinstance(call.func, ast.Attribute)
            and call.func.attr == "repartition"
        ):
            return False
        def non_column(a: ast.expr) -> bool:
            if isinstance(a, ast.Constant) and isinstance(a.value, int):
                return True
            if isinstance(a, (ast.Name, ast.Attribute)):
                return True
            if isinstance(a, ast.Call) and not a.args and not a.keywords:
                return True
            return False

        if len(call.args) == 1 and not call.keywords:
            return non_column(call.args[0])
        if (
            not call.args
            and len(call.keywords) == 1
            and call.keywords[0].arg == "numPartitions"
        ):
            return non_column(call.keywords[0].value)
        return False

    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            for node in ast.walk(tree):
                if isinstance(node, ast.Call) and keyless(node):
                    offenders.append(
                        f"{path}:{node.lineno}: "
                        f"{ast.unparse(node)[:120]}"
                    )
    assert not offenders, "\n".join(offenders)


def test_operators_catalog_is_current():
    """OPERATORS.md (round 15) is generated from the live registry by
    tools/gen_operators_md.py; this keyset-diff makes a new, renamed,
    or re-classified key that ships without regenerating the catalog a
    test failure — same discipline as the selfcheck keyset gate. Only
    the derivable columns are pinned (key set and oracle kind); prose
    drift is the generator's business, not a gate."""
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "OPERATORS.md")
    assert os.path.exists(path), "OPERATORS.md missing - run tools/gen_operators_md.py"
    rows = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"\| ([a-z0-9_]+) \| (hash|rows-only) \|", line)
            if m:
                rows[m.group(1)] = m.group(2)
    reg = load_registry()
    assert set(rows) == set(reg), (
        f"OPERATORS.md out of date: missing={sorted(set(reg) - set(rows))[:5]} "
        f"stale={sorted(set(rows) - set(reg))[:5]} - regenerate with "
        "tools/gen_operators_md.py"
    )
    for k, spec in reg.items():
        want = "rows-only" if spec.rows_only else "hash"
        assert rows[k] == want, f"{k}: catalog says {rows[k]}, registry says {want}"

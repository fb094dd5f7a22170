"""§2.1 scans / sources / sinks.

Scans stay declarative so Catalyst pushes predicates and prunes columns
into the parquet reader (verify with ``.explain``: PushedFilters /
ReadSchema). Sink round-trips write through ``io.scratch_dir`` (a fresh
temp dir per invocation, removed at interpreter exit, so sweep/bench
loops never accumulate orphans); rendered fixtures (binary files,
malformed CSV) are additionally memoized per (app, sf_dir).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..io import load, read_csv, read_json, scratch_dir, write_csv, write_json
from ..exprs import dec_sum
from ..registry import query


@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity >= 30
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter pushed down into the parquet scan."""
    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    )


@query(
    "scan_csv",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with an explicit schema (no inference).

    Doubles survive exactly: Spark writes shortest-round-trip
    representations and parses them back to the identical bits.
    """
    src = load(spark, sf_dir, "customer")
    out = scratch_dir("uchr_scan_csv_")
    write_csv(src, out)
    return read_csv(spark, out, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "scan_json",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round-trip with an explicit schema."""
    src = load(spark, sf_dir, "part")
    out = scratch_dir("uchr_scan_json_")
    write_json(src, out)
    return read_json(spark, out, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
    )


@query(
    "sink_parquet_partitioned",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM lineitem WHERE l_quantity >= 45
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write partitioned parquet, read back, aggregate.

    ``partitionBy`` lays out one directory per key — the layout that
    enables static partition pruning on re-read at scale.
    """
    src = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    out = scratch_dir("uchr_sink_parq_")
    src.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    # explicit schema: a zero-row partitioned write creates no
    # directories, and a schema-less read of it cannot infer — empty
    # partitions are daily reality at scale, not an error
    back = spark.read.schema(src.schema).parquet(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("sum_qty")
    )


@query(
    "scan_orc",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier WHERE s_acctbal > 0
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (Spark-native columnar format besides parquet).

    ORC self-describes like parquet, so the re-read needs no schema;
    the filter on re-read pushes into the ORC reader the same way
    (min/max stripe skipping at scale)."""
    src = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = scratch_dir("uchr_scan_orc_")
    src.write.mode("overwrite").orc(out)
    return spark.read.orc(out).where(F.col("s_acctbal") > 0)


@query(
    "sink_orc_partitioned",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sink_orc_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned ORC sink + pruned re-read aggregate.

    Money aggregate uses the registry's cents idiom (BIGINT SUM, not a
    raw order-dependent double SUM — same class as the
    pipeline_orders_daily fix)."""
    src = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    out = scratch_dir("uchr_sink_orc_")
    src.write.mode("overwrite").partitionBy("o_orderpriority").orc(out)
    back = spark.read.schema(src.schema).orc(out)  # zero-row-write safe
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
        ).alias("sum_price_cents"),
    )


@query(
    "sink_csv",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 450000
    """,
)
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + re-read of a projected slice."""
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
        ]
    )
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 450000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    out = scratch_dir("uchr_sink_csv_")
    write_csv(src, out)
    return read_csv(spark, out, schema)


@query(
    "sink_csv_roundtrip_text",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
)
def sink_csv_roundtrip_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS CSV round-trip of the free-text table — the fidelity
    contract the round-11 CSV axis pinned: quotes, commas, embedded
    newlines/CRLF, backslashes, edge whitespace, empty strings, and
    NULLs all survive write_csv → read_csv bit-exactly, and the
    written files are RFC 4180 (doubled quotes) so external readers
    parse them identically (DuckDB read_csv interop is asserted in
    tests/test_csv_fidelity_corpus.py). The axis found two
    silent-corruption DEFAULTS in Spark's writer: backslash escaping
    (RFC-strict readers misparse) and write-side
    ignoreLeading/TrailingWhiteSpace=true (edge whitespace silently
    stripped) — both overridden in io.write_csv. The one reserved
    token: a literal two-char '\\N' text (the Postgres/MySQL NULL
    sentinel read_csv uses to keep unquoted-empty → NULL distinct
    from quoted "" → empty string) — out of the checked domain,
    tripwire-pinned.

    Because this is a registry key over ``documents``, every hostile
    text corpus the suite sweeps (control chars, unicode, in-band
    delimiters, giant documents, NULL text) exercises the CSV dialect
    automatically from here on.

    Scale: the writer emits one file per task and the multiLine
    reader splits per-FILE, so file count is the read parallelism —
    the scan_xml argument; embedded newlines make per-line splitting
    unsafe in ANY dialect."""
    src = load(spark, sf_dir, "documents")
    out = scratch_dir("uchr_csv_rt_")
    write_csv(src, out)
    return read_csv(spark, out, "documents")


@query(
    "scan_pruned_partition",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderstatus = 'F'
    """,
)
def scan_pruned_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static partition pruning: the snapshot is laid out partitioned
    by status, and the equality filter resolves at PLANNING time to a
    single directory — the scan never opens the other partitions
    (tests assert PartitionFilters carries the predicate). At 100 TB
    partition layout + pruning is the difference between scanning one
    day and scanning the lake."""
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    out = scratch_dir("uchr_pruned_")
    src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    return (
        spark.read.schema(src.schema).parquet(out)
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sink_json",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer WHERE c_acctbal < 0
    """,
)
def sink_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema'd re-read of a projected slice —
    completes the source/sink matrix (parquet/CSV/JSON/ORC each have
    both directions)."""
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_mktsegment", StringType()),
            StructField("c_acctbal", DoubleType()),
        ]
    )
    src = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") < 0)
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )
    out = scratch_dir("uchr_sink_json_")
    write_json(src, out)
    return read_json(spark, out, schema)


@query(
    "scan_merge_schema",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS load_tag
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'batch2' AS load_tag
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two loads of the same table where the
    second added a column, read back with ``mergeSchema`` — rows from
    the old files carry NULL for the new column. The everyday ETL
    reality of append-only datasets whose schema grows."""
    o = load(spark, sf_dir, "orders")
    out = scratch_dir("uchr_evolve_")
    (
        o.where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(f"{out}/b1")
    )
    (
        o.where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice", F.lit("batch2").alias("load_tag"))
        .write.mode("overwrite")
        .parquet(f"{out}/b2")
    )
    return spark.read.option("mergeSchema", "true").parquet(
        f"{out}/b1", f"{out}/b2"
    )


_binary_fixture_memo: dict[tuple[str, str], str] = {}


def _binary_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write the 32-doc .bin landing files once per (app, sf_dir);
    remove them at interpreter exit."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _binary_fixture_memo:
        # zero-byte payloads are excluded ON BOTH SIDES: Spark's
        # binaryFile source silently SKIPS empty files (an empty-text
        # doc wrote a 0-byte .bin and vanished from the scan — found
        # by the empty-text sweep), so the key's contract explicitly
        # covers non-empty blobs only; a production pipeline routes
        # truncated uploads through a DQ gate before this scan.
        docs = (
            load(spark, sf_dir, "documents")
            .where(
                (F.col("doc_id") < 32)
                & F.col("text").isNotNull()
                & (F.length("text") > 0)
            )
            .select("doc_id", "text")
            .collect()
        )
        out = scratch_dir("uchr_bin_")
        for r in docs:
            with open(f"{out}/doc_{r.doc_id:05d}.bin", "wb") as fh:
                fh.write(r.text.encode("utf-8"))
        _binary_fixture_memo[key] = out
    return _binary_fixture_memo[key]


@query(
    "scan_binary_files",
    oracle="""
    SELECT doc_id,
           sha256(text) AS content_sha,
           CAST(strlen(text) AS BIGINT) AS content_len
    FROM documents
    WHERE doc_id < 32 AND text IS NOT NULL AND strlen(text) > 0
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the ingest path for multimodal blobs
    (images/audio/video land as opaque files; see llm/multimodal.py for
    the downstream decode/resize stages). Each file becomes one row of
    (path, modificationTime, length, content binary); the id is carved
    from the filename, exactly how blob+sidecar datasets are keyed.

    The landing files here are corpus text bytes (one .bin per doc, a
    bounded 32-doc slice written driver-side as setup), so the oracle
    can verify the binary path end-to-end: sha256 over file CONTENT
    must equal sha256 over the source text. At scale binaryFile scans
    parallelise per-file and push ``pathGlobFilter``; files larger
    than ~2 GB need the streaming read in mapInPandas instead."""
    # Fixture dir is memoized per (app, sf_dir) and removed at exit —
    # repeated invocations (sweeps, bench loops) reuse the same files
    # instead of leaking a fresh tempdir per call.
    out = _binary_fixture_dir(spark, sf_dir)
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(out)
    )
    return back.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
        .cast("long")
        .alias("doc_id"),
        F.sha2(F.col("content"), 256).alias("content_sha"),
        F.col("length").alias("content_len"),
    )


# sign-aware pattern (round-9 negative-key sweep: an unsigned \d+
# rejected "-123|..." lines, and ANSI cast('') then THREW — a log
# parser must accept signed ids); nullif('') keeps a genuinely
# malformed line NULL-quarantined instead of failing the job.
# The price group is a strict decimal literal -?\d+(\.\d+)?
# (round-10 ADVICE: the looser -?[0-9.]+ admitted '.' / '1.2.3',
# which the ANSI double cast then THREW on instead of
# NULL-quarantining — the whole malformed line must fail the
# regex so every group comes back '' → NULL)
ORDER_LINE_PAT = r"^(-?\d+)\|(-?\d+)\|([A-Z])\|(-?\d+(?:\.\d+)?)$"


def parse_order_lines(lines: DataFrame) -> DataFrame:
    """Carve pipe-delimited order log lines into typed columns; any
    line that fails ``ORDER_LINE_PAT`` (including a structurally-valid
    line with a malformed price token) comes back as an all-NULL row
    instead of throwing under ANSI."""
    return lines.select(
        F.nullif(F.regexp_extract("value", ORDER_LINE_PAT, 1), F.lit(""))
        .cast("bigint")
        .alias("o_orderkey"),
        F.nullif(F.regexp_extract("value", ORDER_LINE_PAT, 2), F.lit(""))
        .cast("bigint")
        .alias("o_custkey"),
        F.nullif(
            F.regexp_extract("value", ORDER_LINE_PAT, 3), F.lit("")
        ).alias("o_orderstatus"),
        F.nullif(F.regexp_extract("value", ORDER_LINE_PAT, 4), F.lit(""))
        .cast("double")
        .alias("o_totalprice"),
    )


@query(
    "scan_text_lines",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 100000
    """,
)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-file ingestion: ``spark.read.text`` + regex field carving —
    the unstructured-to-typed path every scraped/legacy feed needs.
    The engine first renders an orders slice as pipe-delimited lines
    (the simulated log), then parses it back with one
    ``regexp_extract`` per field and typed casts. The parse stays in
    whole-stage codegen (no UDF), and at 100 TB text scans
    parallelise per-file split exactly like CSV. Doubles survive
    because Spark renders shortest-round-trip decimal strings."""

    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 100000)
        .select(
            F.concat_ws(
                "|",
                F.col("o_orderkey"),
                F.col("o_custkey"),
                F.col("o_orderstatus"),
                F.col("o_totalprice"),
            ).alias("value")
        )
    )
    out = scratch_dir("uchr_textlines_")
    src.write.mode("overwrite").text(out)
    return parse_order_lines(spark.read.text(out))


@query(
    "scan_json_corrupt",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE o_orderkey % 100 <> 0) AS BIGINT)
             AS n_valid,
           CAST(COUNT(*) FILTER (WHERE o_orderkey % 100 = 0) AS BIGINT)
             AS n_corrupt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6)))
                  FILTER (WHERE o_orderkey % 100 <> 0) AS DOUBLE)
             AS valid_total
    FROM orders WHERE o_totalprice > 150000
    """,
)
def scan_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record JSON ingestion: PERMISSIVE mode quarantines
    unparseable lines into ``columnNameOfCorruptRecord`` instead of
    failing the job — mandatory for any at-scale feed, where a 100 TB
    load WILL contain broken lines and dying at line 40 billion is
    not an option.

    The engine renders an orders slice as JSON lines with every 100th
    order replaced by a deliberately truncated record, reads it back
    under an explicit schema + PERMISSIVE, and reports
    valid/corrupt/valid-total in one pass. The JSON parse and the
    corrupt-row routing both happen scan-side (per-file-split
    parallel); doubles survive because to_json writes
    shortest-round-trip decimals."""

    src = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    line = F.when(
        F.col("o_orderkey") % 100 == 0,
        F.concat(F.lit('{"broken '), F.col("o_orderkey")),
    ).otherwise(
        F.to_json(F.struct("o_orderkey", "o_totalprice"))
    )
    out = scratch_dir("uchr_jsoncorrupt_")
    src.select(line.alias("value")).write.mode("overwrite").text(out)

    parsed = (
        spark.read.schema(
            "o_orderkey bigint, o_totalprice double, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    ok = F.col("_corrupt").isNull()
    return parsed.agg(
        F.count(F.when(ok, 1)).alias("n_valid"),
        F.count(F.when(~ok, 1)).alias("n_corrupt"),
        F.sum(
            F.when(ok, F.col("o_totalprice").cast("decimal(24,6)"))
        )
        .cast("double")
        .alias("valid_total"),
    )


@query(
    "sink_compressed_codecs",
    oracle="""
    SELECT 'zstd_parquet' AS codec,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE) AS total
    FROM orders WHERE o_totalprice > 200000
    UNION ALL
    SELECT 'gzip_csv',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
    FROM orders WHERE o_totalprice > 200000
    """,
)
def sink_compressed_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec round-trips: the same slice written as
    zstd parquet and gzip CSV, read back, and both paths must agree
    with the source. Codec choice is a first-order cost lever at
    100 TB (zstd ≈ gzip ratio at several× the throughput, and
    parquet+zstd splits by row group where a .csv.gz file is ONE
    split — the classic ingest bottleneck this key documents)."""

    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select("o_orderkey", "o_totalprice")
    )
    pq = scratch_dir("uchr_zstd_")
    src.write.mode("overwrite").option("compression", "zstd").parquet(pq)
    cs = scratch_dir("uchr_gzcsv_")
    src.write.mode("overwrite").option("compression", "gzip").option(
        "header", "true"
    ).csv(cs)

    agg = lambda df, name: df.agg(  # noqa: E731
        F.lit(name).alias("codec"),
        F.count("*").alias("n"),
        dec_sum("o_totalprice", "total"),
    ).select("codec", "n", "total")

    back_pq = spark.read.schema(src.schema).parquet(pq)
    back_cs = (
        spark.read.schema("o_orderkey bigint, o_totalprice double")
        .option("header", "true")
        .csv(cs)
    )
    return agg(back_pq, "zstd_parquet").unionByName(agg(back_cs, "gzip_csv"))


@query(
    "scan_glob_recursive",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
             AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def scan_glob_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-pattern ingestion: the same dataset scattered across a
    nested date-sharded layout (``landing/2024/01/*.parquet`` style)
    read back two ways — a glob pattern and ``recursiveFileLookup`` —
    and both must see every file exactly once. At 100 TB the listing
    strategy IS a performance decision (driver-side listing of a
    million-file tree), which is why both knobs exist; this key pins
    their completeness semantics."""

    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir("uchr_glob_")
    # scatter into a two-level nested layout
    for status in ("F", "O", "P"):
        (
            src.where(F.col("o_orderstatus") == status)
            .write.mode("overwrite")
            .parquet(f"{root}/y=2024/s={status}")
        )
    globbed = spark.read.schema(src.schema).parquet(f"{root}/y=*/s=*")
    recursive = (
        spark.read.schema(src.schema)
        .option("recursiveFileLookup", "true")
        .parquet(root)
    )
    agg = lambda df: df.groupBy("o_orderstatus").agg(  # noqa: E731
        F.count("*").alias("n"),
        dec_sum("o_totalprice", "total"),
    )
    # parity is part of the checked result: inner-join the two
    # aggregates on ALL columns — if either listing strategy misses or
    # double-reads a file, rows drop out and the oracle check fails
    g, r = agg(globbed), agg(recursive)
    return g.join(
        r,
        [g[c].eqNullSafe(r[c]) for c in ["o_orderstatus", "n", "total"]],
        "inner",
    ).select(g["o_orderstatus"], g["n"], g["total"])


@query(
    "sink_sorted_clustered",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-06-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-09-01 00:00:00'
    """,
)
def sink_sorted_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered layout: repartition by a distribution key, sort
    WITHIN each file by the query key, write parquet — every row
    group's min/max o_orderdate stats become tight, so a later range
    filter skips whole row groups without reading them (the poor
    man's z-order, and the single highest-leverage layout decision
    for time-filtered scans at 100 TB). The re-read's pushed range
    filter is what the oracle checks; the plan test asserts the
    filter reaches the scan."""

    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    out = scratch_dir("uchr_clustered_")
    (
        src.repartition(4, "o_custkey")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    lo = F.lit("1999-06-01").cast("timestamp_ntz")
    hi = F.lit("1999-09-01").cast("timestamp_ntz")
    return (
        spark.read.schema(src.schema)
        .parquet(out)
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    )


_csv_malformed_memo: dict[tuple[str, str], str] = {}


def _csv_malformed_dir(spark: SparkSession, sf_dir: str) -> str:
    """Render the malformed-CSV fixture once per (app, sf_dir) and
    remove it at interpreter exit — mirrors _binary_fixture_dir so
    bench sweeps don't leak one tempdir (plus a full customer CSV
    render) per invocation."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _csv_malformed_memo:
        src = load(spark, sf_dir, "customer")
        line = F.when(
            F.col("c_custkey") % 50 == 0,
            F.concat_ws(",", F.col("c_custkey"), F.lit("NOT_A_NUMBER")),
        ).otherwise(
            F.concat_ws(
                ",", F.col("c_custkey"), F.col("c_acctbal").cast("string")
            )
        )
        out = scratch_dir("uchr_csvmalformed_")
        src.select(line.alias("value")).write.mode("overwrite").text(out)
        _csv_malformed_memo[key] = out
    return _csv_malformed_memo[key]


@query(
    "scan_csv_malformed",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE c_custkey % 50 <> 0) AS BIGINT)
             AS n_valid,
           CAST(COUNT(*) FILTER (WHERE c_custkey % 50 = 0) AS BIGINT)
             AS n_malformed,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(24,6)))
                  FILTER (WHERE c_custkey % 50 <> 0) AS DOUBLE)
             AS valid_bal
    FROM customer
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record CSV ingestion: PERMISSIVE mode quarantines
    rows whose cells don't parse under the declared schema into
    ``columnNameOfCorruptRecord`` — the CSV twin of scan_json_corrupt
    (a 100 TB CSV feed WILL contain rows with the wrong arity or
    unparseable numerics; the load must route them, not die).

    The engine renders a customer slice as CSV with every 50th row's
    numeric balance replaced by a non-numeric token, reads it back
    under an explicit schema + PERMISSIVE, and reports valid/
    malformed/valid-total in one pass — parse and routing both happen
    scan-side, per file split."""
    out = _csv_malformed_dir(spark, sf_dir)
    parsed = (
        spark.read.schema("c_custkey bigint, c_acctbal double, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(out)
    )
    return parsed.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_valid"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1)).alias("n_malformed"),
        F.sum(
            F.when(
                F.col("_corrupt").isNull(),
                F.col("c_acctbal").cast("decimal(24,6)"),
            )
        )
        .cast("double")
        .alias("valid_bal"),
    )


_fixed_width_memo: dict[tuple[str, str], str] = {}

# (name, width) layout of the fixed-width landing file: key 12, balance
# 14 (sign + 10.2), nation 4, segment 12 — classic mainframe-extract
# shape
_FW_LAYOUT = [
    ("c_custkey", 12),
    ("c_acctbal", 14),
    ("c_nationkey", 4),
    ("c_mktsegment", 12),
]


def _fixed_width_dir(spark: SparkSession, sf_dir: str) -> str:
    """Render customer as a fixed-width text file once per
    (app, sf_dir): every field right-padded/left-padded into its
    column slot, one line per row, no delimiters."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _fixed_width_memo:
        src = load(spark, sf_dir, "customer")
        # NULL fields render as all-space slots (concat null-propagates
        # and the text writer rejects NULL rows — a null-heavy feed
        # must still land); the parse side reads a blank slot back as
        # NULL via the trim+cast.
        line = F.concat(
            F.lpad(
                F.coalesce(F.col("c_custkey").cast("string"), F.lit("")),
                12,
                " ",
            ),
            F.lpad(
                F.coalesce(
                    F.format_number(
                        F.col("c_acctbal").cast("decimal(12,2)"), 2
                    ),
                    F.lit(""),
                ),
                14,
                " ",
            ),
            F.lpad(
                F.coalesce(F.col("c_nationkey").cast("string"), F.lit("")),
                4,
                " ",
            ),
            F.rpad(F.coalesce(F.col("c_mktsegment"), F.lit("")), 12, " "),
        )
        out = scratch_dir("uchr_fixedwidth_")
        src.select(line.alias("value")).write.mode("overwrite").text(out)
        _fixed_width_memo[key] = out
    return _fixed_width_memo[key]


@query(
    "scan_fixed_width",
    oracle="""
    SELECT c_custkey,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal,
           c_nationkey,
           c_mktsegment
    FROM customer
    """,
)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text source — the mainframe/legacy-extract format
    every long-lived ETL estate still receives (no delimiters; fields
    live at fixed byte offsets). Spark has no fixed-width reader, but
    none is needed: read as text lines and slice each field with
    ``substring`` at its layout offset — all codegen projection over
    the scan, splittable per line like any text source, and the layout
    table is the only metadata.

    The checked round-trip renders customer into the fixed-width
    layout and parses it back: key and nation as integers, the
    balance through DECIMAL(12,2) so the text rendering (2 decimal
    places, thousands separators stripped) reparses to the exact
    value, segment trimmed of its padding."""
    out = _fixed_width_dir(spark, sf_dir)
    lines = spark.read.text(out)
    offsets: list[tuple[str, int, int]] = []
    pos = 1
    for name, width in _FW_LAYOUT:
        offsets.append((name, pos, width))
        pos += width
    raw = {
        name: F.substring(F.col("value"), start, width)
        for name, start, width in offsets
    }
    # try_cast, not cast: a blank (NULL-rendered) slot must parse back
    # to NULL instead of tripping ANSI CAST_INVALID_INPUT
    return lines.select(
        F.trim(raw["c_custkey"]).try_cast("bigint").alias("c_custkey"),
        F.replace(F.trim(raw["c_acctbal"]), F.lit(","), F.lit(""))
        .try_cast("decimal(12,2)")
        .cast("double")
        .alias("c_acctbal"),
        F.trim(raw["c_nationkey"]).try_cast("int").alias("c_nationkey"),
        F.nullif(F.rtrim(raw["c_mktsegment"]), F.lit("")).alias(
            "c_mktsegment"
        ),
    )


@query(
    "scan_xml",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 200000
    """,
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in XML source/sink (native in Spark 4 — no spark-xml
    jar): render an orders slice as <row> elements, read it back with
    an EXPLICIT schema (inference would widen int-valued doubles and
    is a second full pass at scale), and round-trip typed values —
    the legacy-feed format path next to scan_text_lines' regex
    carving and scan_fixed_width. DuckDB has no XML reader, so the
    oracle checks the round-trip against the source slice, the same
    contract as the text-lines key (doubles survive because Spark
    renders shortest-round-trip decimal strings).

    Scale notes: XML files split per-FILE (a row-spanning tag can't
    be split mid-file safely), so at 100 TB the writer must emit
    many files (it does: one per task) and readers parallelise
    per-file; oversized single documents belong in the binaryFile +
    mapInPandas path instead."""
    src = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    out = scratch_dir("uchr_xml_")
    (
        src.write.format("xml")
        .option("rootTag", "orders")
        .option("rowTag", "order")
        .mode("overwrite")
        .save(out)
    )
    return spark.read.format("xml").option("rowTag", "order").schema(
        "o_orderkey bigint, o_custkey bigint, "
        "o_orderstatus string, o_totalprice double"
    ).load(out)

"""§2.8 scalar function families — one registered query per family,
each stacking several functions over corpus columns so the family is
genuinely covered, and each written to agree bit-exactly with the ANSI
equivalent in the oracle engine.

Cross-engine agreement notes baked into these shapes:

- ``dayofweek``: Spark counts 1=Sunday..7, DuckDB 0=Sunday..6 — the
  Spark side subtracts 1.
- ``last_day``/``date_trunc`` return DATE/TIMESTAMP respectively in
  both engines; DATE results are cast back to timestamp on both sides
  so pandas comparison sees one dtype.
- double→string casts are never compared (format differs); double→int
  casts only on integral-valued doubles (Spark truncates, DuckDB
  rounds — equal only when fractional part is zero).
- natural log is ``ln`` in DuckDB, ``F.log`` (one-arg) in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

# DuckDB mirror of Spark's string→BIGINT try_cast for the JSON '$.k'
# extraction: Spark accepts only optional-sign pure-digit tokens
# (after trim) and quarantines everything else to NULL — including
# fractional renderings like '50.7' / '50.0', which DuckDB's bare
# TRY_CAST would ROUND ('50.7' → 51) instead. The regexp guard pins
# the Spark domain so a fractional payload is one NULL cell on both
# engines (round-11 fractional-k axis; empirically:
# Spark try_cast('50.7' AS BIGINT) IS NULL, DuckDB = 51).
JSON_K_BIGINT_SQL = """TRY_CAST(
             CASE WHEN props IS NOT NULL AND json_valid(props)
                       AND regexp_matches(
                             trim(json_extract_string(props, '$.k')),
                             '^[+-]?[0-9]+$')
                  THEN json_extract_string(props, '$.k') END
             AS BIGINT)"""


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_type)                                   AS type_upper,
           lower(p_name)                                   AS name_lower,
           trim(concat('  ', p_name, '  '))                AS name_trimmed,
           substring(p_name, 1, 8)                         AS name_prefix,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           CAST(length(p_name) AS INTEGER)                 AS name_len,
           replace(p_name, 'a', '@')                       AS name_replaced,
           string_split(p_name, ' ')[1]                    AS first_word,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function battery (concat, substring, trim, pad, case,
    instr...) — all JVM codegen expressions, zero UDFs."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_name").alias("name_lower"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_replaced"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)      AS yr,
           CAST(month(o_orderdate) AS INTEGER)     AS mth,
           CAST(day(o_orderdate) AS INTEGER)       AS dom,
           CAST(quarter(o_orderdate) AS INTEGER)   AS qtr,
           date_trunc('month', o_orderdate)        AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                AS INTEGER)                        AS days_to_y2k,
           o_orderdate + INTERVAL 7 DAY            AS ship_by,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/timestamp scalar battery (trunc, datediff, add_months,
    extract...) under the pinned UTC session zone."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(od).alias("yr"),
        F.month(od).alias("mth"),
        F.dayofmonth(od).alias("dom"),
        F.quarter(od).alias("qtr"),
        F.date_trunc("month", od).cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), od.cast("date")).alias(
            "days_to_y2k"
        ),
        (od + F.expr("INTERVAL 7 DAY")).alias("ship_by"),
        F.last_day(od).cast("timestamp_ntz").alias("month_end"),
        (F.dayofweek(od) - F.lit(1)).alias("dow"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT s_suppkey,
           abs(s_acctbal)                                   AS abs_bal,
           CAST(sign(s_acctbal) AS DOUBLE)                  AS sign_bal,
           floor(s_acctbal)                                 AS floor_bal,
           ceil(s_acctbal)                                  AS ceil_bal,
           sqrt(abs(s_acctbal))                             AS sqrt_bal,
           pow(CAST(s_nationkey AS DOUBLE), 2)              AS nk_sq,
           greatest(s_acctbal, 0)                           AS pos_part,
           least(s_acctbal, 0)                              AS neg_part
    FROM supplier
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar battery (round, bround, abs, sign, log/exp, trig...)
    with deterministic result shaping for hash comparison."""
    s = load(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.abs(bal).alias("abs_bal"),
        F.signum(bal).alias("sign_bal"),
        F.floor(bal).cast("double").alias("floor_bal"),
        F.ceil(bal).cast("double").alias("ceil_bal"),
        F.sqrt(F.abs(bal)).alias("sqrt_bal"),
        F.pow(F.col("s_nationkey").cast("double"), F.lit(2)).alias("nk_sq"),
        F.greatest(bal, F.lit(0).cast("double")).alias("pos_part"),
        F.least(bal, F.lit(0).cast("double")).alias("neg_part"),
    )


@query(
    "fn_math_libm",
    oracle="""
    SELECT s_suppkey,
           CAST(floor(ln(abs(CAST(s_acctbal AS DOUBLE)) + 1) * 1000000)
                AS BIGINT) AS ln_bal_micro,
           CAST(floor(log10(abs(CAST(s_acctbal AS DOUBLE)) + 1) * 1000000)
                AS BIGINT) AS log10_bal_micro,
           CAST(floor(exp(s_nationkey / 10.0) * 1000000)
                AS BIGINT) AS exp_nk_micro,
           CAST(round(CAST(s_acctbal AS DECIMAL(12,2)), 1)
                AS DECIMAL(12,1)) AS bal_round1
    FROM supplier
    """,
)
def fn_math_libm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental / rounding functions.

    ``ln``/``log10``/``exp`` are libm-backed and not correctly-rounded,
    so Java (Spark) and C (DuckDB) raw doubles can differ in the last
    ulp (observed maxdiff ~9e-16 relative). The CHECKED output
    quantizes to microscale integers (floor(x*1e6)): a cross-engine
    disagreement would need a value within ~1e-15·x of a 1e-6 grid
    boundary — absent on this data (verified at every SF), and any
    future flake would surface as an off-by-one, not a silent pass.
    Rounding is cast to DECIMAL(12,2) BEFORE the round on both sides
    (acctbal is cents-valued so the cast is exact), then rounded on
    the decimal type where both engines define HALF_UP ties —
    round(double, n) would diverge on representational ties."""
    s = load(spark, sf_dir, "supplier")
    bal_d = F.col("s_acctbal").cast("double")
    return s.select(
        "s_suppkey",
        F.floor(F.log(F.abs(bal_d) + F.lit(1)) * 1e6)
        .cast("bigint")
        .alias("ln_bal_micro"),
        F.floor(F.log10(F.abs(bal_d) + F.lit(1)) * 1e6)
        .cast("bigint")
        .alias("log10_bal_micro"),
        F.floor(F.exp(F.col("s_nationkey") / F.lit(10.0)) * 1e6)
        .cast("bigint")
        .alias("exp_nk_micro"),
        F.round(F.col("s_acctbal").cast("decimal(12,2)"), 1)
        .cast("decimal(12,1)")
        .alias("bal_round1"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END                             AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'B')  AS seg_or_b,
           nullif(c_nationkey, 0)                           AS nk_nonzero,
           ifnull(nullif(c_mktsegment, 'MACHINERY'), 'M')   AS seg_or_m
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression battery: CASE WHEN, coalesce, nullif,
    nvl/nvl2, least/greatest."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "negative")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("B")).alias(
            "seg_or_b"
        ),
        F.nullif("c_nationkey", F.lit(0)).alias("nk_nonzero"),
        F.ifnull(F.nullif("c_mktsegment", F.lit("MACHINERY")), F.lit("M")).alias(
            "seg_or_m"
        ),
    )


@query(
    "fn_array",
    oracle="""
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS INTEGER)       AS n_tokens,
           CAST(list_contains(string_split(d.text, ' '), 'join')
                AS INTEGER)                                      AS has_join,
           list_sort(string_split(d.text, ' '))[1]               AS first_sorted,
           array_to_string(string_split(d.text, ' ')[1:3], ' ')  AS first3,
           CAST(len(e.embedding) AS INTEGER)                     AS emb_dim,
           CAST(e.embedding[1] AS DOUBLE)                        AS emb_first
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery (transform, filter, aggregate, zip_with,
    sort_array...) — higher-order functions run as codegen lambda
    expressions, not Python."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    toks = F.split(F.col("text"), " ")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "join").cast("int").alias("has_join"),
        F.element_at(F.sort_array(toks), 1).alias("first_sorted"),
        F.array_join(F.slice(toks, 1, 3), " ").alias("first3"),
        F.size("embedding").alias("emb_dim"),
        F.element_at("embedding", 1).cast("double").alias("emb_first"),
    )


@query(
    "fn_map",
    oracle=f"""
    SELECT event_id,
           concat('k=',
                  coalesce(CAST({JSON_K_BIGINT_SQL} AS VARCHAR), 'null'),
                  ',uid=', coalesce(CAST(user_id AS VARCHAR), 'null')
           ) AS props_map,
           'k,uid' AS keys,
           {JSON_K_BIGINT_SQL} AS k_val
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction/access. Map iteration order is engine-specific,
    so the CHECKED projection serialises entries in sorted-key order
    (k=…,uid=…) — the map_from_entries/map_keys/element_at machinery is
    still the surface under test, but the result carries only scalar
    columns any order-insensitive hasher can digest.

    The map is bound ONCE via a single-element-array lambda (the
    llm/text.py trick): referenced naively from five output
    expressions, CollapseProject inlines the whole map construction —
    including the get_json_object JSON parse — into every reference
    (measured 2.4 s → 1.6 s cold at sf0.1 from eliminating the ~6×
    re-parse per row).

    The k value is ``try_cast`` (round-10 hostile-props sweep: a
    mistyped payload value threw mid-scan under ANSI) and the oracle
    guards with ``json_valid`` — the same quarantine contract as
    fn_json."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr(
            """
            transform(
              array(map_from_entries(array(
                named_struct('key', 'k',
                             'value', try_cast(get_json_object(props, '$.k')
                                               AS BIGINT)),
                named_struct('key', 'uid', 'value', user_id)))),
              m -> struct(
                array_join(
                  transform(array_sort(map_keys(m)),
                    kk -> concat(kk, '=',
                                 coalesce(CAST(element_at(m, kk) AS STRING),
                                          'null'))), ',') AS props_map,
                array_join(array_sort(map_keys(m)), ',') AS keys,
                element_at(m, 'k') AS k_val))[0]
            """
        ).alias("s"),
    ).select("event_id", "s.props_map", "s.keys", "s.k_val")


@query(
    "fn_json",
    oracle=f"""
    SELECT event_id,
           {JSON_K_BIGINT_SQL} AS k_num,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           TRY_CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                         THEN json_extract_string(props, '$.missing') END
                    AS BIGINT) AS k_missing
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction with NULL-quarantine semantics, the
    schema-on-read contract event payloads need: ``get_json_object``
    already returns NULL for malformed JSON / non-object roots /
    missing paths, and the numeric casts are ``try_cast`` so a
    mistyped value (``"k": true``, ``"k": "12abc"``, an integer past
    int64) quarantines to NULL instead of throwing mid-scan under
    ANSI — the round-10 hostile-props sweep found the plain cast
    KILLING the job on one boolean payload. The oracle guards every
    extraction with ``json_valid`` because DuckDB's json_* RAISE on
    malformed input where get_json_object is lenient. Value-domain
    notes (hostile-props sweep, pinned in
    tests/test_hostile_props_corpus.py): duplicate JSON keys resolve
    to the FIRST occurrence on both engines; integer literals beyond
    uint64 (and float literals) have engine-specific ``k_str``
    renderings — Spark preserves the lexical token while DuckDB's
    JSON reader normalises through double — so they are outside the
    checked string-rendering domain (tripwire-pinned). The k_num
    cast domain IS checked for fractional payloads (round-11 axis):
    Spark's string try_cast NULLs any non-pure-integer token
    ('50.7', '50.0') where DuckDB's TRY_CAST rounds ('50.7' → 51),
    so the oracle's ``JSON_K_BIGINT_SQL`` regexp-guards the cast to
    the Spark-accepted integer-token domain."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k")
        .try_cast("bigint")
        .alias("k_num"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing")
        .try_cast("bigint")
        .alias("k_missing"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                          AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT)          AS key_roundtrip,
           CAST(o_orderkey AS DOUBLE)                           AS key_dbl,
           CAST(o_orderstatus = 'F' AS INTEGER)                 AS is_f,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)         AS od_day,
           CAST('2024-06-01 12:30:00' AS TIMESTAMP)             AS fixed_ts
    FROM orders
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast matrix across numeric/string/date/timestamp plus try_cast NULL-
    on-overflow semantics, ANSI-safe on both engines."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        (F.col("o_orderstatus") == "F").cast("int").alias("is_f"),
        F.col("o_orderdate").cast("date").cast("timestamp_ntz").alias("od_day"),
        F.lit("2024-06-01 12:30:00").cast("timestamp_ntz").alias("fixed_ts"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           sha256(concat_ws('|', lang, text)) AS text_sha,
           md5(text)                          AS text_md5
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic row hashes — the dedup building block."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.concat_ws("|", "lang", "text"), 256).alias("text_sha"),
        F.md5("text").alias("text_md5"),
    )


@query(
    "fn_hash_xx",
    oracle="""
    SELECT doc_id,
           CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS n_same_hash,
           TRUE AS seed_changes_hash
    FROM documents
    """,
)
def fn_hash_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 — Spark-native 64-bit hash (the hash the MinHash
    signatures build on). Raw values have no DuckDB twin, so the
    CHECKED output is the two properties a partitioner/dedup pipeline
    actually relies on: hash-equality classes coincide with
    text-equality classes on this corpus (n_same_hash per doc equals
    the oracle's per-text group size — a collision would inflate it),
    and seeding changes the hash (a seed collision would flip the
    boolean). Both collapse to text-derivable values on the oracle
    side."""
    d = load(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        F.xxhash64("text").alias("xx"),
        F.xxhash64("text", F.lit(1)).alias("xx_seed1"),
    )
    w = Window.partitionBy("xx")
    return hashed.select(
        "doc_id",
        F.count("*").over(w).alias("n_same_hash"),
        (F.col("xx") != F.col("xx_seed1")).alias("seed_changes_hash"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^([a-z]+)', 1)            AS first_word,
           regexp_replace(text, '[aeiou]', '', 'g')        AS devoweled,
           CAST(regexp_matches(text, 'data') AS INTEGER)   AS has_data,
           CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS n_spaces
    FROM documents WHERE doc_id < 200
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract / global replace / match / count-matches.

    Patterns stay in the portable common subset of Java regex and RE2
    (character classes, literals, capture groups) so both engines
    interpret them identically. Spark's regexp_replace is global by
    default — the oracle needs DuckDB's explicit 'g' option.

    has_data is emitted as INT (1/0/NULL), not BOOLEAN: a NULL text
    yields a NULL predicate, and NULL BOOLEAN is the one dtype whose
    null rendering splits the comparator frames (Spark toPandas →
    None object cell, DuckDB .df() → NaN object cell) — found by the
    round-11 CSV-fidelity full-registry sweep, the first hostile
    corpus to put NULL text through this key. Nullable INT nulls are
    engine-neutral (both frames → float64 NaN). The rule: nullable
    predicates in CHECKED outputs are INTs; booleans are fine only
    when non-null by construction."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"[aeiou]", "").alias("devoweled"),
        F.col("text").rlike("data").cast("int").alias("has_data"),
        F.size(F.regexp_extract_all("text", F.lit(" "), 0))
        .cast("bigint")
        .alias("n_spaces"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & l_partkey AS b_and,
           l_orderkey | l_partkey AS b_or,
           xor(l_orderkey, l_partkey) AS b_xor,
           l_linenumber << 3 AS b_shl,
           l_orderkey >> 2 AS b_shr,
           CAST(bit_count(l_partkey) AS INTEGER) AS b_popcount
    FROM lineitem WHERE l_orderkey % 7 = 0
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor, shifts, popcount — the building
    blocks the sketch operators (SimHash banding, HLL) rely on."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 7 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.col("l_partkey")).alias("b_and"),
        F.col("l_orderkey").bitwiseOR(F.col("l_partkey")).alias("b_or"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_partkey")).alias("b_xor"),
        F.shiftleft(F.col("l_linenumber"), 3).alias("b_shl"),
        F.shiftright(F.col("l_orderkey"), 2).alias("b_shr"),
        F.bit_count(F.col("l_partkey")).cast("int").alias("b_popcount"),
    )


@query(
    "fn_encode",
    oracle="""
    SELECT p_partkey,
           to_base64(CAST(p_name AS BLOB)) AS b64,
           lower(hex(p_name)) AS hexed,
           CAST(from_base64(to_base64(CAST(p_name AS BLOB))) AS VARCHAR)
             AS roundtrip
    FROM part WHERE p_partkey % 10 = 0
    """,
)
def fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encode/decode family: base64 and hex over UTF-8 bytes,
    with a decode round-trip (the wire-format plumbing under opaque
    binary columns — see multimodal_binary)."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") % 10 == 0)
    return p.select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("b64"),
        F.lower(F.hex("p_name")).alias("hexed"),
        F.unbase64(F.base64(F.col("p_name").cast("binary")))
        .cast("string")
        .alias("roundtrip"),
    )


@query(
    "fn_struct",
    oracle="""
    WITH nested AS (
      SELECT o_orderkey,
             {'cust': o_custkey, 'price': o_totalprice,
              'prio': o_orderpriority} AS o
      FROM orders WHERE o_totalprice > 470000
    )
    SELECT o_orderkey, o.cust AS cust, o.price AS price,
           upper(o.prio) AS prio_uc
    FROM nested
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType build + field access: pack columns into a nested
    struct, then project fields back out (the shape every nested
    parquet/JSON schema round-trips through). Catalyst collapses the
    pack/unpack — the executed plan reads the flat columns directly."""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 470000)
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("prio"),
        ).alias("o"),
    )
    return nested.select(
        "o_orderkey",
        F.col("o.cust").alias("cust"),
        F.col("o.price").alias("price"),
        F.upper(F.col("o.prio")).alias("prio_uc"),
    )


@query(
    "fn_array_lambda",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id % 5 = 0
    )
    SELECT doc_id,
           CASE WHEN toks IS NULL THEN NULL
                ELSE coalesce(array_to_string(
                     list_transform(list_filter(toks, x -> len(x) > 3),
                                    x -> upper(x)), ' '), '') END
             AS long_upper,
           CASE WHEN toks IS NULL THEN NULL
                ELSE CAST(list_reduce(list_prepend(0,
                     list_transform(toks, x -> len(x))), (a, b) -> a + b)
                  AS BIGINT) END AS total_chars,
           CAST(len(list_filter(toks, x -> x LIKE '%e%')) AS BIGINT)
             AS n_with_e
    FROM t
    """,
)
def fn_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as first-class surface: transform /
    filter / aggregate lambdas run inside codegen on the in-row array —
    the zero-shuffle way to process nested data (the explode
    alternative multiplies rows through a Generate + later re-group).

    Degenerate-input contract (empty-text gate + round-9 ADVICE):
    an EMPTY filtered list joins to '' on both engines (Spark's
    array_join([]) is '' natively; DuckDB's array_to_string([]) is
    NULL, coalesced oracle-side), while a NULL text NULL-propagates
    through every column on both engines — the oracle guards both its
    coalesce AND its list_prepend(0, ...) reduce seed with an explicit
    `toks IS NULL` arm, because DuckDB's list_prepend(0, NULL) is [0]
    (reduces to 0) where Spark's aggregate(NULL, ...) is NULL.

    Case-mapping scope (round-11 special-casing sweep, pinned in
    tests/test_special_casing_corpus.py): long_upper's checked
    equality holds for SIMPLE-CASE text — ASCII and accented Latin,
    where JVM and DuckDB upper() agree, which covers every driver
    corpus. Outside it they genuinely differ and no DuckDB built-in
    bridges the gap: Java applies Unicode FULL uppercase mappings
    (straße → STRASSE, the ﬁ ligature → FI) while DuckDB applies
    SIMPLE 1:1 mappings (→ STRAẞE, ﬁ unchanged). The full mapping IS
    the product semantics — same declared-scope contract as
    agg_fold_ci_groups."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter(toks, lambda x: F.length(x) > 3), lambda x: F.upper(x)
            ),
            " ",
        ).alias("long_upper"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(toks, lambda x: x.like("%e%")))
        .cast("bigint")
        .alias("n_with_e"),
    )


@query(
    "fn_variant",
    oracle="""
    WITH v AS (
      SELECT event_id, value,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                       AND len(json_keys(props)) =
                           len(list_distinct(json_keys(props)))
                       AND len(list_filter(json_keys(props),
                             kk -> json_type(props, '$."' || kk || '"')
                                     = 'OBJECT'
                               AND len(json_keys(props,
                                       '$."' || kk || '"')) <>
                                   len(list_distinct(json_keys(props,
                                       '$."' || kk || '"'))))) = 0
                  THEN props END AS jp
      FROM events
    ),
    x AS (
      SELECT event_id, value,
             json_type(jp, '$.k')           AS k_type,
             json_extract_string(jp, '$.k') AS k_raw
      FROM v
    ),
    typed AS (
      SELECT event_id, value,
             CASE WHEN k_type = 'BOOLEAN'
                  THEN CASE WHEN k_raw = 'true' THEN 1 ELSE 0 END
                  WHEN k_type = 'DOUBLE'
                  THEN TRY_CAST(trunc(TRY_CAST(k_raw AS DOUBLE))
                                AS BIGINT)
                  WHEN k_type = 'VARCHAR'
                       AND NOT regexp_matches(trim(k_raw),
                                              '^[+-]?[0-9]+$')
                  THEN NULL
                  ELSE TRY_CAST(k_raw AS BIGINT) END AS k_num,
             CASE WHEN k_type = 'BOOLEAN'
                  THEN CASE WHEN k_raw = 'true' THEN 1.0 ELSE 0.0 END
                  ELSE TRY_CAST(k_raw AS DOUBLE) END AS k_dbl
      FROM x
    )
    SELECT event_id, k_num, k_dbl + value AS k_plus_value,
           CAST(NULL AS BIGINT) AS k_missing
    FROM typed WHERE k_num >= 50
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data:
    ``try_parse_json`` ONCE into a binary variant column, then typed
    ``try_variant_get`` extractions. Unlike ``get_json_object``
    (fn_json), which re-parses the JSON string per access, the
    variant encoding is parsed once and each extraction is a cheap
    binary probe — the difference between O(fields × parse) and
    O(parse + fields) per row, which at 100 TB of event payloads is
    the dominant cost of the ingest scan.

    Quarantine semantics (round-10 hostile-props sweep): the try_
    variants return NULL for malformed JSON, missing paths, and
    un-castable values instead of erroring — ``parse_json`` proper
    KILLED the scan on the first truncated payload. Variant typing
    is mirrored in the oracle, because a JSON-string oracle is
    untyped where variant is typed: (a) a BOOLEAN k casts to 1/0
    under variant rules while TRY_CAST('true' AS BIGINT) is NULL —
    the oracle switches on ``json_type``; (b) Spark's variant parser
    REJECTS duplicate object keys at ANY depth (try_parse_json →
    NULL variant) while DuckDB keeps the first — the oracle
    quarantines rows with duplicate ``json_keys`` at the top level OR
    one object level down (depth ≤ 2 covers the swept corpus;
    duplicates nested deeper or inside arrays-of-objects are outside
    the checked domain, tripwire-pinned in
    tests/test_hostile_props_corpus.py); (c) a DOUBLE k casts to
    BIGINT by TRUNCATION
    toward zero under variant rules (50.7 → 50, -50.7 → -50,
    overflow → NULL) while DuckDB's TRY_CAST of the string rendering
    ROUNDS ('50.7' → 51) — the oracle adds a ``trunc``-through-DOUBLE
    arm; and a VARCHAR k that is not a pure optional-sign integer
    token ('50.7') is NULL under variant string→bigint rules while
    DuckDB rounds — the oracle regexp-guards the VARCHAR arm
    (round-11 fractional-k axis, pinned in
    tests/test_hostile_props_corpus.py)."""
    e = load(spark, sf_dir, "events").withColumn(
        "pv", F.try_parse_json("props")
    )
    return e.select(
        "event_id",
        F.try_variant_get("pv", "$.k", "bigint").alias("k_num"),
        (F.try_variant_get("pv", "$.k", "double") + F.col("value")).alias(
            "k_plus_value"
        ),
        F.try_variant_get("pv", "$.missing", "bigint").alias("k_missing"),
    ).where(F.col("k_num") >= 50)


@query(
    "fn_interval",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 3 DAY     AS plus_3d,
           ts - INTERVAL 90 MINUTE AS minus_90m,
           ts + INTERVAL 1 MONTH   AS plus_1mo
    FROM events WHERE event_id < 1000
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic on timestamps. Month addition
    clamps to month-end identically in Spark and DuckDB (Jan 31 + 1
    month = Feb 29 in 2024)."""
    e = load(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("plus_3d"),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTES")).alias("minus_90m"),
        (F.col("ts") + F.expr("INTERVAL 1 MONTH")).alias("plus_1mo"),
    )


@query(
    "fn_url",
    oracle="""
    WITH urls AS (
      SELECT c_custkey,
             'https://shard' || (c_custkey % 50) ||
             '.example.com/seg/' || c_custkey ||
             '?seg=' || c_mktsegment || '&v=2' AS url
      FROM customer
    )
    SELECT c_custkey,
           regexp_extract(url, '^https://([^/]+)/', 1)    AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1)             AS query,
           regexp_extract(url, '[?&]seg=([^&]*)', 1)      AS seg_param,
           'https'                                        AS protocol
    FROM urls
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL dissection with Spark's native parse_url — host, path, full
    query string, one named query parameter, protocol. Web-scraped
    training corpora lean on this for source bucketing and tracking
    canonicalisation; parse_url is JVM codegen (java.net.URI), so the
    whole dissection rides the scan. The corpus has no URL column, so
    the query first renders a deterministic URL per customer (both
    engines build the identical string); DuckDB mirrors the
    dissection with anchored regexes."""
    c = load(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://shard"),
        F.col("c_custkey") % 50,
        F.lit(".example.com/seg/"),
        F.col("c_custkey"),
        F.lit("?seg="),
        F.col("c_mktsegment"),
        F.lit("&v=2"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("seg")).alias("seg_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_decimal_exact",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
             AS price_dec,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_quantity AS DECIMAL(4,1)) AS DECIMAL(18,3))
                AS DOUBLE) AS line_total,
           CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))) AS BIGINT)
             AS price_floor,
           CAST(ceil(CAST(l_extendedprice AS DECIMAL(12,2))) AS BIGINT)
             AS price_ceil,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                - CAST(l_discount AS DECIMAL(4,3)) AS DECIMAL(13,3))
                AS DOUBLE) AS price_less_disc
    FROM lineitem WHERE l_orderkey % 11 = 0
    """,
)
def fn_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic semantics: double→DECIMAL cast,
    decimal×decimal with widened precision/scale, decimal subtraction
    at mixed scales, floor/ceil to integers.

    Why the casts are safe to oracle-check: a half-way tie at scale 2
    (…xx5 exactly) has denominator 200 ∤ 2^k, so no IEEE double can
    hit one — Spark's HALF_UP and DuckDB's rounding agree on every
    representable input. The products/differences then stay in exact
    decimal, the money-math substrate every financial rollup in the
    engine builds on (see exprs.dec_sum); the final cast back to
    double is the comparison boundary only (scale ≤3 values are far
    inside double's exact range), the arithmetic itself is decimal."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 11 == 0)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    qty = F.col("l_quantity").cast("decimal(4,1)")
    disc = F.col("l_discount").cast("decimal(4,3)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        price.cast("double").alias("price_dec"),
        (price * qty).cast("decimal(18,3)").cast("double").alias("line_total"),
        F.floor(price).cast("bigint").alias("price_floor"),
        F.ceil(price).cast("bigint").alias("price_ceil"),
        (price - disc)
        .cast("decimal(13,3)")
        .cast("double")
        .alias("price_less_disc"),
    )


@query(
    "fn_try_cast",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id AS VARCHAR)
                  WHEN doc_id % 3 = 1 THEN 'n/a'
                  ELSE CAST(doc_id AS VARCHAR) || '.75' END AS s_num,
             CASE WHEN doc_id % 2 = 0 THEN '2024-0' ||
                       CAST(1 + doc_id % 9 AS VARCHAR) || '-15'
                  ELSE 'not-a-date' END AS s_date
      FROM documents
    )
    SELECT doc_id,
           -- dialect note: DuckDB TRY_CAST('123.75' AS BIGINT) rounds
           -- to 124 where Spark (ANSI) yields NULL; the regexp guard
           -- pins the oracle to Spark's stricter semantics
           CASE WHEN regexp_matches(s_num, '^[0-9]+$')
                THEN TRY_CAST(s_num AS BIGINT) END AS as_int,
           TRY_CAST(s_num AS DOUBLE)      AS as_double,
           TRY_CAST(s_date AS TIMESTAMP)  AS as_date,
           NOT regexp_matches(s_num, '^[0-9]+$') AS int_failed
    FROM raw
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting (``try_cast``): malformed numerics/dates
    yield NULL instead of killing the job — the difference between a
    100 TB ingest that quarantines 0.1% garbage and one that dies at
    the first bad cell. Dirty strings are synthesized from doc_id so
    both engines cast the identical inputs; '123.75' → BIGINT fails
    under Spark's ANSI semantics (DuckDB would round — the oracle
    pins Spark's stricter rule with a regexp guard) while → DOUBLE
    succeeds, and the boolean flags feed a quarantine filter."""
    d = load(spark, sf_dir, "documents")
    s_num = (
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id").cast("string"))
        .when(F.col("doc_id") % 3 == 1, F.lit("n/a"))
        .otherwise(F.concat(F.col("doc_id").cast("string"), F.lit(".75")))
    )
    s_date = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("2024-0"),
            (1 + F.col("doc_id") % 9).cast("string"),
            F.lit("-15"),
        ),
    ).otherwise(F.lit("not-a-date"))
    raw = d.select("doc_id", s_num.alias("s_num"), s_date.alias("s_date"))
    return raw.select(
        "doc_id",
        F.col("s_num").try_cast("bigint").alias("as_int"),
        F.col("s_num").try_cast("double").alias("as_double"),
        F.col("s_date").try_cast("date").cast("timestamp_ntz").alias("as_date"),
        F.col("s_num").try_cast("bigint").isNull().alias("int_failed"),
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT doc_id, text AS decrypted, CAST(length(text) AS BIGINT) AS n
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption for PII-bearing columns:
    aes_encrypt → aes_decrypt (AES-128-GCM, JVM codegen) must be the
    identity — the oracle IS the plaintext, so the roundtrip is
    checked end-to-end without DuckDB needing an AES implementation.
    GCM's random IV makes ciphertext nondeterministic (correct
    crypto practice), which is exactly why the CHECKABLE surface is
    the roundtrip, not the ciphertext; at 100 TB both sides ride the
    scan with zero shuffles."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key
    enc = F.aes_encrypt(F.col("text").cast("binary"), key.cast("binary"))
    dec = F.aes_decrypt(enc, key.cast("binary"))
    return d.select(
        "doc_id",
        dec.cast("string").alias("decrypted"),
        F.length("text").cast("bigint").alias("n"),
    )


@query(
    "fn_format_string",
    oracle="""
    SELECT o_orderkey,
           printf('ORD-%08d/%s', o_orderkey, o_orderstatus) AS order_tag,
           printf('%d items @ priority %s',
                  CAST(o_orderkey % 7 AS BIGINT), o_orderpriority)
             AS summary,
           printf('%x', o_orderkey) AS key_hex
    FROM orders WHERE o_orderkey % 13 = 0
    """,
)
def fn_format_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style string templating (``format_string``) — zero-pad
    ids, compose human-readable tags, hex rendering; all JVM codegen.
    Restricted to the %d/%s/%x/%0Nd subset where Java's Formatter and
    C printf agree byte-for-byte; float %f is deliberately excluded
    (the two runtimes disagree on tie rounding — use
    format_number/round for decimals instead)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        F.format_string(
            "ORD-%08d/%s", F.col("o_orderkey"), F.col("o_orderstatus")
        ).alias("order_tag"),
        F.format_string(
            "%d items @ priority %s",
            (F.col("o_orderkey") % 7).cast("bigint"),
            F.col("o_orderpriority"),
        ).alias("summary"),
        F.format_string("%x", F.col("o_orderkey")).alias("key_hex"),
    )


@query(
    "fn_xml",
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS xk,
           o_totalprice AS xv,
           o_orderstatus AS xs
    FROM orders WHERE o_orderkey % 17 = 0
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion (Spark 4 native ``from_xml``): render each order
    as an XML record, parse it back under an explicit schema, and the
    extracted fields must equal the source columns — a roundtrip
    oracle, since DuckDB has no XML parser. Doubles survive because
    string rendering is shortest-round-trip. Everything is JVM
    codegen on the scan; at 100 TB an XML feed parses per-file-split
    like JSON/CSV."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 17 == 0)
    xml = F.concat(
        F.lit("<r><k>"),
        F.col("o_orderkey"),
        F.lit("</k><v>"),
        F.col("o_totalprice"),
        F.lit("</v><s>"),
        F.col("o_orderstatus"),
        F.lit("</s></r>"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_xml(xml, "k bigint, v double, s string").alias("x"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.k").alias("xk"),
        F.col("x.v").alias("xv"),
        F.col("x.s").alias("xs"),
    )


@query(
    "fn_explode_outer",
    oracle="""
    WITH src AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0 THEN []
                  ELSE string_split(text, ' ')[1:3] END AS toks
      FROM documents WHERE doc_id < 120
    )
    SELECT s.doc_id, u.tok
    FROM src s LEFT JOIN LATERAL (SELECT unnest(s.toks) AS tok) u ON true
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode (``explode_outer``): rows whose array
    is empty (or null) survive as a single null-element row instead of
    vanishing — the difference between "flatten the chunks" and
    "flatten the chunks but keep empty documents visible", which
    matters whenever the downstream join re-aggregates per document
    and silently losing keys is a bug. Plain explode's inner-join
    semantics is what everyone reaches for first; this key pins the
    outer variant against DuckDB's LEFT JOIN LATERAL UNNEST."""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    toks = F.when(
        F.col("doc_id") % 10 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split("text", " "), 1, 3))
    return d.select("doc_id", toks.alias("toks")).select(
        "doc_id", F.explode_outer("toks").alias("tok")
    )


@query(
    "agg_min_max_by",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rhi,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice ASC, o_orderkey)
               AS rlo
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT h.c_mktsegment,
           h.o_orderkey AS biggest_order,
           l.o_orderkey AS smallest_order
    FROM (SELECT * FROM ranked WHERE rhi = 1) h
    JOIN (SELECT * FROM ranked WHERE rlo = 1) l
      ON h.c_mktsegment = l.c_mktsegment
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic argmin/argmax per group (``max_by``/``min_by``):
    which ORDER had the extreme price per segment — the lookup
    aggregate that saves a self-join. The ordering value is a struct
    (price, key) so ties resolve identically everywhere; DuckDB's
    arg_max is scalar-only, so the oracle expresses the same thing
    with ranked windows. One partial+final aggregation, no join."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, -o_orderkey))"
        ).alias("biggest_order"),
        F.expr(
            "min_by(o_orderkey, struct(o_totalprice, o_orderkey))"
        ).alias("smallest_order"),
    )


@query(
    "fn_collation",
    oracle="""
    SELECT lower(c_mktsegment) AS seg_ci,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT lower(c_name)) AS BIGINT)
             AS n_distinct_names_ci
    FROM customer
    GROUP BY lower(c_mktsegment)
    ORDER BY seg_ci
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive collation (Spark 4 ``COLLATE UTF8_LCASE``):
    grouping and equality that ignore case WITHOUT rewriting every
    expression through lower() — the collation travels with the type,
    so comparisons, joins and aggregations all honor it. DuckDB has
    no column collations, so the oracle expresses the semantics via
    lower(); the output normalises the group key to lowercase for
    cross-engine comparability.

    Contract scope (round-9 unicode-fold sweep, pinned in
    tests/test_unicode_fold_corpus.py): the oracle equality holds for
    SIMPLE-FOLD text — ASCII and accented Latin, where both engines'
    lower() agree — which covers every driver corpus. Outside it the
    engines' case mappings genuinely differ and no DuckDB built-in
    bridges them: UTF8_LCASE lowercases İ (U+0130) to i+combining-dot
    so İstanbul ≠ istanbul, while DuckDB's lower() maps İ → i and
    MERGES the pair; Spark's lower() applies the contextual final-ς
    rule, DuckDB's does not; and neither side full-case-folds (ß stays
    apart from SS on both — consistent). The hazard classes are pinned
    as Spark-side semantic assertions plus an explicit divergence
    tripwire in the gate."""
    c = load(spark, sf_dir, "customer")
    ci = F.expr("c_mktsegment COLLATE UTF8_LCASE")
    return (
        c.groupBy(ci.alias("seg"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(F.expr("c_name COLLATE UTF8_LCASE")).alias(
                "n_distinct_names_ci"
            ),
        )
        .select(F.lower(F.col("seg")).alias("seg_ci"), "n", "n_distinct_names_ci")
        .orderBy("seg_ci")
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 50 = 0 THEN NULL
                ELSE CAST(o_totalprice / (o_orderkey % 50) AS DOUBLE)
           END AS safe_ratio,
           CASE WHEN o_orderkey % 50 = 0 THEN NULL
                ELSE CAST(CAST(o_orderkey AS BIGINT) % (o_orderkey % 50)
                          AS BIGINT)
           END AS safe_mod
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (``try_divide``/``try_mod``): division by
    a data-dependent zero yields NULL instead of failing the job
    under ANSI mode — with try_cast, the complete "never die on dirty
    data" surface. The oracle mirrors the NULL-on-zero semantics with
    CASE guards (DuckDB raises on integer division by zero)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    den = F.col("o_orderkey") % 50
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), den).alias("safe_ratio"),
        F.try_mod(F.col("o_orderkey").cast("bigint"), den)
        .cast("bigint")
        .alias("safe_mod"),
    )

"""Deterministic sampling / splitting for training-data pipelines.

Both operators derive randomness from md5 of stable row keys instead of
an RNG: the result is identical across retries, executors, engines, and
partitionings — the property a 100 TB pipeline needs for reproducible
dataset releases — and because both engines compute the same md5 hex
string, the operators are fully SQL-oracle-checked (a seeded
``sample()``/``sampleBy()`` would be engine-specific → rows-only).

Scale shape: both are one narrow map over the corpus; the stratified
variant adds one shuffle on the stratum key for the per-stratum window
(bounded state: top-N heap per stratum under codegen'd WindowExec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

STRATUM_N = 40  # per-language sample size
TEST_PREFIX = "2a"  # md5-hex threshold ≈ 16.4% test fraction


@query(
    "sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(concat(CAST(doc_id AS VARCHAR), ':',
                                   coalesce(text, ''))), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, source FROM ranked WHERE rn <= {STRATUM_N}
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-class downsample: N docs per language, chosen by
    ordering each stratum on an md5 of the row key — a uniform
    pseudo-random draw that every engine reproduces bit-for-bit.

    The text column in the salt is coalesced to '' (round 6): a NULL
    text otherwise nulls the whole md5, and the two engines then sort
    the NULL keys to OPPOSITE ends (Spark NULLS FIRST vs DuckDB NULLS
    LAST ascending) — a latent draw divergence the null-text gate
    caught. Null-free corpora draw identically to the pre-fix key."""
    d = load(spark, sf_dir, "documents")
    r = F.md5(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.coalesce(F.col("text"), F.lit("")),
        )
    )
    w = Window.partitionBy("lang").orderBy(r, "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= STRATUM_N)
        .select("doc_id", "lang", "source")
    )


@query(
    "sample_split_assign",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{TEST_PREFIX}'
                THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/test split: membership is a pure function of
    the row key (md5-hex compared against a prefix threshold), so the
    assignment survives re-runs, backfills, and engine migrations —
    no split file to persist, no RNG state."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        F.when(
            F.md5(F.col("doc_id").cast("string")) < TEST_PREFIX, "test"
        )
        .otherwise("train")
        .alias("split"),
    )


@query(
    "sample_weighted",
    oracle="""
    WITH weighted AS (
      SELECT doc_id, source,
             (1 + COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1)
                           AS BIGINT), 0) % 5)
               / 5.0 AS keep_frac,
             '0' || substr(md5(concat(CAST(doc_id AS VARCHAR), '|',
                                      coalesce(source, ''))),
                           1, 4) AS h5
      FROM documents
    )
    SELECT doc_id, source, keep_frac
    FROM weighted
    WHERE h5 < printf('%05x', CAST(floor(65536 * keep_frac) AS BIGINT))
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sampling — the data-mixing primitive behind
    every pretraining recipe ("2 epochs of wiki, 0.4 of web"): each
    source keeps a different fraction of its documents, here
    (1 + src_number % 5)/5 ∈ {0.2 … 1.0}.

    The accept test is a LEXICOGRAPHIC compare of the row's md5-hex
    prefix against the fraction's threshold — pure string algebra both
    engines reproduce bit-for-bit, no RNG, no hex→int parsing (which
    the engines expose differently). Both sides are padded to FIVE hex
    digits ('0'+prefix vs %05x): keep_frac = 1.0 makes the threshold
    65536 = '10000', which a 4-digit compare mangled — '%04x' rendered
    it as the 5-char '10000' against 4-char prefixes, and 'ffff' >
    '10000' lexicographically, so full-weight sources silently kept
    only the ~6% of docs whose prefix starts with '0'. Equal-length
    hex strings compare identically to their numeric values, so the
    pad restores accept-iff prefix < 65536·frac for every frac ≤ 1.
    One narrow map over the corpus, zero shuffles, retry-stable at any
    parallelism."""
    d = load(spark, sf_dir, "documents")
    # a source with NO numeric suffix parses to '' — under ANSI that
    # cast THROWS (the skewed-corpus gate's hot source found this);
    # try_cast + coalesce gives suffix-less sources the defined
    # weight class 0 instead of crashing the whole draw
    src_n = F.expr(
        "coalesce(try_cast(regexp_extract(source, '([0-9]+)$', 1)"
        " AS BIGINT), 0)"
    )
    keep_frac = (1 + src_n % 5) / 5.0
    # coalesce the source inside the draw hash: Spark's concat
    # NULL-propagates while DuckDB's concat SKIPS null arguments, so
    # an uncoalesced NULL source silently dropped every such doc on
    # the Spark side only (found by review on a null-source corpus —
    # the same hostile shape as the suffix-less-source crash above)
    h5 = F.concat(
        F.lit("0"),
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("|"),
                    F.coalesce(F.col("source"), F.lit("")),
                )
            ),
            1,
            4,
        ),
    )
    thr = F.format_string(
        "%05x", F.floor(65536 * keep_frac).cast("bigint")
    )
    return (
        d.withColumn("keep_frac", keep_frac)
        .where(h5 < thr)
        .select("doc_id", "source", "keep_frac")
    )


@query(
    "sample_mix_plan",
    oracle="""
    WITH stats AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1)
                           AS BIGINT), 0) + 1
                  AS BIGINT) AS raw_w
      FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(n_tokens) AS total_tokens, SUM(raw_w) AS total_w FROM stats
    )
    SELECT source, n_docs, n_tokens, raw_w,
           CAST(((tot.total_tokens // 2) * raw_w) // tot.total_w
                AS BIGINT) AS target_tokens,
           CAST(least(1000000,
                (((tot.total_tokens // 2) * raw_w) // tot.total_w) * 1000000
                  // n_tokens) AS BIGINT) AS rate_ppm
    FROM stats, tot
    """,
)
def sample_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing planner: given per-source mixing weights (here a
    deterministic function of the source id) and a total token budget
    (half the corpus), compute each source's token target and the
    per-source sampling rate (ppm) that hits it — the arithmetic a
    pretraining mix runs before sample_weighted executes the draw.

    Everything is exact integer arithmetic (floor divisions, ppm
    rates): the plan is reproducible bit-for-bit on any engine and any
    partitioning. Scale shape: one groupBy(source) with partial
    aggregation plus a one-row totals broadcast — the plan costs one
    scan regardless of corpus size."""
    d = load(spark, sf_dir, "documents")
    stats = (
        d.select(
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("nt"),
        )
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
        .withColumn(
            # try_cast: suffix-less sources weight 1, never an ANSI
            # cast crash (skewed-corpus gate finding)
            "raw_w",
            F.expr(
                "coalesce(try_cast(regexp_extract(source, '([0-9]+)$', 1)"
                " AS BIGINT), 0) + 1"
            ),
        )
    )
    tot = stats.agg(
        F.sum("n_tokens").alias("total_tokens"), F.sum("raw_w").alias("total_w")
    )
    return (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_tokens",
            F.expr("((total_tokens DIV 2) * raw_w) DIV total_w"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "raw_w",
            "target_tokens",
            F.least(
                F.lit(1000000).cast("bigint"),
                F.expr("(target_tokens * 1000000) DIV n_tokens"),
            ).alias("rate_ppm"),
        )
    )


@query(
    "sample_temperature",
    oracle="""
    WITH stats AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000)
                  AS BIGINT) AS w
      FROM stats
    ), tot AS (
      SELECT SUM(n_tokens) AS tot_tokens, SUM(w) AS tot_w FROM w
    )
    SELECT source, n_tokens,
           CAST((n_tokens * 1000000) // tot.tot_tokens AS BIGINT) AS raw_ppm,
           CAST((w * 1000000) // tot.tot_w AS BIGINT) AS temp_ppm
    FROM w, tot
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled source mix at α = 0.5 — the multilingual
    /multi-domain rebalancing rule (p_i ∝ n_i^α) every large
    pretraining recipe since mBERT/XLM-R uses to upweight low-resource
    sources without letting them dominate. Emits each source's raw
    token share and its temperature-flattened share, both in ppm.

    Determinism: the only non-integer step is sqrt(n_tokens) — IEEE
    754 requires sqrt (and the following multiply) to be correctly
    rounded, so both engines produce the identical double from the
    identical bigint, and the floor-to-micro quantization makes the
    checked value integer-exact. Weights are then pure bigint sums and
    floor divisions. Scale shape: one groupBy(source) with partial
    aggregation plus a one-row totals broadcast — identical to
    sample_mix_plan's single-scan plan."""
    d = load(spark, sf_dir, "documents")
    stats = (
        d.select("source", F.size(F.split("text", " ")).cast("bigint").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
        .withColumn(
            "w",
            F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast(
                "bigint"
            ),
        )
    )
    tot = stats.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("w").alias("tot_w")
    )
    return (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.expr("CAST((n_tokens * 1000000) DIV tot_tokens AS BIGINT)").alias(
                "raw_ppm"
            ),
            F.expr("CAST((w * 1000000) DIV tot_w AS BIGINT)").alias("temp_ppm"),
        )
    )


RESERVOIR_K = 100  # global sample size


@query(
    "sample_reservoir_hash",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    ORDER BY md5(concat('rsv:', CAST(doc_id AS VARCHAR))), doc_id
    LIMIT {RESERVOIR_K}
    """,
)
def sample_reservoir_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k uniform global sample in one distributed pass — the
    deterministic replacement for reservoir sampling: order by an md5
    of the row key and keep the k smallest. Every subset of size k is
    equally likely under the hash's uniformity, the draw is
    reproducible across retries/engines (unlike an RNG reservoir,
    whose result depends on encounter order), and the plan is a
    TakeOrderedAndProject — each partition keeps a size-k heap and the
    driver merges P heaps, so no sort or shuffle of the corpus ever
    happens. The salt ('rsv:') decorrelates this draw from other
    hash-derived samples over the same keys."""
    d = load(spark, sf_dir, "documents")
    r = F.md5(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string")))
    return (
        d.orderBy(r, "doc_id")
        .limit(RESERVOIR_K)
        .select("doc_id", "lang", "source")
    )


@query(
    "sample_class_balance",
    oracle="""
    WITH e AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL),
    cap AS (
      SELECT CAST(MIN(cnt) AS BIGINT) AS cap
      FROM (SELECT COUNT(*) AS cnt FROM e GROUP BY label)
    ),
    ranked AS (
      SELECT vec_id, label,
             row_number() OVER (
               PARTITION BY label
               ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS rn
      FROM e
    )
    SELECT vec_id, label FROM ranked CROSS JOIN cap WHERE rn <= cap
    """,
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class-balanced downsample: every label keeps
    exactly min-class-count rows — the k smallest per label by salted
    md5 (the repo's standard exact-k no-RNG draw), so the result is
    reproducible across engines and runs. The training staple before
    fitting any classifier head on skewed labels.

    Scale design: one partial+final count to find the cap (≤ |labels|
    rows, broadcast back as a 1-row scalar), then a per-label
    row_number window — the shuffle partitions by label, the rank
    heap is bounded per stratum, and no Python touches the path. A
    heavily-skewed label space would salt the window key; labels here
    are near-uniform by construction."""
    e = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("label").isNotNull())
        .select("vec_id", "label")
    )
    cap = e.groupBy("label").agg(F.count("*").alias("cnt")).agg(
        F.min("cnt").alias("cap")
    )
    w = Window.partitionBy("label").orderBy(
        F.md5(F.concat(F.lit("bal:"), F.col("vec_id").cast("string"))),
        "vec_id",
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(cap))
        .where(F.col("rn") <= F.col("cap"))
        .select("vec_id", "label")
    )


SHARD_EPOCHS = 2
SHARD_N = 8


@query(
    "sample_shard_epochs",
    oracle=f"""
    WITH assigned AS (
      SELECT CAST(e.range AS INT) AS epoch, doc_id,
             CAST(
               (strpos('0123456789abcdef',
                       substr(md5(CAST(e.range AS VARCHAR) || ':'
                                  || CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                 * 16
               + strpos('0123456789abcdef',
                        substr(md5(CAST(e.range AS VARCHAR) || ':'
                                   || CAST(doc_id AS VARCHAR)), 2, 1)) - 1
               AS INT) % {SHARD_N} AS shard
      FROM documents CROSS JOIN range(1, {SHARD_EPOCHS} + 1) e
    )
    SELECT epoch, shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM assigned GROUP BY epoch, shard
    """,
)
def sample_shard_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic reshuffling into dataloader shards: a
    doc's shard is a pure function of (epoch, doc_id) via an
    epoch-salted md5, so every epoch sees a DIFFERENT but fully
    reproducible permutation — the pattern that replaces stateful
    shuffle buffers in distributed training input pipelines (resume
    mid-epoch = recompute the function; no shuffle order to persist).

    The hex→shard map uses the first two md5 nibbles via an
    instr/strpos hex-digit lookup (engine-portable without hex→int
    casts; an ascii%16 shortcut is BIASED — 'a'-'f' collide with
    '1'-'6', double-weighting six nibble values) modulo the shard
    count; per-(epoch, shard) counts plus an id checksum make
    the full assignment value-checked without materializing it.

    Scale design: the epoch axis is an in-row literal explode (E× map
    amplification, no join); the only shuffle carries E×S count rows
    per task after map-side combine. The balance property (shards
    within a few % of n/S) is what the md5 uniformity buys — checked
    in the property suite."""
    d = load(spark, sf_dir, "documents")
    ex = d.select(
        F.explode(
            F.array(*[F.lit(e) for e in range(1, SHARD_EPOCHS + 1)])
        ).alias("epoch"),
        "doc_id",
    )
    h = F.md5(
        F.concat(
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    hexmap = "0123456789abcdef"

    def _nib(pos: int):
        return F.instr(F.lit(hexmap), F.substring(h, pos, 1)) - 1

    shard = ((_nib(1) * 16 + _nib(2)) % SHARD_N).cast("int")
    return (
        ex.withColumn("shard", shard)
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )


GROUP_KFOLD_K = 4  # folds; the grouping key is `source`


@query(
    "sample_group_kfold",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5('gkf:' || source), 1, 8))::BIGINT
               % {GROUP_KFOLD_K} AS BIGINT) AS fold
      FROM documents
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM assigned GROUP BY fold
    """,
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED k-fold assignment — the leakage-aware cross-validation
    split: the fold is a pure function of the GROUP key (`source`),
    so every document of one source lands in the same fold and a
    model can never see its validation group's siblings at train time
    (per-row splitting leaks near-duplicates and shared provenance
    across the fold boundary — the classic CV overestimate on crawl
    data). Deterministic md5 of the salted group key, no RNG state,
    identical across engines, re-runs and backfills.

    Output is the per-fold summary (docs, distinct groups, doc_id
    checksum) — the checksum makes the assignment itself
    value-checked, not just the counts; per-group disjointness across
    folds is pinned by the property test.

    Scale shape: one codegen projection (md5 of the group key — no
    join against a fold table, no shuffle of anything but the
    4-row aggregation keys after map-side combine)."""
    d = load(spark, sf_dir, "documents")
    assigned = d.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("gkf:"), F.col("source"))), 1, 8), 16, 10)
            .cast("bigint")
            % GROUP_KFOLD_K
        ).alias("fold"),
    )
    return assigned.groupBy("fold").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_groups"),
        F.sum("doc_id").alias("id_checksum"),
    )


_CAP_FLOOR = 8  # corpus-derived cap: GREATEST(floor, |docs| / 125) —
# chosen so BOTH branches fire at every test scale: at sf0.001/sf0.01
# the cap is 8 (groups of 1-7 pass through, 8-16 get capped); at sf0.1
# it is 80 (groups of 24-49 pass through, 86-112 get capped). A fixed
# literal cap would leave one branch vacuous at some scale — the
# pattern tools/vacuity_audit.py exists to catch.
_CAP_SALTS = 16


@query(
    "sample_source_cap",
    oracle=f"""
    WITH cap AS (
      SELECT GREATEST({_CAP_FLOOR}, COUNT(*) // 125) AS cap FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source, lang, CAST(rn AS BIGINT) AS rn
    FROM ranked CROSS JOIN cap
    WHERE rn <= cap
    """,
)
def sample_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the over-represented-source
    downsampler every pretraining mix runs (a crawl where one domain
    is 30% of the corpus must not be 30% of the training set): keep at
    most ``cap`` docs per (source, lang), selected by a deterministic
    md5 priority so the survivor set is stable across runs, engines,
    and partitionings. The cap itself is corpus-derived
    (max({_CAP_FLOOR}, n/125)) so capped and pass-through groups both
    exist at every test scale.

    Scale design — the naive form (one row_number window per group) is
    NOT it: group count is bounded (sources × langs) but group SIZE is
    not, and a hot domain becomes one giant window partition on one
    task. This implementation is the salted TWO-PASS exact top-cap:
    pass 1 ranks within (source, lang, md5-salt mod {_CAP_SALTS}) and
    keeps ≤cap per salt — hot groups split across {_CAP_SALTS} tasks,
    per-task frame bounded at cap rows kept; pass 2 re-ranks the
    ≤cap·{_CAP_SALTS} survivors per group — a relation bounded by
    |groups|·cap·{_CAP_SALTS} regardless of corpus size. Exact because
    the priority is a pure row function: every global top-cap member
    is necessarily in its own salt's top-cap. The oracle is the naive
    single-window form, so the equivalence of the two algorithms is
    what the hash match proves."""
    d = load(spark, sf_dir, "documents")
    n = d.agg(
        F.greatest(
            F.lit(_CAP_FLOOR), (F.count("*") / F.lit(125)).cast("bigint")
        ).alias("cap")
    )
    pri = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    salted = d.select("doc_id", "source", "lang", pri.alias("pri")).withColumn(
        "salt", F.expr(f"pmod(crc32(pri), {_CAP_SALTS})")
    )
    w1 = Window.partitionBy("source", "lang", "salt").orderBy("pri", "doc_id")
    w2 = Window.partitionBy("source", "lang").orderBy("pri", "doc_id")
    capped = salted.withColumn("rn1", F.row_number().over(w1)).crossJoin(
        F.broadcast(n)
    )
    survivors = capped.where(F.col("rn1") <= F.col("cap"))
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= F.col("cap"))
        .select("doc_id", "source", "lang", F.col("rn").cast("bigint").alias("rn"))
    )


NEG_RANDOM_K = 4  # easy negatives per doc (deterministic md5-mod draw)
NEG_HARD_K = 2  # hard negatives per doc (top co-shingle partners)
# Hot-shingle posting cap for the HARD-negative co-shingle self-join —
# the same valve as dedup_containment's CONTAINMENT_DF_CAP: a shingle
# occurring in f docs contributes f² candidate pairs, so boilerplate
# shingles (cookie banners, license headers) must be dropped from
# candidate generation BEFORE the self-join. Corpus-tuned to 6 so both
# branches provably fire at every test scale (measured max shingle df:
# 9 at sf0.001, 7 at sf0.01, 25 at sf0.1 — tests/test_properties.py
# asserts hot shingles exist above the cap); a production crawl tunes
# this up to ~10³ like CONTAINMENT_DF_CAP. Applied ONLY to hard-
# candidate generation — the near-dup EXCLUSION arm keeps exact
# uncapped Jaccard semantics (matching dedup_near), because a capped
# exclusion could let a true near-dup through as a poisoned negative.
NEG_SHINGLE_DF_CAP = 6


def _neg_oracle() -> str:
    from .dedup import _ORACLE_SHINGLED_CTE, sql_df_cap_qualify

    return f"""
    WITH {_ORACLE_SHINGLED_CTE},
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    shingle_rows AS (
      SELECT doc_id, n, unnest(toks) AS tok FROM sized
    ),
    capped AS (
      SELECT * FROM shingle_rows
      {sql_df_cap_qualify('tok', NEG_SHINGLE_DF_CAP)}
    ),
    co AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS cand,
             CAST(COUNT(*) AS BIGINT) AS inter,
             any_value(a.n) AS a_n, any_value(b.n) AS b_n
      FROM shingle_rows a JOIN shingle_rows b
        ON a.tok = b.tok AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    co_hard AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS cand,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM capped a JOIN capped b
        ON a.tok = b.tok AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    hard AS (
      SELECT doc_id, cand,
             CAST(100 + row_number() OVER (
               PARTITION BY doc_id ORDER BY inter DESC, cand) AS INT)
               AS slot
      FROM co_hard
      QUALIFY row_number() OVER (
        PARTITION BY doc_id ORDER BY inter DESC, cand) <= {NEG_HARD_K}
    ),
    easy AS (
      SELECT d.doc_id,
             CAST(('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR)
                                   || ':' || CAST(g.j AS VARCHAR)), 1, 8))
                  AS BIGINT) % nn.n AS cand,
             CAST(g.j AS INT) AS slot
      FROM documents d CROSS JOIN nn
      CROSS JOIN generate_series(1, {NEG_RANDOM_K}) AS g(j)
    ),
    cands AS (
      SELECT * FROM hard
      UNION ALL
      SELECT * FROM easy WHERE cand <> doc_id
    ),
    near AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM co AS j2
      JOIN sized a ON a.doc_id = j2.doc_id
      JOIN sized b ON b.doc_id = j2.cand
      WHERE j2.doc_id < j2.cand
        AND CAST(j2.inter AS DOUBLE) / (j2.a_n + j2.b_n - j2.inter) >= 0.8
    )
    SELECT c.doc_id, c.slot, c.cand AS neg_id
    FROM cands c
    WHERE NOT EXISTS (
      SELECT 1 FROM near p
      WHERE (p.a_id = c.doc_id AND p.b_id = c.cand)
         OR (p.a_id = c.cand AND p.b_id = c.doc_id)
    )
    """


@query("sample_contrastive_negatives", oracle=_neg_oracle())
def sample_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative pairs — the generator behind
    embedding/retrieval fine-tuning data: per anchor doc, {NEG_RANDOM_K}
    EASY negatives (deterministic md5-mod draws over the dense id
    space — reproducible, no RNG) and {NEG_HARD_K} HARD negatives (the
    anchor's top co-shingle partners — the ANN-candidate stand-ins that
    actually teach a model boundaries), with every candidate FILTERED
    against the verified near-duplicate relation: a near-dup labelled
    as a negative is a poisoned example, and this exclusion arm
    provably fires at every test scale (each near-dup doc's partner is
    its top co-shingle candidate, so the filter removes it).

    Slots: 1..{NEG_RANDOM_K} easy, 101.. hard — a training loader can
    weight the tiers separately.

    Scale shape: easy negatives are one in-row explode + hash
    projection (O(k·n), no shuffle before the exclusion join); hard
    negatives ride the shingle inverted index with every posting list
    CAPPED at df ≤ {NEG_SHINGLE_DF_CAP} before the self-join (the
    dedup_containment valve, mirrored in the oracle — a shingle in f
    docs contributes f² pairs, so uncapped, one boilerplate shingle at
    crawl scale is a 10¹²-pair blowup; capped, the join's worst case
    is |shingles|·cap² and the per-anchor top-{NEG_HARD_K} window is
    bounded by capped co-shingle degree); the near-pair exclusion is
    an anti-join against the memoized verified-pairs relation (tiny:
    |true dups|), which BROADCASTS — and deliberately UNCAPPED in the
    oracle: exclusion must keep exact near-dup semantics or a capped
    miss would admit a poisoned example."""
    from .dedup import (
        cap_hot_postings,
        dedup_near,
        shingle_rows,
        shingled_docs,
    )

    d = load(spark, sf_dir, "documents")
    nn = d.agg(F.count("*").alias("n"))
    rows = shingle_rows(spark, sf_dir)
    capped = cap_hot_postings(rows, "shingle", NEG_SHINGLE_DF_CAP)
    co = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("cand")
        )
        .agg(F.count("*").alias("inter"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("inter"), "cand")
    hard = (
        co.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= NEG_HARD_K)
        .select("doc_id", "cand", (F.col("rn") + 100).cast("int").alias("slot"))
    )
    easy = (
        d.select("doc_id")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            F.explode(
                F.array(*[F.lit(j) for j in range(1, NEG_RANDOM_K + 1)])
            ).alias("j"),
            "n",
        )
        .select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(concat('neg:',"
                " CAST(doc_id AS STRING), ':', CAST(j AS STRING))),"
                " 1, 8), 16, 10) AS BIGINT) % n"
            ).alias("cand"),
            F.col("j").cast("int").alias("slot"),
        )
        .where(F.col("cand") != F.col("doc_id"))
    )
    cands = hard.unionByName(easy)
    near = dedup_near(spark, sf_dir).select("a_id", "b_id")
    near_sym = near.unionAll(
        near.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).select(F.col("a_id").alias("doc_id"), F.col("b_id").alias("cand"))
    return (
        cands.join(F.broadcast(near_sym), ["doc_id", "cand"], "left_anti")
        .select("doc_id", "slot", F.col("cand").alias("neg_id"))
    )

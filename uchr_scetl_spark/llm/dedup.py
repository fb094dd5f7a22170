"""§2.9 deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

100 TB design notes — these four are the canonical scale ladder:

- ``dedup_exact``: hash-groupBy. One shuffle on a 64-hex key; the
  min-doc_id winner per hash is a partial+final ``min`` aggregate, so
  the shuffle carries one row per distinct hash.
- ``dedup_ngram_jaccard``: exact pairwise Jaccard is O(n²) — only ever
  run it *inside bounded candidate groups* (here: same lang × token
  -count band). At 100 TB the band join keys keep each group at
  thousands of docs, and the self-join shuffles on the band key.
- ``dedup_near`` (MinHash LSH): the unbounded-scale path. Cost is
  linear in corpus size: explode distinct shingles (map-side), one
  groupBy(doc) to fold 32 seeded xxhash64 minima into a signature, one
  groupBy(band-hash) self-join that only materialises pairs whose band
  collides. No full pairwise product ever exists. Candidates are then
  *verified* with exact Jaccard, so false positives cost compute, never
  correctness; band/row parameters trade recall for cost.
- ``dedup_simhash``: constant-size signature per doc computed with
  higher-order functions (no explode, no UDF); banding over 4×16-bit
  chunks finds candidates with Hamming distance ≤ threshold.

LSH internals hash with ``xxhash64`` (no oracle twin) → those keys are
rows-only; the exact operators are SQL-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

# MinHash runs on 3-gram SHINGLES, not tokens: the corpus draws from a
# tiny vocabulary, so token-SET Jaccard barely discriminates (22% of all
# pairs exceed 0.7), while shingle Jaccard is ~0 for unrelated docs and
# ≥0.9 for the constructed near-dups (measured: exactly the 25 true
# pairs at sf0.01 clear 0.3). 32 permutations in 8 bands of 4:
# candidate P = 1-(1-j^4)^8 → recall 0.985 at j=0.8, ~1 at j=0.9,
# and ~0 false candidates because background shingle-J ≈ 0.
N_MINHASH = 32
N_BANDS = 8
ROWS_PER_BAND = N_MINHASH // N_BANDS
JACCARD_T = 0.8
SHINGLE_N = 3
SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4


@query(
    "dedup_exact",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, lang, source,
             sha256(lower(trim(text))) AS text_sha
      FROM documents
    )
    SELECT doc_id, lang, source, text_sha
    FROM hashed
    QUALIFY row_number() OVER (PARTITION BY text_sha ORDER BY doc_id) = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-text hash; lowest doc_id survives."""
    d = load(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        "lang",
        "source",
        F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_sha"),
    )
    w = Window.partitionBy("text_sha").orderBy("doc_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "text_sha")
    )


def _band(col: F.Column, width: int = 10) -> F.Column:
    """Token-count band used to bound the pairwise candidate space."""
    return F.floor(col / F.lit(width))


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ), docs AS (
      SELECT doc_id, lang,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            for i in generate_series(1, len(t) - 2)]) AS toks,
             CAST(floor(len(t) / 10) AS BIGINT) AS band
      FROM base
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           (CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks)))) AS jaccard
    FROM docs a JOIN docs b
      ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id
    WHERE (CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks)))) >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard over bounded candidate groups
    (same lang, same token-count band)."""
    d = load(spark, sf_dir, "documents")
    docs = d.withColumn("t", F.split("text", " ")).select(
        "doc_id",
        "lang",
        shingles_expr().alias("toks"),
        _band(F.size("t")).alias("band"),
    )
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_distinct(F.concat(F.col("a.toks"), F.col("b.toks"))))
    jaccard = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(jaccard >= 0.6)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            jaccard.alias("jaccard"),
        )
    )


def shingles_expr(toks_col: str = "t", n: int = SHINGLE_N) -> F.Column:
    """Distinct word n-gram shingles over a PRE-PROJECTED token-array
    column. Two traps this shape avoids: (a) building from ``split(text)``
    inline re-evaluates the split once per output element — O(tokens²)
    per document (measured 10×+ slowdown); (b) Spark's ``sequence``
    counts backwards on a negative span, hence the short-doc guard."""
    t = toks_col
    grams = " || ' ' || ".join(
        f"element_at({t}, i + {j})" for j in range(n)
    )
    return F.expr(
        f"""
        CASE WHEN size({t}) < {n} THEN array()
        ELSE array_distinct(transform(
          sequence(1, size({t}) - {n - 1}), i -> {grams}
        )) END
        """
    )


def minhash_signatures(docs: DataFrame, n: int = N_MINHASH) -> DataFrame:
    """(doc_id, sig[0..n)) via n seeded xxhash64 minima over distinct
    shingles. One explode + one groupBy(doc_id): linear, shuffle-light
    (n partial minima per doc travel the wire, not shingles)."""
    toks = docs.withColumn("t", F.split("text", " ")).select(
        "doc_id", F.explode(shingles_expr()).alias("tok")
    )
    return toks.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("tok", F.lit(i))).alias(f"mh{i}") for i in range(n)]
    )


@query("dedup_near", tags=("rows-only",))
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    3-gram shingles → 32 seeded-xxhash64 minima → 8 bands of 4 →
    band-bucket self-join → verify candidates with exact shingle
    Jaccard ≥ 0.8. rows-only (xxhash64 banding has no oracle twin);
    the verify step guarantees zero false positives in the output.
    """
    d = load(spark, sf_dir, "documents")
    sigs = minhash_signatures(d)
    bands = sigs.select(
        "doc_id",
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
            ).alias(f"band{b}")
            for b in range(N_BANDS)
        ],
    )
    exploded = bands.select(
        "doc_id",
        F.explode(
            F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])
        ).alias("bucket"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    tok_sets = d.withColumn("t", F.split("text", " ")).select(
        "doc_id", shingles_expr().alias("toks")
    )
    verified = (
        candidates.join(
            tok_sets.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks")),
            "a_id",
        )
        .join(
            tok_sets.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks")),
            "b_id",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a_toks", "b_toks")).cast("double")
            / F.size(F.array_distinct(F.concat("a_toks", "b_toks"))),
        )
        .where(F.col("jaccard") >= JACCARD_T)
    )
    return verified.select("a_id", "b_id", "jaccard").orderBy("a_id", "b_id")


def simhash_expr(toks_sql: str) -> F.Column:
    """64-bit SimHash as 4×16-bit chunk array, pure higher-order
    functions: fold each token's xxhash64 into per-bit +1/-1 votes,
    then threshold. Constant-size state per row — no explode, no UDF.

    Written as one SQL expression because ``shiftright`` with a
    column-valued shift amount is SQL-only (the PySpark wrapper takes a
    Python int).
    """
    return F.expr(
        f"""
        transform(
          sequence(0, {SIMHASH_CHUNKS - 1}),
          c -> aggregate(
            slice(
              transform(
                aggregate(
                  {toks_sql},
                  array_repeat(0L, {SIMHASH_BITS}),
                  (acc, tok) -> zip_with(
                    acc,
                    transform(
                      sequence(0, {SIMHASH_BITS - 1}),
                      b -> CASE WHEN (shiftright(xxhash64(tok), b) & 1L) = 1L
                                THEN 1L ELSE -1L END
                    ),
                    (x, y) -> x + y
                  )
                ),
                v -> CASE WHEN v > 0L THEN 1L ELSE 0L END
              ),
              c * 16 + 1, 16
            ),
            0L,
            (acc, bit) -> acc * 2L + bit
          )
        )
        """
    )


@query("dedup_simhash", tags=("rows-only",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: pairs sharing ≥1 of 4 16-bit chunks
    (≡ guaranteed recall for Hamming distance ≤ 3), verified by exact
    Hamming distance ≤ 8 over the full 64 bits."""
    d = load(spark, sf_dir, "documents")
    sig = d.select(
        "doc_id",
        simhash_expr("array_distinct(split(text, ' '))").alias("chunks"),
    )
    exploded = sig.select(
        "doc_id",
        "chunks",
        F.posexplode("chunks").alias("chunk_pos", "chunk_val"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_pos") == F.col("b.chunk_pos"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.chunks").alias("a_chunks"),
            F.col("b.chunks").alias("b_chunks"),
        )
        .distinct()
    )
    # exact Hamming over the packed chunks via bit_count(xor)
    hamming = F.aggregate(
        F.zip_with(
            "a_chunks",
            "b_chunks",
            lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= 8)
        .select("a_id", "b_id", "hamming")
        .orderBy("a_id", "b_id")
    )

"""§2.9 multimodal columns.

``multimodal_enrich`` is the cross-modal relational core: one plan that
joins text (documents) with vectors (embeddings) and computes over both
modalities at once — SQL-checked against the oracle.

``multimodal_binary`` is the opaque-binary pipeline pattern for
image/audio payloads: a `binary` column plus typed metadata travels
through Spark untouched; decode/feature-extract runs as an
Arrow-batched ``mapInPandas`` stage. Image decode is REAL whenever PIL
is importable (per-row dispatch with a deterministic byte-statistics
fallback for undecodable payloads or decoder-less environments — this
container has no imaging libraries, so the fallback runs here); the
contract test proves both branches with a hand-built valid PNG. The
Spark-side plumbing — schema, binary handling, batch iteration,
partition parallelism — is identical either way. Audio/video decode
(librosa/cv2) would gate into ``_decode_batch.feats`` the same way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..io import load
from ..registry import query
from .similarity import COS_CONFORM_SQL, cosine_expr, sql_cosine


@query(
    "multimodal_enrich",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL
    )
    SELECT d.doc_id, d.lang, d.source, e.label,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(list_contains(string_split(d.text, ' '), 'join')
                AS INTEGER) AS mentions_join,
           sqrt(list_dot_product(e.v, e.v)) AS emb_norm,
           CAST(e.v[1] AS DOUBLE) AS emb_first
    FROM documents d JOIN e ON d.doc_id = e.vec_id
    WHERE d.n_chars > 100
    """,
)
def multimodal_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text + vector in one row: join documents to embeddings, compute
    token stats (text modality) and norms (vector modality) in a single
    plan — the 'one table, many modalities' shape."""
    d = load(spark, sf_dir, "documents").where(F.col("n_chars") > 100)
    e = load(spark, sf_dir, "embeddings").where(F.col("embedding").isNotNull()).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    toks = F.split("text", " ")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "source",
        "label",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_contains(toks, "join").cast("int").alias("mentions_join"),
        F.sqrt(F.expr("aggregate(zip_with(v, v, (x,y) -> x*y), 0D, (acc,x) -> acc+x)")).alias(
            "emb_norm"
        ),
        F.element_at("v", 1).alias("emb_first"),
    )


@query(
    "multimodal_crossmodal_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE {COS_CONFORM_SQL}
    ), langs AS (
      SELECT d.lang, d.doc_id, e.v
      FROM documents d JOIN e ON d.doc_id = e.vec_id
    ), probes AS (
      SELECT lang AS probe_lang, doc_id AS probe_doc, v AS pv
      FROM langs WHERE doc_id < 3
    )
    SELECT p.probe_doc, l.lang, l.doc_id,
           {sql_cosine('p.pv', 'l.v')} AS cosine
    FROM probes p JOIN langs l ON l.doc_id <> p.probe_doc
    QUALIFY row_number() OVER (PARTITION BY p.probe_doc, l.lang
                               ORDER BY {sql_cosine('p.pv', 'l.v')} DESC,
                                        l.doc_id) <= 2
    """,
)
def multimodal_crossmodal_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval shape: for each probe document, the top-2
    most vector-similar documents *per language* (text metadata drives
    the grouping, vectors drive the ranking).

    Norms are projected ONCE per vector before the probes×corpus
    product (the sim_topk pattern): a per-pair cosine_expr would
    re-fold dot(pv,pv) and dot(v,v) for every pair — 3× the
    interpreted HOF work on the quadratic relation. The division
    dot/(pnrm·nrm) is the identical IEEE op tree the oracle's
    per-pair cosine evaluates, so values stay bit-equal."""
    from pyspark.sql import Window

    from .similarity import cos_conform, dot_expr

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings").where(cos_conform()).withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    langs = d.join(e, d.doc_id == e.vec_id).select(
        "lang", "doc_id", "v", F.sqrt(dot_expr("v", "v")).alias("nrm")
    )
    probes = langs.where(F.col("doc_id") < 3).select(
        F.col("lang").alias("probe_lang"),
        F.col("doc_id").alias("probe_doc"),
        F.col("v").alias("pv"),
        F.col("nrm").alias("pnrm"),
    )
    scored = (
        F.broadcast(probes)
        .join(langs, F.col("doc_id") != F.col("probe_doc"))
        .select(
            "probe_doc",
            "lang",
            "doc_id",
            (dot_expr("pv", "v") / (F.col("pnrm") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("probe_doc", "lang").orderBy(
        F.col("cosine").desc(), "doc_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("probe_doc", "lang", "doc_id", "cosine")
    )


# ---------------------------------------------------------------------------
# opaque-binary pipeline (image/audio pattern, decode stubbed)
# ---------------------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_first", DoubleType()),
    ]
)


try:  # the real decode path activates the moment the lib exists
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def _image_stats(b: bytes) -> tuple[float, float]:
    """REAL image decode (PIL): mean and first pixel of the grayscale
    -converted image — raises on payloads that aren't valid images."""
    import io

    img = _PILImage.open(io.BytesIO(bytes(b))).convert("L")
    px = list(img.getdata())
    return float(sum(px) / len(px)), float(px[0])


def _byte_stats(b: bytes) -> tuple[float, float]:
    """Fallback features when no decoder applies: deterministic byte
    statistics (stable for the rows-only check, shape-identical to the
    pixel path)."""
    if not len(b):
        return 0.0, 0.0
    return float(sum(b) / len(b)), float(b[0])


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-Arrow-batch decode. Dispatch per row: image payloads decode
    FOR REAL when PIL is importable (pixel mean/first), anything
    undecodable — wrong media_type, invalid bytes, or no decoder in
    the image — falls back to byte statistics. The synthetic corpus
    payloads are md5-derived bytes, not valid images, so the checked
    key's output is identical with and without PIL; the contract test
    (tests/test_multimodal_decode.py) proves BOTH branches with a
    hand-built valid PNG."""

    def feats(media_type, b) -> tuple[float, float]:
        # NULL media_type / payload reach the worker as None: guard
        # BOTH branches, not just the fallback one this container
        # exercises — None.startswith would crash exactly when PIL is
        # present, the branch the gate exists to activate
        if b is None:
            return 0.0, 0.0
        if HAVE_PIL and media_type and media_type.startswith("image/"):
            try:
                return _image_stats(b)
            except Exception:  # not a decodable image → fallback
                pass
        return _byte_stats(b)

    pairs = [
        feats(mt, b)
        for mt, b in zip(pdf["media_type"], pdf["payload"])
    ]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "byte_len": pdf["payload"].map(
                lambda b: 0 if b is None else len(b)
            ).astype("int32"),
            "feat_mean": [p[0] for p in pairs],
            "feat_first": [p[1] for p in pairs],
        }
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Arrow-batched decode stage over (doc_id, media_type, payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df.mapInPandas(run, DECODED_SCHEMA)


def _synthetic_media(d: DataFrame) -> DataFrame:
    """Deterministic stand-in media relation shared by the binary and
    resize keys: (doc_id, even/odd media type, md5-derived 16-byte
    payload). One definition so the payload derivation can never drift
    between the keys. Null texts are quarantined upstream, matching
    what a real pipeline does before its decode stage."""
    return d.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image/png")
        .otherwise("audio/wav")
        .alias("media_type"),
        F.to_binary(F.md5("text"), F.lit("hex"))
        .cast(BinaryType())
        .alias("payload"),
    )


@query(
    "multimodal_binary",
    oracle="""
    WITH m AS (
      SELECT doc_id, md5(text) AS h,
             CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                  ELSE 'audio/wav' END AS media_type
      FROM documents WHERE text IS NOT NULL
    ), bytes AS (
      SELECT doc_id, media_type,
             [('0x' || substring(h, 2*i-1, 2))::INT
              for i in generate_series(1, 16)] AS bs
      FROM m
    )
    SELECT doc_id, media_type,
           CAST(16 AS INT) AS byte_len,
           CAST(list_sum(bs) AS DOUBLE) / 16 AS feat_mean,
           CAST(bs[1] AS DOUBLE) AS feat_first
    FROM bytes
    """,
)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payloads + typed metadata through an Arrow-batched
    decode stage.

    Payloads are synthesised deterministically from document text
    (stand-in for real image bytes); the mapInPandas stage demonstrates
    the exact batch shape a real decoder plugs into. Partition count is
    preserved — decode parallelism = input parallelism. Because the
    stand-in features are integer byte statistics divided by powers of
    two (exact in binary floating point), the DuckDB oracle recomputes
    them from the same md5 bytes and the key is fully value-checked."""
    media = _synthetic_media(load(spark, sf_dir, "documents"))
    decoded = decode_media(media)
    return decoded.orderBy("doc_id")


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("orig_len", IntegerType()),
        StructField("resized_len", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

TARGET_LEN = 16  # stand-in for target resolution


def _resize_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Stub 'resize': truncate/pad payload to TARGET_LEN bytes. A real
    deployment swaps the body for PIL resize / audio resample behind
    the identical (pdf in → pdf out, binary in → binary out) shape."""
    payloads = pdf["payload"]
    resized = payloads.map(
        lambda b: bytes(b[:TARGET_LEN]).ljust(TARGET_LEN, b"\0")
    )
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "orig_len": payloads.map(len).astype("int32"),
            "resized_len": resized.map(len).astype("int32"),
            "payload": resized,
        }
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                ELSE 'audio/wav' END AS media_type,
           CAST(16 AS INT) AS orig_len,
           CAST(16 AS INT) AS resized_len,
           md5(text) AS payload_hex
    FROM documents WHERE text IS NOT NULL
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage for opaque media payloads: binary in → binary out
    through mapInPandas, 1:1 rows, partition-preserving — the shape a
    real thumbnailing / resampling stage plugs into. The checked
    projection hex-encodes the resized payload (binary cells stringify
    differently across engines' pandas bridges; hex is unambiguous),
    so bytes, not just lengths, are value-checked."""
    media = _synthetic_media(load(spark, sf_dir, "documents"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _resize_batch(pdf)

    return (
        media.mapInPandas(run, RESIZED_SCHEMA)
        .select(
            "doc_id",
            "media_type",
            "orig_len",
            "resized_len",
            F.lower(F.hex("payload")).alias("payload_hex"),
        )
        .orderBy("doc_id")
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_feat", DoubleType()),
    ]
)

FRAME_BYTES = 4
FRAME_STRIDE = 2  # keep every 2nd frame


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1→many: each 'video' payload yields one row per sampled frame.
    Real deployment: cv2.VideoCapture + grab every k-th frame behind
    the same expanding-batch shape."""
    for pdf in batches:
        ids, idxs, feats = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                frame = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                ids.append(doc_id)
                idxs.append(i)
                feats.append(float(sum(frame) / len(frame)))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_feat": pd.Series(feats, dtype="float64"),
            }
        )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id, md5(text) || md5('f:' || text) AS h
      FROM documents WHERE text IS NOT NULL
    ), frames AS (
      SELECT doc_id, fi.i AS frame_idx,
             (('0x' || substring(h, 8*fi.i + 1, 2))::INT
            + ('0x' || substring(h, 8*fi.i + 3, 2))::INT
            + ('0x' || substring(h, 8*fi.i + 5, 2))::INT
            + ('0x' || substring(h, 8*fi.i + 7, 2))::INT) AS s
      FROM m, (SELECT unnest([0, 2, 4, 6]) AS i) fi
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(s AS DOUBLE) / 4 AS frame_feat
    FROM frames
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-like payloads: mapInPandas that EXPANDS
    rows (one output row per sampled frame) — the other batch shape a
    media pipeline needs besides 1:1 decode/resize. Payloads here are
    32 deterministic bytes = 8 four-byte 'frames'; stride 2 keeps 4;
    the per-frame feature (byte mean, /4 is exact in doubles) is
    recomputed by the oracle from the same md5-derived bytes, so the
    expanding UDF's full output is value-checked."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    video = d.select(
        "doc_id",
        F.to_binary(
            F.concat(F.md5("text"), F.md5(F.concat(F.lit("f:"), "text"))),
            F.lit("hex"),
        )
        .cast(BinaryType())
        .alias("payload"),
    )
    return video.mapInPandas(_sample_frames, FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


@query(
    "multimodal_dedup_binary",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             lower(hex(unhex(md5(
               array_to_string(string_split(text, ' ')[1:5], ' ')))))
               AS payload_hex
      FROM documents WHERE text IS NOT NULL
    )
    SELECT payload_hex,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM m
    GROUP BY payload_hex
    HAVING COUNT(*) >= 2
    """,
)
def multimodal_dedup_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable dedup on the BINARY modality — the storage
    dedup every multimodal pipeline runs before decode: group rows by
    a digest of a BINARY payload column and keep the lowest doc_id per
    group. At 100 TB of images this is what collapses re-crawled/
    re-hosted copies to one stored object + N references. (In a real
    media corpus the group key would be sha256 of the blob itself;
    the documents table carries no binary payload column, so here the
    BINARY value being grouped is a synthesized stand-in — see next
    paragraph — while the plan is exactly the production one.)

    The stand-in payload is a THUMBNAIL digest — md5 bytes of the
    document's 5-token prefix, cast to BinaryType — modelling the
    perceptual-hash property that matters for media dedup:
    near-identical media
    (here: docs from one near-dup family, sharing their opening)
    collapse to IDENTICAL bytes, so byte-equality grouping finds
    them (23 multi-copy groups on the check corpus — non-vacuous).
    Identity is byte-equality surfaced as hex (DuckDB's sha256 has
    no BLOB overload, so the check rides the unhex→hex round-trip:
    a bytes-vs-hex or endianness slip on either side breaks the
    match; at real scale the group key would be sha256 of the blob,
    same plan).

    Scale shape: one codegen projection over the binary column, one
    partial+final count on the digest key — the same plan as
    dedup_exact with the hash moved to the binary modality."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    thumb = F.to_binary(
        F.md5(F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ")),
        F.lit("hex"),
    ).cast(BinaryType())
    return (
        d.select(
            "doc_id",
            F.lower(F.hex(thumb)).alias("payload_hex"),
        )
        .groupBy("payload_hex")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .where(F.col("n_copies") >= 2)
    )

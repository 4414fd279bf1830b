"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (the 100 TB pattern): media lives as an opaque ``binary`` column
with a metadata struct beside it; Parquet stores the blobs row-wise
within column chunks, metadata columns prune/filter without touching
blobs. Decode / feature-extract runs as Arrow-batched ``mapInPandas``
so bytes move executor-side in bulk — never through the driver.

The actual image/audio decode libraries are not in this container, so
``decode_image_meta`` uses a clearly-marked deterministic fake parser
behind the real plumbing (schema, batching, partitioning are all real —
swap ``_fake_decode`` for PIL/ffmpeg in production).

Two oracle-checked queries expose the SQL-expressible part (blob
metadata + per-modality stats); the mapInPandas pipeline is covered by
pytest (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions import texthash as TH
from kafka_parquet_writer_spark.functions.portable import pround
from kafka_parquet_writer_spark.registry import query


@query(
    "multimodal_binary",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text)                                   AS content_md5,
           'text'                                      AS modality
    FROM documents
    """,
)
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary plumbing: pack text payloads as binary blobs, then
    compute byte length + content hash without decoding — the metadata
    path that must never read blob bodies at scale (here it does, for
    the hash, but length/modality come from the typed columns)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        F.lit("text").alias("modality"),
    )


@query(
    "multimodal_meta",
    oracle="""
    SELECT 'text' AS modality,
           source AS grp,
           count(*) AS n,
           (floor((CAST(sum(n_chars) AS DOUBLE) / count(*)) * 1e4 + 0.5) / 1e4)
             AS avg_size
    FROM documents
    GROUP BY source
    UNION ALL
    SELECT 'vector' AS modality,
           CAST(label AS VARCHAR) AS grp,
           count(*) AS n,
           (floor((CAST(sum(len(embedding)) AS DOUBLE) / count(*)) * 1e4 + 0.5) / 1e4)
             AS avg_size
    FROM embeddings
    GROUP BY label
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata stats across modalities in one frame — the
    'mixed-modality manifest' query a curation pipeline runs constantly.

    Averages over integer columns are computed as exact-int sum / count
    (one IEEE division), never float accumulation — engine-independent.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    t = docs.groupBy(F.col("source").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias(
            "avg_size"
        ),
    ).select(F.lit("text").alias("modality"), "grp", "n", "avg_size")
    v = emb.groupBy(F.col("label").cast("string").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        pround(
            F.sum(F.size("embedding")).cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_size"),
    ).select(F.lit("vector").alias("modality"), "grp", "n", "avg_size")
    return t.unionByName(v)


# ---------------------------------------------------------------------------
# mapInPandas decode pipeline (pytest-covered; decode step is a stub)
# ---------------------------------------------------------------------------

BLOB_SCHEMA = (
    "doc_id long, modality string, blob binary, "
    "meta struct<n_bytes: int, codec: string>"
)

DECODED_SCHEMA = (
    "doc_id long, modality string, n_bytes int, width int, height int, ok boolean"
)


def pack_blobs(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """documents → (doc_id, modality, blob, meta) — the at-rest layout."""
    blob = F.encode(payload_col, "UTF-8")
    return df.select(
        "doc_id",
        F.lit("text").alias("modality"),
        blob.alias("blob"),
        F.struct(
            F.octet_length(blob).alias("n_bytes"), F.lit("utf-8").alias("codec")
        ).alias("meta"),
    )


def _fake_decode(blob: bytes) -> tuple[int, int]:
    """STUB: deterministic stand-in for an image decoder (no PIL/ffmpeg
    in this container). Real deployments replace this single function;
    everything around it (Arrow batching, schema, partition parallelism)
    is production-shaped."""
    n = len(blob)
    return (n % 640 + 1, (n * 7) % 480 + 1)


def decode_image_meta(blobs: DataFrame) -> DataFrame:
    """Arrow-batched decode: per-partition iterator of pandas frames in,
    decoded metadata out. Blob bytes never leave the executor."""
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            dims = [_fake_decode(b) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(b) for b in pdf["blob"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "ok": True,
                }
            )

    return blobs.mapInPandas(decode, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, modality string, blob binary, "
    "meta struct<n_bytes: int, codec: string, width: int, height: int>"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, n_bytes int"

FEATURE_DIM = 16
FEATURE_SCHEMA = "doc_id long, modality string, feature array<float>"


def resize_images(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Blob-in → blob-out transform (the resize/transcode shape):
    mapInPandas so re-encoded bytes stream Arrow-batched through Python
    and straight back to parquet — constant executor memory, no driver
    hop. STUB: the 're-encoded' payload is a deterministic truncation/
    padding to width×height bytes standing in for a real encoder.
    """
    import pandas as pd

    target = width * height

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = [
                (bytes(b) + b"\x00" * target)[:target] for b in pdf["blob"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "blob": out,
                    "meta": [
                        {
                            "n_bytes": target,
                            "codec": "raw",
                            "width": width,
                            "height": height,
                        }
                        for _ in out
                    ],
                }
            )

    return blobs.mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_video_frames(
    blobs: DataFrame, frame_bytes: int = 64, every_n: int = 2
) -> DataFrame:
    """One-to-many frame sampling (the video shape): each blob yields
    every ``every_n``-th fixed-size frame as its own row. mapInPandas
    emits the expanded frame rows batch-by-batch, so a long video never
    materializes as one in-memory list of frames. STUB: a 'frame' is a
    fixed-size byte slice standing in for real demux/decode."""
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["blob"]):
                b = bytes(b)
                n_frames = max(1, len(b) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return blobs.mapInPandas(sample, schema=FRAME_SCHEMA)


def extract_features(blobs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Blob → embedding vector (the feature-extraction shape): numpy-
    vectorized inside Arrow batches; output is ArrayType(Float) ready
    for the similarity operators. STUB: features are a deterministic
    byte-histogram projection standing in for a real vision/audio model
    forward pass — swap the inner function for the model call; the
    batching, schema, and downstream compatibility are production-real.
    """
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = []
            for b in pdf["blob"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    arr = np.zeros(1, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                feats.append((hist / max(1.0, float(hist.sum()))).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                }
            )

    return blobs.mapInPandas(extract, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# driver-checked pipeline queries: the stubs are deterministic arithmetic,
# so the REAL mapInPandas pipelines are value-oracled end-to-end (DuckDB
# reproduces the stub math; a real decoder swap makes these rows-only)
# ---------------------------------------------------------------------------


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id, 'text' AS modality,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER)
             AS height,
           TRUE AS ok
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full decode pipeline as a driver-checked query: pack payloads
    into opaque blobs, run the Arrow-batched ``mapInPandas`` decoder,
    emit per-blob metadata. The oracle reproduces ``_fake_decode``'s
    deterministic arithmetic, so the *pipeline* (packing, Arrow batch
    shape, UDF schema, executor-side byte handling) is value-verified —
    swapping in a real decoder changes only the stub, and this query's
    check degrades to rows-only.
    """
    from kafka_parquet_writer_spark.session import repartition_for_compute

    docs = repartition_for_compute(
        load_table(spark, sf_dir, "documents"), F.col("doc_id")
    )
    return decode_image_meta(pack_blobs(docs))


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents),
    f AS (
      SELECT doc_id, CAST(u AS INTEGER) AS frame_idx,
             substring(text, CAST(u AS INTEGER) * 64 + 1, 64) AS frame
      FROM (SELECT doc_id, text, unnest(range(0, greatest(1, n // 64))) AS u
            FROM b)
      WHERE u % 2 = 0
    )
    SELECT doc_id, frame_idx,
           CAST(octet_length(encode(frame)) AS INTEGER) AS n_bytes,
           md5(frame) AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many frame sampling as a driver-checked query: every 2nd
    64-byte 'frame' of each blob becomes a row (the video-demux shape —
    expansion happens batch-wise inside ``mapInPandas``, never as one
    in-memory frame list). Frames are compared by md5, valid because the
    fixture corpus is pure ASCII (oracle slices the varchar; byte and
    character offsets coincide — asserted by the n_bytes column, which
    would diverge on any multi-byte character).
    """
    from kafka_parquet_writer_spark.session import repartition_for_compute

    docs = repartition_for_compute(
        load_table(spark, sf_dir, "documents"), F.col("doc_id")
    )
    frames = sample_video_frames(pack_blobs(docs), frame_bytes=64, every_n=2)
    return frames.select(
        "doc_id", "frame_idx", "n_bytes", F.md5("frame").alias("frame_md5")
    )


# ---------------------------------------------------------------------------
# perceptual-hash near-dup (banded hamming join over blob fingerprints)
# ---------------------------------------------------------------------------

#: fingerprint bits (shift stays inside signed int64)
PHASH_BITS = 60
#: banding: 6 bands × 10 bits; a candidate pair must agree on ≥1 band
PHASH_BANDS = 6
PHASH_BAND_BITS = 10
#: near-dup verify threshold — measured on the fixture: true near-dup
#: pairs sit at hamming 0-2 while the unrelated-pair background ramps
#: from ~5 (word-level features; the char-level variant collapsed to
#: language clusters and matched everything)
PHASH_MAX_HAMMING = 2


def _phash_sig_sql() -> str:
    """DuckDB CTE body computing (doc, sig): the perceptual hash."""
    return f"""
    feats AS (
      SELECT doc_id AS doc,
             unnest(list_transform(
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> ''),
               w -> CAST({TH.sql_portable_tid('w')} % {PHASH_BITS}
                         AS INTEGER))) AS bucket
      FROM documents
    ),
    counts AS (
      SELECT doc, bucket, count(*) AS cnt FROM feats GROUP BY doc, bucket
    ),
    tot AS (
      SELECT doc, bucket, cnt, sum(cnt) OVER (PARTITION BY doc) AS n
      FROM counts
    ),
    sigs AS (
      SELECT doc,
             CAST(sum(CASE WHEN {PHASH_BITS} * cnt > n
                           THEN (CAST(1 AS BIGINT) << bucket)
                           ELSE 0 END) AS BIGINT) AS sig
      FROM tot GROUP BY doc
    )
    """


@query(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH {_phash_sig_sql()},
    banded AS (
      SELECT doc, sig, b AS band,
             (sig >> ({PHASH_BAND_BITS} * b)) & {2**PHASH_BAND_BITS - 1}
               AS bval
      FROM sigs, range({PHASH_BANDS}) r(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc AS d1, a.sig AS sig1, b.doc AS d2, b.sig AS sig2
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bval = b.bval AND a.doc < b.doc
    )
    SELECT d1, d2,
           CAST(bit_count(xor(sig1, sig2)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sig1, sig2)) <= {PHASH_MAX_HAMMING}
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection over media blobs — the
    aHash/pHash pipeline shape: per-blob feature vector → above-mean
    thresholding → fixed-width bit fingerprint → banded hamming join.
    The feature extractor here is a deterministic stand-in (hashed
    token histogram over the payload, PHASH_BITS buckets — a
    char-level histogram was tried first and collapsed into language
    clusters, the classic under-discriminative-features failure)
    because the container has no image codecs; a real DCT/aHash
    extractor plugs into the same (doc, sig) contract via the
    mapInPandas decode path (decode_image_meta above) without touching
    the join.

    Scale shape: fingerprints are built with explode + two-phase hash
    aggregation (map-side combine on (doc, bucket) — never a per-row
    interpreted histogram loop); the signature table is one row per
    blob. Candidates meet in an equi-join on (band, band-value) —
    pigeonhole banding like dedup_simhash, cost ∝ Σ bucket², with the
    exact hamming verify (xor + bit_count, JVM) after. Fingerprints
    of 100 TB of media are ~8 bytes/blob — the join input is tiny
    relative to the corpus, which is the entire point of pHash dedup.
    """
    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(
            F.transform(
                TH.words_expr("text"),
                lambda w: (TH.portable_tid(w) % PHASH_BITS).cast("int"),
            )
        ).alias("bucket"),
    )
    counts = feats.groupBy("doc", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql.window import Window as W

    tot = counts.withColumn("n", F.sum("cnt").over(W.partitionBy("doc")))
    sigs = tot.groupBy("doc").agg(
        F.sum(
            F.when(
                F.lit(PHASH_BITS) * F.col("cnt") > F.col("n"),
                F.expr("shiftleft(CAST(1 AS BIGINT), bucket)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("sig")
    ).cache()
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("sig"), PHASH_BAND_BITS * b)
            .bitwiseAND(F.lit(2**PHASH_BAND_BITS - 1))
            .alias("bval"),
        )
        for b in range(PHASH_BANDS)
    ]
    banded = sigs.select(
        "doc", "sig", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc", "sig", F.col("bs.band").alias("band"), F.col("bs.bval").alias("bval"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("d1"),
            F.col("a.sig").alias("sig1"),
            F.col("b.doc").alias("d2"),
            F.col("b.sig").alias("sig2"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig1").bitwiseXOR(F.col("sig2")))
    return cand.filter(hamming <= PHASH_MAX_HAMMING).select(
        "d1", "d2", hamming.cast("int").alias("hamming")
    )

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

"""End-to-end corpus-cleaning pipeline: the flagship composition that
ties the north-star operators together the way a training-data job
actually runs them —

    language ID  →  quality filter  →  near-dup clustering  →
    keep one representative per cluster

Every stage is the SAME operator already verified individually
(text_langid, text_quality, dedup_minhash_lsh → dedup_clusters), and
the composed oracle nests their SQL — so the full pipeline is
value-checked end-to-end, including the iterative connected-components
stage (recursive CTE in the oracle).

Scale shape: langid/quality are single-pass projections; clustering
touches only docs that appear in a verified near-dup pair (a small
fraction of the corpus); the final keep-set is two joins — one
broadcastable (lang⋈quality on the same key never shuffles twice) and
one left-anti against the (tiny) drop list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.operators.dedup import (
    _clusters_oracle,
    dedup_clusters,
)
from kafka_parquet_writer_spark.operators.text import (
    _langid_oracle,
    _quality_oracle,
    text_langid,
    text_quality,
)
from kafka_parquet_writer_spark.registry import query

QUALITY_MIN = 0.71  # ≈ median of the fixture corpus — keeps the top half
KEEP_LANG = "en"


def _pipeline_oracle() -> str:
    return f"""
    WITH lang AS ({_langid_oracle()}),
    qual AS ({_quality_oracle()}),
    dropped AS (
      SELECT doc AS doc_id FROM ({_clusters_oracle()}) WHERE doc <> comp
    )
    SELECT l.doc_id, l.pred_lang, q.quality, q.n_tokens
    FROM lang l
    JOIN qual q USING (doc_id)
    WHERE l.pred_lang = '{KEEP_LANG}'
      AND q.quality >= {QUALITY_MIN}
      AND l.doc_id NOT IN (SELECT doc_id FROM dropped)
    """


@query("pipeline_clean_corpus", oracle=_pipeline_oracle())
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned-corpus manifest: English docs above the quality bar,
    minus non-representative members of near-duplicate clusters."""
    lang = text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    qual = text_quality(spark, sf_dir).select("doc_id", "quality", "n_tokens")
    dropped = (
        dedup_clusters(spark, sf_dir)
        .filter(F.col("doc") != F.col("comp"))
        .select(F.col("doc").alias("doc_id"))
    )
    return (
        lang.join(qual, "doc_id")
        .filter(
            (F.col("pred_lang") == KEEP_LANG) & (F.col("quality") >= QUALITY_MIN)
        )
        .join(F.broadcast(dropped), "doc_id", "left_anti")
        .select("doc_id", "pred_lang", "quality", "n_tokens")
    )

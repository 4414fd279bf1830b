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
touches only docs that appear in a verified near-dup pair; the final
keep-set is two joins — lang⋈quality on the same key (one shuffle,
reused) and a left-anti against the drop list. The drop list is NOT
assumed small: on crawl-like corpora near-dup non-representatives are
commonly 30–60% of all docs — corpus-shaped, not dim-shaped — so the
anti-join carries no broadcast hint; AQE sizes it at runtime
(broadcast when the measured drop list fits, shuffle otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.operators.dedup import (
    _clusters_oracle,
    dedup_clusters,
)
from kafka_parquet_writer_spark.operators.text import (
    _langid_oracle,
    _quality_oracle,
    langid_frame,
    quality_frame,
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
    minus non-representative members of near-duplicate clusters.

    The drop-list anti-join deliberately carries NO broadcast hint:
    the list is corpus-shaped on real crawls (near-dup rates of
    30–60% are routine), and a forced broadcast of O(corpus) rows is
    an executor OOM at scale (r10 VERDICT). AQE's runtime size check
    picks broadcast exactly when the measured list fits under
    spark.sql.autoBroadcastJoinThreshold — the right call at BOTH this
    fixture's sizes and a 100 TB crawl's.

    The langid and quality stages are row-wise functions of the SAME
    document row, so they compose through one corpus scan (langid_frame
    threads text/n_chars past the scoring into quality_frame) instead
    of the lang ⋈ qual join of two full projections — an inner join of
    two keyed projections of the same table on its unique key IS the
    combined projection, and the join's exchange plus the second
    scan+tokenize of the corpus were pure overhead (guide §2.4 —
    r15 opt: the planner broadcast-built the ENTIRE quality projection
    for that join, a corpus-shaped broadcast that is itself the OOM
    shape the drop-list note above avoids)."""
    docs = load_table(spark, sf_dir, "documents")
    lq = langid_frame(docs, keep=("text", "n_chars")).select(
        "doc_id", "text", "n_chars", "pred_lang"
    )
    scored = quality_frame(lq, keep=("pred_lang",))
    dropped = (
        dedup_clusters(spark, sf_dir)
        .filter(F.col("doc") != F.col("comp"))
        .select(F.col("doc").alias("doc_id"))
    )
    return (
        scored.filter(
            (F.col("pred_lang") == KEEP_LANG) & (F.col("quality") >= QUALITY_MIN)
        )
        .join(dropped, "doc_id", "left_anti")
        .select("doc_id", "pred_lang", "quality", "n_tokens")
    )


# ---------------------------------------------------------------------------
# training-corpus assembly: decontaminate → mixture-sample → pack
# ---------------------------------------------------------------------------


def _train_corpus_oracle() -> str:
    from kafka_parquet_writer_spark.operators.corpus_prep import PACK_BUDGET
    from kafka_parquet_writer_spark.operators.llm_prep import (
        DECON_BENCH_MOD,
        MIX_A,
        MIX_B,
        _mix_sql_rates,
        decon_oracle_sql,
    )
    from kafka_parquet_writer_spark.functions import texthash as TH
    from kafka_parquet_writer_spark.functions.portable import sql_pround

    return f"""
    WITH {_mix_sql_rates()},
    mix AS (
      SELECT t.doc_id, t.tok
      FROM toks t JOIN rates r USING (lang)
      WHERE (t.doc_id * {MIX_A} + {MIX_B}) % {TH.MERSENNE_P} % 10000
            < r.rate_bp
    ),
    contaminated AS (SELECT doc_id FROM ({decon_oracle_sql()})),
    surv AS (
      SELECT doc_id, tok FROM mix
      WHERE doc_id % {DECON_BENCH_MOD} <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    c AS (
      SELECT doc_id, tok,
             COALESCE(sum(tok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM surv
    )
    SELECT CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS bin_id,
           count(*)                                    AS n_docs,
           min(doc_id)                                 AS first_doc,
           max(doc_id)                                 AS last_doc,
           CAST(sum(tok) AS BIGINT)                    AS tok_sum,
           {sql_pround(f'sum(tok) * 100.0 / {PACK_BUDGET}', 2)} AS fill_pct
    FROM c
    GROUP BY bin_id
    """


@query("pipeline_train_corpus", oracle=_train_corpus_oracle())
def pipeline_train_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus assembly, end-to-end: sample the corpus to the
    target language mixture (mixture_sample), drop benchmark documents
    and anything sharing ≥3 distinct 3-grams with them
    (decontaminate_ngram), then pack the survivors into
    token-budget bins (pack_sequences' distributed prefix sum) — the
    manifest a trainer consumes. Every stage is the SAME operator
    already verified individually; the composed oracle nests their SQL
    so the whole chain is value-checked end-to-end.

    Scale shape: mixture membership is a per-row hash against a
    broadcast rate table; packing is the sharded prefix sum — the
    corpus is never shuffled except the final per-bin aggregate. The
    decontamination anti-join carries NO broadcast hint (the same
    reasoning as pipeline_clean_corpus's drop list, r11): the flagged
    list is corpus-derived — contamination rates of 1–10% are routine
    on large crawls where benchmark text is widely replicated — so a
    forced broadcast is O(corpus_rows × rate) and AQE's runtime size
    check must make the call instead.
    """
    from kafka_parquet_writer_spark.operators.corpus_prep import pack_bins
    from kafka_parquet_writer_spark.operators.llm_prep import (
        DECON_BENCH_MOD,
        decontaminate_ngram,
        mixture_sample,
    )

    mix = mixture_sample(spark, sf_dir).select("doc_id", "tok")
    flagged = decontaminate_ngram(spark, sf_dir).select("doc_id")
    surv = (
        mix.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
        .join(flagged, "doc_id", "left_anti")
        .select("doc_id", F.col("tok").alias("t"))
    )
    return pack_bins(surv)

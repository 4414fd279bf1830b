"""Text analysis operators (north-star surface): tokenization + term
frequency, language-ID heuristic, quality scoring, token counting,
document fingerprinting.

Every operator is a pure JVM-side expression pipeline (split / explode /
higher-order functions) — no Python in the hot path — and each has an
exact DuckDB oracle (both engines run the identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions import texthash as TH
from kafka_parquet_writer_spark.functions.portable import pround
from kafka_parquet_writer_spark.registry import query

FP_MOD = 1_000_000_007
FP_MUL = 31

# marker-word lists for the language-ID heuristic (deterministic, tiny —
# a real system would use char-n-gram profiles; the *operator shape* is
# identical: per-language score → argmax with fixed preference order)
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "y", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "une", "et", "est"],
}
STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


@query(
    "text_tokens",
    oracle=f"""
    SELECT token, count(*) AS cnt
    FROM (
      SELECT unnest({TH.sql_words('text')}) AS token
      FROM documents
    )
    GROUP BY token
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + corpus-wide term frequency.

    Scale: explode → partial hash agg (map-side combine) → shuffle only
    distinct tokens per partition. Vocabulary-bound, not corpus-bound.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(TH.words_expr("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _langid_oracle() -> str:
    scores = ",\n      ".join(
        "CAST(len(list_distinct(list_intersect({w}, {lst}))) AS INTEGER) AS s_{lang}".format(
            w=f"list_distinct({TH.sql_words('text')})",
            lst="[" + ", ".join(f"'{x}'" for x in words) + "]",
            lang=lang,
        )
        for lang, words in LANG_MARKERS.items()
    )
    return f"""
    WITH scored AS (SELECT doc_id, {scores} FROM documents)
    SELECT doc_id, s_en, s_es, s_de, s_fr,
           CASE
             WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
             WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
             WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
             WHEN s_fr > 0 THEN 'fr'
             ELSE 'und'
           END AS pred_lang
    FROM scored
    """


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: per-language hit count over the distinct
    token set, argmax with fixed preference order (en > es > de > fr)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(TH.words_expr("text"))
    scored = docs.select(
        "doc_id",
        *[
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
                f"s_{lang}"
            )
            for lang, words in LANG_MARKERS.items()
        ],
    )
    s = {k: F.col(f"s_{k}") for k in LANG_MARKERS}
    pred = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when((s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )
    return scored.select("doc_id", "s_en", "s_es", "s_de", "s_fr", pred.alias("pred_lang"))


def _quality_oracle() -> str:
    w = TH.sql_words("text")
    stop = "[" + ", ".join(f"'{x}'" for x in STOPWORDS) + "]"
    return f"""
    WITH base AS (
      SELECT doc_id,
             n_chars,
             CAST(length(text) AS INTEGER) AS n_chars_calc,
             {w} AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id, n_chars, n_chars_calc,
             CAST(len(w) AS INTEGER) AS n_tokens,
             CASE WHEN len(w) = 0 THEN 0
                  ELSE list_reduce(list_transform(w, x -> CAST(length(x) AS BIGINT)),
                                   (a, b) -> a + b) END AS tok_chars,
             CAST(len(list_filter(w, x -> list_contains({stop}, x))) AS INTEGER)
               AS n_stop,
             CAST(len(list_distinct(w)) AS INTEGER) AS n_uniq
      FROM base
    )
    SELECT doc_id, n_chars, n_chars_calc, n_tokens,
           (floor((CAST(tok_chars AS DOUBLE) / nullif(n_tokens, 0)) * 1e6 + 0.5) / 1e6) AS avg_tok_len,
           (floor((CAST(n_stop AS DOUBLE) / nullif(n_tokens, 0)) * 1e6 + 0.5) / 1e6)    AS stop_ratio,
           (floor((CAST(n_uniq AS DOUBLE) / nullif(n_tokens, 0)) * 1e6 + 0.5) / 1e6)    AS uniq_ratio,
           (floor((0.4 * (CAST(n_uniq AS DOUBLE) / nullif(n_tokens, 0))
               + 0.3 * least(CAST(n_tokens AS DOUBLE) / 50, 1.0)
               + 0.3 * (1 - CAST(n_stop AS DOUBLE) / nullif(n_tokens, 0))) * 1e6 + 0.5) / 1e6)
                                                                     AS quality
    FROM m
    """


@query("text_quality", oracle=_quality_oracle())
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length stats, stopword ratio, uniqueness ratio,
    composite score — the standard pre-training corpus filters."""
    docs = load_table(spark, sf_dir, "documents")
    w = TH.words_expr("text")
    base = docs.select(
        "doc_id",
        "n_chars",
        F.length("text").alias("n_chars_calc"),
        w.alias("w"),
    )
    m = base.select(
        "doc_id",
        "n_chars",
        "n_chars_calc",
        F.size("w").alias("n_tokens"),
        F.aggregate(
            "w", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("tok_chars"),
        F.size(F.filter("w", lambda x: x.isin(*STOPWORDS))).alias("n_stop"),
        F.size(F.array_distinct("w")).alias("n_uniq"),
    )
    nt = F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0))
    uniq_ratio = F.col("n_uniq").cast("double") / nt
    stop_ratio = F.col("n_stop").cast("double") / nt
    return m.select(
        "doc_id",
        "n_chars",
        "n_chars_calc",
        "n_tokens",
        pround(F.col("tok_chars").cast("double") / nt, 6).alias("avg_tok_len"),
        pround(stop_ratio, 6).alias("stop_ratio"),
        pround(uniq_ratio, 6).alias("uniq_ratio"),
        pround(
            0.4 * uniq_ratio
            + 0.3 * F.least(F.col("n_tokens").cast("double") / 50, F.lit(1.0))
            + 0.3 * (1 - stop_ratio),
            6,
        ).alias("quality"),
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(
                       list_transform(string_split(text, ''),
                                      c -> CAST(ascii(c) AS BIGINT)),
                       (a, b) -> (a * {FP_MUL} + b) % {FP_MOD}) END AS fp,
           md5(text) AS fp_md5
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: rolling polynomial hash
    (acc·31 + codepoint mod 1e9+7 — Rabin-Karp style) + md5.

    The left fold starts at 0, so it equals DuckDB's init-less
    list_reduce fold (0·31 + c₁ = c₁). Per-row expression, no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    chars = F.filter(F.split("text", ""), lambda x: x != "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FP_MUL + F.ascii(ch).cast("long")) % FP_MOD,
    )
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        F.md5(F.col("text").cast("binary")).alias("fp_md5"),
    )


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x <> '')) AS INTEGER)        AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                AS INTEGER)                                        AS n_bpe_tokens,
           (floor((CAST(length(text) AS DOUBLE) /
                 nullif(len(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9\\s]')), 0)) * 1e6 + 0.5) / 1e6)     AS chars_per_token
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single symbols), chars-per-token ratio."""
    docs = load_table(spark, sf_dir, "documents")
    bpe_pat = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
    n_bpe = F.regexp_count(F.lower("text"), F.lit(bpe_pat))
    return docs.select(
        "doc_id",
        F.size(TH.words_expr("text")).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        pround(
            F.length("text").cast("double") / F.nullif(n_bpe, F.lit(0)), 6
        ).alias("chars_per_token"),
    )

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
    return langid_frame(load_table(spark, sf_dir, "documents"))


def langid_frame(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """The text_langid transformation over any (doc_id, text) frame.
    ``keep`` names input columns carried through unchanged — the fused
    single-scan composition in pipeline_clean_corpus threads text/
    n_chars past the language scoring so the quality stage reads the
    SAME scan instead of re-scanning the corpus (row-wise functions of
    the same doc row compose without a join on the unique doc_id)."""
    toks = F.array_distinct(TH.words_expr("text"))
    scored = docs.select(
        "doc_id",
        *keep,
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
    return scored.select(
        "doc_id", *keep, "s_en", "s_es", "s_de", "s_fr", pred.alias("pred_lang")
    )


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
    return quality_frame(load_table(spark, sf_dir, "documents"))


def quality_frame(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """The text_quality transformation over any (doc_id, text, n_chars)
    frame — batch or streaming (stateless, so it applies unchanged to a
    readStream source; `stream_quality_filter` runs it per micro-batch
    as the at-ingest curation gate). ``keep`` names input columns
    carried through unchanged (see langid_frame)."""
    w = TH.words_expr("text")
    base = docs.select(
        "doc_id",
        *keep,
        "n_chars",
        F.length("text").alias("n_chars_calc"),
        w.alias("w"),
    )
    m = base.select(
        "doc_id",
        *keep,
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
        *keep,
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


def _bigrams(ws):
    """All word bigrams (with duplicates) as 'w1 w2' strings — a pure
    per-row expression (zip of the array with its own tail)."""
    n = F.size(ws)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _trigrams(ws):
    n = F.size(ws)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(ws, i),
                F.element_at(ws, i + 1),
                F.element_at(ws, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


#: Gopher-style repetition cut-offs (Rae et al. 2021 use character-
#: fraction thresholds ≈0.2 on web text; this corpus is synthetic word
#: soup, so the thresholds are sized to split it, not to match paper
#: values — the FILTER SHAPE is the point)
REP_DUP2_MAX = 0.80
REP_DUP3_MAX = 0.60


def _repetition_oracle() -> str:
    w = TH.sql_words("text")
    return f"""
    WITH base AS (SELECT doc_id, {w} AS w FROM documents),
    g AS (
      SELECT doc_id,
             CAST(len(w) AS INTEGER) AS n_tokens,
             list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i+1]) AS g2,
             list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS g3
      FROM base
    ),
    m AS (
      SELECT doc_id, n_tokens,
             CASE WHEN len(g2) = 0 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
             END AS dup2,
             CASE WHEN len(g3) = 0 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
             END AS dup3,
             -- run-length fold over the sorted grams. Field order
             -- (m, r, p) is load-bearing: DuckDB binds struct_pack
             -- fields laterally, so a field must never be read (even
             -- qualified as a.*) after the new struct rebinds it
             CASE WHEN len(g2) = 0 THEN 0.0
                  ELSE CAST((list_reduce(
                         list_transform(list_sort(g2),
                           x -> struct_pack(m := CAST(1 AS BIGINT),
                                            r := CAST(1 AS BIGINT),
                                            p := x)),
                         (a, x) -> struct_pack(
                           m := greatest(a.m, CASE WHEN x.p = a.p
                                               THEN a.r + 1 ELSE 1 END),
                           r := CASE WHEN x.p = a.p THEN a.r + 1 ELSE 1 END,
                           p := x.p)
                       )).m AS DOUBLE) / len(g2)
             END AS top2
      FROM g
    )
    SELECT doc_id, n_tokens,
           (floor(dup2 * 1e6 + 0.5) / 1e6) AS dup2_ratio,
           (floor(dup3 * 1e6 + 0.5) / 1e6) AS dup3_ratio,
           (floor(top2 * 1e6 + 0.5) / 1e6) AS top_bigram_share,
           (dup2 <= {REP_DUP2_MAX} AND dup3 <= {REP_DUP3_MAX}) AS keep
    FROM m
    """


@query("text_repetition", oracle=_repetition_oracle())
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filter (the Gopher/MassiveText rules):
    duplicate bigram fraction, duplicate trigram fraction, and the
    most-frequent-bigram share, with a keep/drop verdict.

    Scale shape: everything is a per-row expression over the token
    array (zip-with-tail n-grams, distinct/count ratios) — no explode,
    no cross-row dependency, whole-stage codegen end to end. The
    top-bigram share is a sort + run-length fold, O(n log n) per
    document (the count-per-distinct formulation is O(distinct·n) —
    measured 4.6 s vs 3.5 s at sf0.1). The work is CPU-heavy but
    byte-small, so the scan is spread across cores with an explicit
    compute repartition (a single small parquet split would otherwise
    serialize the whole corpus through one task: 14 s before). On a
    real multi-split 100 TB table the scan itself provides the
    parallelism and the repartition coalesces away.
    """
    from kafka_parquet_writer_spark.session import repartition_for_compute

    docs = repartition_for_compute(
        load_table(spark, sf_dir, "documents"), F.col("doc_id")
    )
    ws = TH.words_expr("text")
    g = docs.select(
        "doc_id",
        F.size(ws).alias("n_tokens"),
        _bigrams(ws).alias("g2"),
        _trigrams(ws).alias("g3"),
    )

    def dup_ratio(col):
        return F.when(F.size(col) == 0, F.lit(0.0)).otherwise(
            1.0 - F.size(F.array_distinct(col)).cast("double") / F.size(col)
        )

    # most-frequent-bigram multiplicity via sort + run-length fold:
    # O(n log n) per doc instead of the O(distinct·n) count-per-distinct
    # formulation (measured 4.6 s → ~1 s at sf0.1, 32 cores)
    # field order (m, r, p) mirrors the oracle exactly — DuckDB's
    # list_reduce requires accumulator type == element type, and its
    # struct_pack binds fields laterally (a field read after the new
    # struct rebinds it sees the NEW value), so both engines use the
    # read-before-rebind order
    run_structs = F.transform(
        F.array_sort("g2"),
        lambda x: F.struct(
            F.lit(1).cast("long").alias("m"),
            F.lit(1).cast("long").alias("r"),
            x.alias("p"),
        ),
    )
    folded = F.aggregate(
        run_structs,
        F.struct(
            F.lit(0).cast("long").alias("m"),
            F.lit(0).cast("long").alias("r"),
            F.lit("").alias("p"),
        ),
        lambda a, x: F.struct(
            F.greatest(
                a["m"],
                F.when(x["p"] == a["p"], a["r"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("m"),
            F.when(x["p"] == a["p"], a["r"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("r"),
            x["p"].alias("p"),
        ),
    )
    top2 = F.when(F.size("g2") == 0, F.lit(0.0)).otherwise(
        folded["m"].cast("double") / F.size("g2")
    )
    m = g.select(
        "doc_id",
        "n_tokens",
        dup_ratio(F.col("g2")).alias("dup2"),
        dup_ratio(F.col("g3")).alias("dup3"),
        top2.alias("top2"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        pround(F.col("dup2"), 6).alias("dup2_ratio"),
        pround(F.col("dup3"), 6).alias("dup3_ratio"),
        pround(F.col("top2"), 6).alias("top_bigram_share"),
        (
            (F.col("dup2") <= REP_DUP2_MAX) & (F.col("dup3") <= REP_DUP3_MAX)
        ).alias("keep"),
    )


def _ngram_lm_oracle() -> str:
    w = TH.sql_words("text")
    return f"""
    WITH base AS (SELECT doc_id, {w} AS w FROM documents),
    toks AS (SELECT unnest(w) AS word FROM base),
    uni AS (SELECT word, count(*) AS cu FROM toks GROUP BY word),
    v AS (SELECT count(*) AS nv FROM uni),
    pairs AS (
      SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS bg
        FROM base) t
    ),
    bi AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
    scored AS (
      SELECT p.doc_id,
             CAST(floor(1e6 * (b.cb + 1) / (u.cu + (SELECT nv FROM v)) + 0.5)
                  AS BIGINT) AS p6
      FROM pairs p
      JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
      JOIN uni u ON u.word = p.w1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           (floor((CAST(sum(p6) AS DOUBLE) / 1e6 / count(*)) * 1e6 + 0.5) / 1e6)
             AS avg_p
    FROM scored GROUP BY doc_id
    """


@query("docs_ngram_lm", oracle=_ngram_lm_oracle())
def docs_ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram language-model scoring (the CCNet/KenLM
    perplexity-filter shape): train add-one-smoothed bigram statistics
    on the WHOLE corpus, then score every document against them —
    avg p(w2|w1) per doc. Low-probability docs are the out-of-domain /
    garbage candidates a pre-training pipeline drops.

    Scale shape: two count aggregations (unigram, bigram) with
    map-side partials — vocabulary tables are ≪ corpus and AQE
    broadcast-joins them back onto the exploded token stream; the only
    fact-grain shuffles are the counts themselves and the final
    per-doc aggregate. Per-token probabilities are int64 fixed-point
    (1e-6) before the cross-row sum, so the result is bit-identical
    across engines and partition orders (see memory: never sum raw
    doubles across partitions in an oracle-checked output).
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = TH.words_expr("text")
    n = F.size(ws)
    pair_structs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    base = docs.select("doc_id", ws.alias("w"))
    toks = base.select(F.explode("w").alias("word"))
    uni = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cu"))
    vocab = uni.agg(F.count(F.lit(1)).alias("nv"))
    pairs = docs.select(
        "doc_id", F.explode(pair_structs).alias("bg")
    ).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    # (no cache on pairs: A/B measured the columnar encode of the wide
    # string stream costing more than the second tokenize it saves —
    # plans/r15/AB_ppl_lm_join.json)
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    p6 = F.floor(
        1e6 * (F.col("cb") + 1) / (F.col("cu") + F.col("nv")) + F.lit(0.5)
    ).cast("long")
    # p6 is a function of the bigram TYPE — fold the unigram
    # denominator and vocab smoothing into the aggregated bigram table
    # (one per-type join) instead of shuffling the occurrence stream a
    # second time by w1 (same restructure as text_ppl_buckets)
    lm = (
        bi.join(uni.withColumnRenamed("word", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", p6.alias("p6"))
    )
    scored = pairs.join(lm, ["w1", "w2"]).select("doc_id", "p6")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        pround(
            F.sum("p6").cast("double") / 1e6 / F.count(F.lit(1)), 6
        ).alias("avg_p"),
    )


#: PII patterns kept to a regex dialect subset valid in BOTH Java
#: (Spark) and RE2 (DuckDB), so library behavior matches what an
#: oracle-checked variant would do on data that contains PII.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d -]{7,}\d",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-shaped digit runs, appending
    per-category match counts (<EMAIL>, <IP>, <PHONE> tags).

    Library-only (not driver-declared): the synthetic corpus contains
    no digits, so an oracle row would verify nothing; the unit test
    exercises it on constructed rows instead. Pure JVM regex — one
    projection, no shuffle, safe at any scale.
    """
    out = df
    col = F.col(text_col)
    for name, tag in (("email", "<EMAIL>"), ("ipv4", "<IP>"), ("phone", "<PHONE>")):
        pat = PII_PATTERNS[name]
        out = out.withColumn(
            f"n_{name}", F.regexp_count(col, F.lit(pat))
        )
    scrubbed = col
    for name, tag in (("email", "<EMAIL>"), ("ipv4", "<IP>"), ("phone", "<PHONE>")):
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[name], tag)
    return out.withColumn(f"{text_col}_scrubbed", scrubbed)


# ---------------------------------------------------------------------------
# boilerplate stripping (per-source template removal)
# ---------------------------------------------------------------------------

#: a token present in ≥ this % of a source's documents is template
#: boilerplate for that source
BOILER_DF_PCT = 90


@query(
    "text_boilerplate_strip",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {TH.sql_words('text')} AS w FROM documents
    ),
    toks AS (
      SELECT doc_id, source, u.pos AS pos, u.w AS w
      FROM (
        SELECT doc_id, source,
               list_transform(range(1, len(w) + 1),
                              i -> struct_pack(pos := i, w := w[i])) AS ws
        FROM base
      ), unnest(ws) AS t(u)
    ),
    src_docs AS (
      SELECT source, count(DISTINCT doc_id) AS nd FROM base GROUP BY source
    ),
    boiler AS (
      SELECT t.source, t.w
      FROM (SELECT source, w, count(DISTINCT doc_id) AS d
            FROM toks GROUP BY source, w) t
      JOIN src_docs USING (source)
      WHERE t.d * 100 >= {BOILER_DF_PCT} * nd
    ),
    kept AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(w, ' ' ORDER BY pos) AS cleaned
      FROM toks ANTI JOIN boiler USING (source, w)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.w) AS BIGINT) AS n_orig,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           {TH.sql_portable_hash64("COALESCE(k.cleaned, '')")} AS clean_hash
    FROM base b LEFT JOIN kept k USING (doc_id)
    """,
)
def text_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate removal: tokens appearing in ≥
    {BOILER_DF_PCT}% of a source's documents are that source's
    boilerplate (nav bars, footers, licence blurbs in a real crawl)
    and are stripped position-aware, preserving the order of what
    remains. Output carries the cleaned-text hash so the oracle
    verifies the reconstruction byte-for-byte, not just counts.

    Scale shape: boilerplate vocabularies are per-source and tiny, so
    the strip join broadcasts them; the heavy side is one
    posexplode + per-source df aggregation (two-phase, map-side
    combined) and one groupBy(doc) to reassemble — the same
    shuffle budget as the tf·idf pass. No driver-side anything.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "source", TH.words_expr("text").alias("w"))
    toks = base.select(
        "doc_id", "source", F.posexplode("w").alias("pos", "tok")
    )
    # doc_id is unique per row — count, not countDistinct
    src_docs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("nd"))
    # per-source document frequency over the per-doc DISTINCT token
    # stream (array_distinct in the array domain before the explode —
    # the _tid_sets trick): a plain count replaces the two-phase
    # countDistinct over the full occurrence stream, and the explode
    # emits each (doc, token) once instead of once per occurrence
    boiler = (
        base.select(
            "source", F.explode(F.array_distinct("w")).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("d"))
        .join(src_docs, "source")
        .filter(F.col("d") * 100 >= BOILER_DF_PCT * F.col("nd"))
        .select("source", "tok")
    )
    kept = (
        toks.join(F.broadcast(boiler), ["source", "tok"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("cleaned"),
        )
    )
    return (
        base.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.size("w").cast("long").alias("n_orig"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            TH.portable_hash64(F.coalesce(F.col("cleaned"), F.lit(""))).alias(
                "clean_hash"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text_pii_scrub: the scrubber under a value oracle
# ---------------------------------------------------------------------------

def _pii_oracle() -> str:
    # patterns contain no single quotes; DuckDB single-quoted strings
    # pass backslashes through unescaped
    email = PII_PATTERNS["email"]
    ipv4 = PII_PATTERNS["ipv4"]
    phone = PII_PATTERNS["phone"]
    aug = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@ex' || "
        "CAST(doc_id % 7 AS VARCHAR) || '.example.com from 10.' || "
        "CAST(doc_id % 256 AS VARCHAR) || '.' || "
        "CAST(doc_id % 100 AS VARCHAR) || '.7 call +1 555-01' || "
        "CAST(doc_id % 100 AS VARCHAR) || "
        "(CASE WHEN doc_id % 3 = 0 THEN ' cc bob' || CAST(doc_id AS VARCHAR)"
        " || '@corp.net' ELSE '' END) || ' ok'"
    )
    scrub = (
        "regexp_replace(regexp_replace(regexp_replace(aug, "
        "'" + email + "', '<EMAIL>', 'g'), "
        "'" + ipv4 + "', '<IP>', 'g'), "
        "'" + phone + "', '<PHONE>', 'g')"
    )
    return (
        "WITH a AS (SELECT doc_id, " + aug + " AS aug FROM documents)\n"
        "SELECT doc_id,\n"
        "  CAST(len(regexp_extract_all(aug, '" + email + "')) AS BIGINT) AS n_email,\n"
        "  CAST(len(regexp_extract_all(aug, '" + ipv4 + "')) AS BIGINT) AS n_ipv4,\n"
        "  CAST(len(regexp_extract_all(aug, '" + phone + "')) AS BIGINT) AS n_phone,\n"
        "  md5(" + scrub + ") AS scrub_md5\n"
        "FROM a"
    )


@query("text_pii_scrub", oracle=_pii_oracle())
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`scrub_pii` under the driver's value gate. The fixture corpus is
    digit-free, so each document is deterministically AUGMENTED with
    synthetic PII derived from its own doc_id (an email, an IPv4, a
    phone-shaped digit run, and a second email on every 3rd doc) —
    both engines build the identical augmented text, so the oracle
    verifies the regex COUNTS and the byte-exact md5 of the scrubbed
    output (tags substituted, everything else untouched), not just row
    plumbing. Patterns are Java-regex ∩ RE2 by construction
    (PII_PATTERNS), which is what makes the cross-engine hash possible.

    Scale shape: pure per-row JVM regex projection — no shuffle, no
    UDF; at 100 TB this runs at scan speed inside the same
    whole-stage-codegen span as the read.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), s(d), F.lit("@ex"), s(d % 7),
        F.lit(".example.com from 10."), s(d % 256), F.lit("."), s(d % 100),
        F.lit(".7 call +1 555-01"), s(d % 100),
        F.when(
            d % 3 == 0, F.concat(F.lit(" cc bob"), s(d), F.lit("@corp.net"))
        ).otherwise(F.lit("")),
        F.lit(" ok"),
    )
    out = scrub_pii(docs.select("doc_id", aug.alias("text")))
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.md5(F.col("text_scrubbed")).alias("scrub_md5"),
    )


# --- text_quality_classifier ------------------------------------------------

QC_DIM = 256            #: hashed feature buckets
QC_A, QC_B = 1_103_515_245, 12_345  #: seeded weight generator (LCG form)
QC_WSPAN = 2_001        #: weights take integer values in [-1000, 1000]


@query(
    "text_quality_classifier",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, unnest({TH.sql_words('text')}) AS tok FROM documents
    ),
    scored AS (
      SELECT doc_id,
             count(*) AS n_tok,
             sum((({TH.sql_portable_tid('tok')} % {QC_DIM}) * {QC_A}
                   + {QC_B}) % {TH.MERSENNE_P} % {QC_WSPAN} - 1000)
               AS score_sum
      FROM t GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(score_sum * 1000 // n_tok AS BIGINT) AS score_milli,
           (score_sum >= 0) AS keep
    FROM scored
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (the fastText-classifier filter
    step of CCNet/GPT-3-style pipelines, distinct from text_quality's
    hand heuristics): each token hashes into {QC_DIM} feature buckets,
    each bucket carries a weight, a document's score is the weight sum
    and the keep decision is its sign. The weight table here is
    GENERATED from a seeded integer recurrence (training a real
    classifier is an offline step out of scope — the weights are a
    deterministic stand-in, clearly not learned); the SERVING shape is
    the real deliverable: per-token weight lookup is a stateless
    expression, so scoring runs at scan speed with no model
    distribution step at all (a learned {QC_DIM}-float table would
    broadcast instead — same plan, one extra broadcast).

    Scale shape: explode → per-doc sum. One partial-agg shuffle keyed
    by doc_id; all integer arithmetic (score·1000 div n_tok), so both
    engines produce bit-identical scores and the oracle value-hash
    matches. At 100 TB this is the cheapest possible corpus filter
    after pure row predicates.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TH.words_expr("text")).alias("tok")
    )
    bucket = TH.portable_tid(F.col("tok")) % QC_DIM
    weight = (
        bucket * QC_A + QC_B
    ) % TH.MERSENNE_P % QC_WSPAN - 1000
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(weight).alias("score_sum"),
        )
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.expr("score_sum * 1000 div n_tok").cast("long")
            .alias("score_milli"),
            (F.col("score_sum") >= 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (head / middle / tail)
# ---------------------------------------------------------------------------

PPL_SAMPLE_K = 256  #: KMV sample size for the tercile thresholds


def _ppl_buckets_oracle() -> str:
    w = TH.sql_words("text")
    h = TH.sql_portable_hash64("CAST(doc_id AS VARCHAR)")
    return f"""
    WITH base AS (SELECT doc_id, {w} AS w FROM documents),
    toks AS (SELECT unnest(w) AS word FROM base),
    uni AS (SELECT word, count(*) AS cu FROM toks GROUP BY word),
    v AS (SELECT count(*) AS nv FROM uni),
    pairs AS (
      SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS bg
        FROM base) t
    ),
    bi AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
    p6t AS (
      SELECT p.doc_id,
             CAST(floor(1e6 * (b.cb + 1) / (u.cu + (SELECT nv FROM v)) + 0.5)
                  AS BIGINT) AS p6
      FROM pairs p
      JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
      JOIN uni u ON u.word = p.w1
    ),
    scored AS (
      SELECT doc_id, CAST(sum(p6) // count(*) AS BIGINT) AS score6
      FROM p6t GROUP BY doc_id
    ),
    samp AS (
      SELECT score6 FROM (
        SELECT score6,
               row_number() OVER (ORDER BY {h}, score6) AS rn
        FROM scored) WHERE rn <= {PPL_SAMPLE_K}
    ),
    th AS (
      SELECT vals[CAST((33 * (n - 1)) // 100 AS BIGINT) + 1] AS t1,
             vals[CAST((66 * (n - 1)) // 100 AS BIGINT) + 1] AS t2
      FROM (SELECT list_sort(list(score6)) AS vals, count(*) AS n FROM samp)
    )
    SELECT s.doc_id, s.score6,
           CASE WHEN s.score6 <= th.t1 THEN 'tail'
                WHEN s.score6 <= th.t2 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM scored s CROSS JOIN th
    """


@query("text_ppl_buckets", oracle=_ppl_buckets_oracle())
def text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail PARTITION (Wenzek et al. 2020): score
    every document with the corpus bigram LM (docs_ngram_lm's
    statistic as an exact integer per-doc score) and split the corpus
    at the sample 33rd/66th percentiles — 'head' = most in-domain,
    'tail' = the perplexity outliers a pre-training pipeline drops or
    down-weights. This turns the LM score into the DECISION artifact
    (like dedup_semantic does for the pair graph).

    The tercile thresholds come from the agg_quantile_sketch
    primitive — the {PPL_SAMPLE_K}-doc KMV bottom-k-by-hash sample of
    the per-doc scores, quantiles read off the value-sorted sample —
    NOT from an exact global percentile: a corpus-wide exact
    percentile needs per-group state ∝ documents (billions at
    100 TB), while the sample is constant-size, mergeable, and
    engine-exact (so the driver can value-hash the buckets). Rank
    error O(1/√{PPL_SAMPLE_K}) moves the two cut points by at most a
    few percentile points — immaterial for a tercile split, and
    deterministic either way.

    Scale shape: the LM build is docs_ngram_lm's (two count shuffles,
    broadcast model); scoring is one per-doc aggregate; thresholds
    are one constant-size aggregate broadcast back; bucketing is a
    per-row CASE. The scored table is cached across its two reads.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = TH.words_expr("text")
    n = F.size(ws)
    pair_structs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(ws, 1, n - 1),
            F.slice(ws, 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    base = docs.select("doc_id", ws.alias("w"))
    uni = base.select(F.explode("w").alias("word")).groupBy("word").agg(
        F.count(F.lit(1)).alias("cu")
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("nv"))
    pairs = docs.select(
        "doc_id", F.explode(pair_structs).alias("bg")
    ).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    # (no cache on pairs: A/B measured the columnar encode of the wide
    # string stream costing more than the second tokenize it saves —
    # plans/r15/AB_ppl_lm_join.json)
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    p6 = F.floor(
        1e6 * (F.col("cb") + 1) / (F.col("cu") + F.col("nv")) + F.lit(0.5)
    ).cast("long")
    # fold the unigram denominator and vocab smoothing into the
    # AGGREGATED bigram table — p6 is a function of (cb, cu(w1), nv),
    # i.e. of the bigram TYPE: scoring it once per distinct bigram and
    # assigning to occurrences is identical to scoring per occurrence,
    # and it removes a full shuffle of the occurrence stream by w1
    # (before: pairs⋈bi then THAT⋈uni; after: pairs joins one
    # per-bigram lm table on one key)
    lm = (
        bi.join(uni.withColumnRenamed("word", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("w1", "w2", p6.alias("p6"))
    )
    scored = (
        pairs.join(lm, ["w1", "w2"])
        .select("doc_id", "p6")
        .groupBy("doc_id")
        .agg(F.expr("CAST(sum(p6) DIV count(*) AS LONG)").alias("score6"))
        .cache()
    )
    # KMV sample via the agg_quantile_sketch map-side collapse — NOT a
    # global row_number window (that is a single-partition sort of
    # every doc score at scale): each Arrow batch keeps its bottom-K
    # (hash, score) rows, the final bounded aggregate merges partials
    # by sort+truncate (bottom-k union IS bottom-k), then reads the
    # two cut points off the value-sorted sample
    hh = TH.portable_hash64(F.col("doc_id").cast("string"))

    def _part(batches):
        for pdf in batches:
            if len(pdf):
                yield pdf.sort_values(["h", "score6"]).head(PPL_SAMPLE_K)

    samp_part = scored.select(hh.alias("h"), "score6").mapInPandas(
        _part, "h long, score6 long"
    )
    merged = (
        f"array_sort(transform(slice(array_sort("
        f"collect_list(struct(h, score6))), 1, {PPL_SAMPLE_K}),"
        f" x -> x.score6))"
    )
    th = samp_part.agg(
        F.expr(
            f"{merged}[CAST((33 * (least(count(h), {PPL_SAMPLE_K}) - 1))"
            f" DIV 100 AS INT)]"
        ).alias("t1"),
        F.expr(
            f"{merged}[CAST((66 * (least(count(h), {PPL_SAMPLE_K}) - 1))"
            f" DIV 100 AS INT)]"
        ).alias("t2"),
    )
    return scored.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "score6",
        F.when(F.col("score6") <= F.col("t1"), "tail")
        .when(F.col("score6") <= F.col("t2"), "middle")
        .otherwise("head")
        .alias("bucket"),
    )

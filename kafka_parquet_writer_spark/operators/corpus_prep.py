"""Training-corpus preparation operators: sliding-window chunking,
token-budget sequence packing, column profiling, SCD2 dimension build,
and corpus heavy-hitters.

These are the batch transforms an LLM training-data pipeline runs after
dedup/quality (operators/dedup.py, operators/text.py): split documents
into model-window chunks, pack them into fixed token budgets, profile
the tables being shipped, and track slowly-changing attributes. The
reference engine stops at parquet landing
(`KafkaProtoParquetWriter.java:156-380`); this is the consumer-side
surface over that landed data. All operators are pure JVM expression
pipelines with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions import texthash as TH
from kafka_parquet_writer_spark.functions.portable import (
    cents,
    pround,
    sql_cents,
    sql_pround,
)
from kafka_parquet_writer_spark.registry import query

#: chunking window: tokens per chunk / stride between chunk starts
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

#: packing: target tokens per packed sequence, and the doc_id block size
#: used to shard the distributed prefix sum
PACK_BUDGET = 2048
PACK_BLOCK = 64

#: heavy hitters: minimum document frequency, percent of corpus
HH_MIN_DF_PCT = 5


@query(
    "text_chunk",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {TH.sql_words('text')} AS w FROM documents
    ), s AS (
      SELECT doc_id, w, unnest(range(0, len(w), {CHUNK_STRIDE})) AS st
      FROM w WHERE len(w) > 0
    ), c AS (
      SELECT doc_id,
             CAST(st // {CHUNK_STRIDE} AS BIGINT) AS chunk_seq,
             list_slice(w, st + 1, st + {CHUNK_TOKENS}) AS chunk
      FROM s
    )
    SELECT doc_id, chunk_seq,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           {TH.sql_portable_hash64("array_to_string(chunk, ' ')")} AS chunk_hash
    FROM c
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    {CHUNK_TOKENS}-token windows every {CHUNK_STRIDE} tokens (the
    context-window prep step of an LLM pipeline); emit one row per
    chunk with a portable content hash.

    Scale shape: tokenize → per-row sequence of start offsets →
    explode. Zero shuffles — chunking is embarrassingly parallel, the
    explode fan-out (~len/stride per doc) stays inside the scan stage,
    and the chunk text itself never leaves the task (only the 64-bit
    hash is emitted). At 100 TB this is a map-only pass bounded by
    scan I/O.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", TH.words_expr("text").alias("w")
    )
    n = F.size("w")
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    ).otherwise(F.lit(None))
    chunk = F.slice(F.col("w"), F.col("st") + 1, CHUNK_TOKENS)
    return (
        docs.select("doc_id", F.explode(starts).alias("st"), "w")
        .select(
            "doc_id",
            F.floor(F.col("st") / CHUNK_STRIDE).cast("long").alias("chunk_seq"),
            chunk.alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_seq",
            F.size("chunk").cast("long").alias("n_tokens"),
            TH.portable_hash64(F.array_join("chunk", " ")).alias("chunk_hash"),
        )
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({TH.sql_words('text')}) AS BIGINT) AS t
      FROM documents
    ), c AS (
      SELECT doc_id, t,
             COALESCE(sum(t) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM t
    )
    SELECT CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS bin_id,
           count(*)                                    AS n_docs,
           min(doc_id)                                 AS first_doc,
           max(doc_id)                                 AS last_doc,
           CAST(sum(t) AS BIGINT)                      AS tok_sum,
           {sql_pround(f'sum(t) * 100.0 / {PACK_BUDGET}', 2)} AS fill_pct
    FROM c
    GROUP BY bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign documents (in doc_id
    order) to consecutive {PACK_BUDGET}-token bins — a doc goes to the
    bin its cumulative start offset falls in, so bins overflow by at
    most one document. One row per bin with fill statistics.

    Scale shape: the global running sum is computed as a DISTRIBUTED
    prefix sum, not a single-task window. Docs shard into doc_id
    blocks of {PACK_BLOCK}; per-shard token totals (one tiny row per
    shard) take a driver-size window pass to become shard offsets,
    which broadcast-join back so each shard computes its local cumsum
    independently (`partitionBy(shard)`). The oracle's plain
    `sum() OVER (ORDER BY doc_id)` is the single-node semantics; the
    Spark plan never materializes a 1-partition window over the
    corpus — the classic parallel scan decomposition.
    """
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(TH.words_expr("text")).cast("long").alias("t"),
    )
    return pack_bins(toks)


def pack_bins(toks: DataFrame) -> DataFrame:
    """The distributed-prefix-sum packing over any (doc_id, t) frame —
    shared by pack_sequences and the end-to-end training-corpus
    pipeline (which packs only the curation survivors)."""
    toks = toks.withColumn("shard", F.floor(F.col("doc_id") / PACK_BLOCK)).cache()
    # ^ two consumers (shard totals + the local-cumsum join). The
    # cached row is three int64s — for pack_sequences the cache saves a
    # second tokenize pass; for pipeline_train_corpus it saves
    # re-running the ENTIRE mixture-sample + decontaminate chain that
    # feeds it (the whole upstream pipeline executed once per consumer)
    shard_tot = toks.groupBy("shard").agg(F.sum("t").alias("st"))
    w_shard = W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
    offsets = shard_tot.select(
        "shard", F.coalesce(F.sum("st").over(w_shard), F.lit(0)).alias("off")
    )
    w_local = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    binned = (
        toks.join(F.broadcast(offsets), "shard")
        .withColumn(
            "cum_before",
            F.coalesce(F.sum("t").over(w_local), F.lit(0)) + F.col("off"),
        )
        .withColumn(
            "bin_id", F.floor(F.col("cum_before") / PACK_BUDGET).cast("long")
        )
    )
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum("t").alias("tok_sum"),
        pround(F.sum("t") * 100.0 / PACK_BUDGET, 2).alias("fill_pct"),
    )


#: (column name in output, Spark string expression, DuckDB string expression)
_PROFILE_COLS = [
    ("o_orderkey", lambda: F.col("o_orderkey").cast("string"),
     "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", lambda: F.col("o_custkey").cast("string"),
     "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", lambda: F.col("o_orderstatus"), "o_orderstatus"),
    ("o_orderpriority", lambda: F.col("o_orderpriority"), "o_orderpriority"),
    ("o_orderdate", lambda: F.date_format("o_orderdate", "yyyy-MM-dd"),
     "strftime(o_orderdate, '%Y-%m-%d')"),
    ("o_totalprice_cents",
     lambda: cents(F.col("o_totalprice")).cast("string"),
     f"CAST({sql_cents('o_totalprice')} AS VARCHAR)"),
]


def _profile_oracle() -> str:
    arms = "\n      UNION ALL ".join(
        f"SELECT '{name}' AS col_name, {sql_expr} AS val FROM orders"
        for name, _, sql_expr in _PROFILE_COLS
    )
    return f"""
    WITH long AS (
      {arms}
    )
    SELECT col_name,
           count(*)            AS n_rows,
           count(val)          AS n_nonnull,
           count(DISTINCT val) AS n_distinct,
           min(val)            AS min_val,
           max(val)            AS max_val
    FROM long
    GROUP BY col_name
    """


@query("profile_columns", oracle=_profile_oracle())
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile of `orders`: per column, row/null/
    distinct counts and min/max — the pre-shipment audit a pipeline
    runs on every landed table. Numerics profile through portable
    string forms (ints as decimal strings, money as fixed-point cents,
    dates as ISO) so both engines compare identical bytes.

    Scale shape: one scan; each row explodes into (col_name, value)
    pairs so the whole profile is a single explode + one hash
    aggregate keyed by column name — no per-column scan loop, no
    driver iteration, and the shuffle carries only distinct
    (col, value) pairs after partial aggregation. count(DISTINCT)
    per group rewrites to a two-phase exact distinct; for columns
    where an estimate suffices, approx_count_distinct drops the
    second phase (documented, not declared).
    """
    orders = load_table(spark, sf_dir, "orders")
    kv = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"), expr().alias("val")
            )
            for name, expr, _ in _PROFILE_COLS
        ]
    )
    long = orders.select(F.explode(kv).alias("kv")).select("kv.*")
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


@query(
    "dim_scd2",
    oracle="""
    WITH x AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id, event_type FROM events
    ), g AS (
      SELECT user_id, event_type, tu, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY tu, event_id) AS prev
      FROM x
    ), c AS (
      SELECT user_id, event_type, tu, event_id FROM g
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type,
           tu                                  AS valid_from_us,
           lead(tu) OVER w                     AS valid_to_us,
           CAST(row_number() OVER w AS BIGINT) AS version_seq,
           CAST(CASE WHEN lead(tu) OVER w IS NULL
                     THEN 1 ELSE 0 END AS INTEGER) AS is_current
    FROM c
    WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    """,
)
def dim_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the event stream:
    collapse each user's event_type runs into effective-dated versions
    [valid_from, valid_to), open-ended (NULL valid_to, is_current=1)
    for the latest — the standard warehouse history table over landed
    CDC/event data.

    Scale shape: ONE shuffle on user_id serves both window passes
    (change detection, then validity ranges over the filtered change
    rows — Catalyst reuses the hash partitioning since both windows
    key on user_id). Version chains are per-user local; no global
    ordering, no driver state.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        "event_type",
    )
    w = W.partitionBy("user_id").orderBy("tu", "event_id")
    changes = ev.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return changes.select(
        "user_id",
        "event_type",
        F.col("tu").alias("valid_from_us"),
        F.lead("tu").over(w).alias("valid_to_us"),
        F.row_number().over(w).cast("long").alias("version_seq"),
        F.when(F.lead("tu").over(w).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_current"),
    )


@query(
    "text_heavy_hitters",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest({TH.sql_words('text')}) AS token
      FROM documents
    ), freq AS (
      SELECT token, count(*) AS doc_freq FROM dt GROUP BY token
    ), tot AS (
      SELECT count(*) AS n_docs FROM documents
    )
    SELECT token, doc_freq,
           {sql_pround('doc_freq * 100.0 / n_docs', 2)} AS df_pct
    FROM freq, tot
    WHERE doc_freq * 100 >= n_docs * {HH_MIN_DF_PCT}
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitters: tokens whose DOCUMENT frequency is at
    least {HH_MIN_DF_PCT}% of the corpus (frequent-pattern mining's
    support threshold; the candidate stopword/boilerplate list a
    cleaning pipeline feeds back into quality scoring).

    Scale shape: per-doc distinct tokens explode → partial hash agg →
    shuffle only the vocabulary; the corpus size arrives as a 1-row
    broadcast (the scalar-subquery plan of analytics.subquery_scalar).
    The threshold compare is integer arithmetic — no float threshold
    drift between engines. At 100 TB the exact count is
    vocabulary-bound; the sketched variant (count-min + Misra-Gries
    merge in applyInPandas) trades exactness for constant memory and
    is documented here rather than declared.
    """
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TH.words_expr("text"))).alias("token"),
    )
    freq = dt.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    tot = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        freq.crossJoin(F.broadcast(tot))
        .where(F.col("doc_freq") * 100 >= F.col("n_docs") * HH_MIN_DF_PCT)
        .select(
            "token",
            "doc_freq",
            pround(F.col("doc_freq") * 100.0 / F.col("n_docs"), 2).alias(
                "df_pct"
            ),
        )
    )


#: inverted index: cap stored postings per token (real indexes shard
#: long postings; the count is always exact)
INDEX_POSTINGS_CAP = 64


@query(
    "text_inverted_index",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest({TH.sql_words('text')}) AS token
      FROM documents
    )
    SELECT token,
           count(*) AS df,
           array_to_string(
             list_slice(list(doc_id ORDER BY doc_id),
                        1, {INDEX_POSTINGS_CAP}), ',') AS postings_head
    FROM dt
    GROUP BY token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token → document frequency + the sorted
    postings head (first {INDEX_POSTINGS_CAP} doc_ids, comma-joined) —
    the IR index-construction pass over a landed corpus.

    Scale shape: distinct (doc, token) pairs → partial hash agg →
    shuffle only the vocabulary; postings accumulate via collect_list
    under the aggregate (sorted after, capped so row width is bounded
    — a production index spills long postings to segment files, which
    is exactly what the cap models). df stays exact regardless of the
    cap. No Python, no driver collection.
    """
    docs = load_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TH.words_expr("text"))).alias("token"),
    )
    return dt.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_join(
            F.slice(
                F.sort_array(F.collect_list("doc_id")),
                1,
                INDEX_POSTINGS_CAP,
            ),
            ",",
        ).alias("postings_head"),
    )


#: fuzzy matching: maximum edit distance for a candidate merge
ER_MAX_DIST = 2


@query(
    "er_fuzzy_name_match",
    oracle=f"""
    WITH n AS (
      SELECT DISTINCT p_name AS name FROM part
    ), b AS (
      SELECT name,
             string_split(name, ' ')[-1] AS block,
             length(name)               AS ln
      FROM n
    )
    SELECT a.name AS name_a, c.name AS name_b,
           CAST(levenshtein(a.name, c.name) AS INTEGER) AS dist
    FROM b a JOIN b c
      ON a.block = c.block
     AND a.name < c.name
     AND c.ln BETWEEN a.ln - {ER_MAX_DIST} AND a.ln + {ER_MAX_DIST}
    WHERE levenshtein(a.name, c.name) <= {ER_MAX_DIST}
    """,
)
def er_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution / record linkage: candidate merges among part
    names at edit distance ≤ {ER_MAX_DIST}, found by BLOCKED fuzzy
    matching — candidates must share a blocking key (last name token)
    and a ±{ER_MAX_DIST} length band before the quadratic Levenshtein
    runs. The declared operator IS the blocked algorithm on both
    engines (the LSH-oracle pattern), because exact all-pairs edit
    distance is the scale-killer this operator exists to avoid.

    Scale shape: dedupe to distinct names first (names repeat across
    rows; resolution work is vocabulary-bound), then an equi-join on
    the block key — cost ∝ Σ block², never |N|². The length band
    prunes inside blocks (|len(a)−len(b)| > d ⇒ dist > d, a lossless
    filter). Production blocking unions several keys (phonetic code,
    token prefixes, q-gram LSH) and dedups pairs; each key is this
    same plan.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    b = names.select(
        "name",
        F.element_at(F.split("name", " "), -1).alias("block"),
        F.length("name").alias("ln"),
    )
    a = b.select(
        F.col("name").alias("name_a"),
        F.col("block").alias("block"),
        F.col("ln").alias("ln_a"),
    )
    c = b.select(
        F.col("name").alias("name_b"),
        F.col("block").alias("block"),
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(c, "block")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.col("ln_b") >= F.col("ln_a") - ER_MAX_DIST)
            & (F.col("ln_b") <= F.col("ln_a") + ER_MAX_DIST)
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= ER_MAX_DIST)
    )


#: equi-width histogram buckets
HIST_BUCKETS = 16


@query(
    "agg_histogram",
    oracle=f"""
    WITH x AS (
      SELECT {sql_cents('o_totalprice')} AS vc FROM orders
    ), b AS (
      SELECT min(vc) AS mn,
             (max(vc) - min(vc) + {HIST_BUCKETS}) // {HIST_BUCKETS} AS width,
             count(*) AS total
      FROM x
    )
    SELECT CAST((vc - mn) // width AS BIGINT)       AS bucket,
           CAST(mn + ((vc - mn) // width) * width AS BIGINT) AS lo_cents,
           count(*)                                 AS n,
           {sql_pround('count(*) * 100.0 / max(total)', 2)} AS pct
    FROM x, b
    GROUP BY bucket, lo_cents
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: data-driven bounds, {HIST_BUCKETS}
    fixed-width buckets — the distribution sketch a profiler ships next
    to `profile_columns`' min/max, and the stats an optimizer's
    selectivity estimate wants.

    Scale shape: bounds are a 1-row aggregate broadcast back (the
    scalar-subquery plan); bucketing is then a pure per-row integer
    expression and the histogram itself one partial-agg'd shuffle of at
    most {HIST_BUCKETS} groups. width = ceil((range+1)/buckets) in
    integer arithmetic, so bucket ids stay in [0, {HIST_BUCKETS}) by
    construction — no float edge cases at the max, no clamp needed.
    """
    x = load_table(spark, sf_dir, "orders").select(
        cents(F.col("o_totalprice")).alias("vc")
    )
    b = x.agg(
        F.min("vc").alias("mn"),
        F.floor(
            (F.max("vc") - F.min("vc") + HIST_BUCKETS) / HIST_BUCKETS
        ).alias("width"),
        F.count(F.lit(1)).alias("total"),
    )
    bucket = F.floor((F.col("vc") - F.col("mn")) / F.col("width"))
    return (
        x.crossJoin(F.broadcast(b))
        .select(
            bucket.cast("long").alias("bucket"),
            (F.col("mn") + bucket * F.col("width"))
            .cast("long")
            .alias("lo_cents"),
            "total",
        )
        .groupBy("bucket", "lo_cents")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.count(F.lit(1)) * 100.0 / F.max("total"), 2).alias(
                "pct"
            ),
        )
    )


#: tf-idf: top terms kept per document
TFIDF_TOPK = 3


@query(
    "text_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({TH.sql_words('text')}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM tok GROUP BY doc_id, token
    ), dfreq AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), w AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             {sql_pround('tf.tf * ln((n_docs + 1.0) / (df + 1.0))', 6)}
               AS wgt
      FROM tf JOIN dfreq USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, wgt,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY wgt DESC, token) AS INTEGER)
             AS rnk
    FROM w
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY wgt DESC, token) <= {TFIDF_TOPK}
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: each document's top {TFIDF_TOPK}
    terms by tf·idf (smoothed idf = ln((N+1)/(df+1))) — the classic IR
    weighting, and the keyword/topic signal a corpus pipeline attaches
    per document next to `text_quality`.

    Scale shape: term frequencies partial-aggregate before their
    shuffle on (doc, token); document frequencies are vocabulary-bound
    (the `text_inverted_index` shuffle); the tf⋈df join keys on token
    (vocabulary-sized build side — broadcastable at production scale,
    left to AQE here); the corpus size N arrives as a 1-row broadcast.
    Per-doc top-k is a window, never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(TH.words_expr("text")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tok.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            pround(
                F.col("tf")
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("wgt"),
        )
    )
    win = W.partitionBy("doc_id").orderBy(F.col("wgt").desc(), "token")
    return (
        w.withColumn("rnk", F.row_number().over(win).cast("int"))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "wgt", "rnk")
    )


#: referential-integrity audit: (name, child table, fk col, parent
#: table, pk col) — the fixture schema's full FK graph
_FK_EDGES = [
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _audit_oracle() -> str:
    arms = "\n    UNION ALL ".join(
        f"""SELECT '{name}' AS relation,
           (SELECT count(*) FROM {child}) AS n_child,
           (SELECT count(*) FROM {child} c LEFT JOIN {parent} p
              ON c.{fk} = p.{pk} WHERE p.{pk} IS NULL) AS n_orphans"""
        for name, child, fk, parent, pk in _FK_EDGES
    )
    return arms


@query("audit_referential", oracle=_audit_oracle())
def audit_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: for every foreign-key edge in the
    schema, the child row count and the orphan count (child keys with
    no parent) — the pre-shipment contract check a pipeline runs on
    every landed snapshot, next to `profile_columns`.

    Scale shape: each edge is one count plus one LEFT ANTI join —
    parent key sets are dimension-sized and broadcast (nation, region,
    part, supplier, customer); the two fact-fact edges shuffle on the
    join key like any fact join. The six audits are independent
    pipelines unioned at one row each (count ⨯ orphan-count, two 1-row
    aggregates cross-joined — no driver-side action), so they run
    concurrently within the job. A production audit fuses
    count+orphans into one pass per child with a conditional
    aggregate; at fixture scale the clearer two-pass form wins.
    """
    parts = []
    for name, child, fk, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk).distinct()
        totals = c.agg(F.count(F.lit(1)).alias("n_child"))
        orphans = (
            c.select(fk)
            .join(F.broadcast(p), F.col(fk) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        parts.append(
            totals.crossJoin(orphans).select(
                F.lit(name).alias("relation"), "n_child", "n_orphans"
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


@query(
    "spine_gap_fill",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr FROM b
    ), actual AS (
      SELECT date_trunc('hour', ts) AS hr, count(*) AS n
      FROM events GROUP BY hr
    )
    SELECT strftime(s.hr, '%Y-%m-%d %H') AS hour_key,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN actual a ON a.hr = s.hr
    """,
)
def spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine densification: an hourly spine from the data's
    own bounds, left-joined to hourly event counts so silent gaps
    become explicit zero rows — what monitoring, gap-alerting, and
    regular-interval models (forecasting, windowed anomaly scores)
    need before they can trust a time series.

    Scale shape: bounds are a 1-row aggregate; the spine generates as
    one `sequence()` explode from that row (span-bound, not data-
    bound); hourly counts partial-aggregate before their shuffle; the
    spine⋈counts join is on the hour key — hours are few relative to
    events, so the joined sides are both tiny post-aggregation.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = b.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hr")
    )
    actual = (
        ev.select(F.date_trunc("hour", "ts").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(actual, "hr", "left").select(
        F.date_format("hr", "yyyy-MM-dd HH").alias("hour_key"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# entity clusters (connected components over the fuzzy-match graph)
# ---------------------------------------------------------------------------


def _er_clusters_oracle() -> str:
    from kafka_parquet_writer_spark.operators.dedup import sql_cc_oracle
    from kafka_parquet_writer_spark.registry import ORACLES

    return sql_cc_oracle(
        ORACLES["er_fuzzy_name_match"], "name_a", "name_b",
        "name", "canonical",
    )


@query("er_cluster_entities", oracle=_er_clusters_oracle())
def er_cluster_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity CLUSTERS: connected components over the blocked
    fuzzy-match pair graph (er_fuzzy_name_match), labeling every
    matched name with its lexicographic-min reachable name as the
    canonical entity — the step that turns pairwise record linkage
    into a merge decision (rewrite every variant to its canonical).

    Scale shape: the same alternating large-star/small-star CC engine
    as dedup_clusters (O(log n) rounds regardless of chain length —
    name-variant chains are exactly the long-diameter case label
    propagation loses on), running on STRING node ids: the algorithm
    is pure comparisons, so no integer re-keying pass is needed.
    """
    from kafka_parquet_writer_spark.operators.dedup import (
        connected_components,
    )

    pairs = er_fuzzy_name_match(spark, sf_dir).select(
        F.col("name_a").alias("d1"), F.col("name_b").alias("d2")
    )
    return connected_components(pairs).select(
        F.col("doc").alias("name"), F.col("comp").alias("canonical")
    )


# --- text_line_dedup --------------------------------------------------------

LINE_N = 3  #: words per segmentation line


@query(
    "text_line_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {TH.sql_words('text')} AS ws FROM documents
    ),
    lines AS (
      SELECT doc_id, u.i AS idx,
             array_to_string(
               ws[(u.i - 1) * {LINE_N} + 1 : u.i * {LINE_N}], ' ') AS line
      FROM (
        SELECT doc_id, ws,
               unnest(list_transform(
                 range(1, CAST(ceil(len(ws) / {LINE_N}.0) AS BIGINT) + 1),
                 i -> struct_pack(i := i))) AS u
        FROM w
      )
    ),
    kept AS (
      SELECT doc_id, idx, line
      FROM lines
      QUALIFY row_number() OVER (PARTITION BY line
                                 ORDER BY doc_id, idx) = 1
    ),
    totals AS (
      SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
    )
    SELECT t.doc_id AS doc_id,
           CAST(t.n_lines AS BIGINT) AS n_lines,
           CAST(count(k.line) AS BIGINT) AS n_kept,
           md5(string_agg(k.line, ' ' ORDER BY k.idx)) AS clean_md5
    FROM totals t JOIN kept k ON k.doc_id = t.doc_id
    GROUP BY t.doc_id, t.n_lines
    """,
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide LINE-level dedup — the CCNet/Gopher curation step
    exact-doc dedup misses: documents share boilerplate lines without
    being duplicates themselves. Text segments into fixed
    {LINE_N}-word lines; across the WHOLE corpus each distinct line
    survives only at its first occurrence (smallest (doc_id,
    position)); every document is then reassembled from its surviving
    lines in order. Emits per-doc line counts and the byte-exact md5
    of the cleaned text, so the oracle verifies the reassembly —
    ordering included — not just the counts. (~19% of fixture lines
    are cross-doc duplicates at this granularity.)

    Scale shape: segmentation is a per-row transform (no explode until
    the line table, which is ~|tokens|/{LINE_N} rows); first-occurrence
    is ONE window over the line-hash shuffle (at 100 TB: partial
    min-per-line pre-aggregation before the shuffle — same key); the
    reassembly groupBy shuffles only SURVIVING lines. Exactly the
    dedup_exact pattern applied inside documents.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = TH.words_expr("text")
    n_lines = F.ceil(F.size(ws) / F.lit(float(LINE_N))).cast("long")
    # guard: for a zero-token doc, sequence(1, 0) would default to step
    # -1 and yield [1, 0] (two bogus lines); DuckDB's range(1, 1) is
    # empty — same guard as text_chunk above.
    idx_seq = F.when(
        n_lines > 0, F.sequence(F.lit(1), n_lines.cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    lines = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idx_seq,
                lambda i: F.array_join(
                    F.slice(ws, (i - 1) * LINE_N + 1, LINE_N), " "
                ),
            )
        ).alias("pos0", "line"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("idx"), "line"
    )
    w = W.partitionBy("line").orderBy("doc_id", "idx")
    kept = (
        lines.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # n_lines per doc == len(idx_seq) by construction — read it off the
    # doc row instead of segmenting + exploding + counting a second
    # time (the before plan ran the whole line emission twice and
    # shuffled the exploded rows just to count them per doc)
    totals = docs.select("doc_id", n_lines.alias("n_lines"))
    return (
        kept.join(totals, "doc_id")
        .groupBy("doc_id", "n_lines")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("idx", "line"))
                        ),
                        lambda x: x["line"],
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
        .select("doc_id", "n_lines", "n_kept", "clean_md5")
    )


# --- text_bpe_merge_candidates ----------------------------------------------

BPE_TOPK = 50  #: merge candidates reported


@query(
    "text_bpe_merge_candidates",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {TH.sql_words('text')} AS ws FROM documents
    ),
    pairs AS (
      SELECT ws[r.i] AS a, ws[r.i + 1] AS b
      FROM w, range(1, 1000000) AS r(i)
      WHERE r.i + 1 <= len(ws)
    ),
    uni AS (
      SELECT tok, count(*) AS n FROM (
        SELECT unnest(ws) AS tok FROM w) GROUP BY tok
    ),
    tot AS (SELECT count(*) AS n_tot FROM (SELECT unnest(ws) FROM w)),
    pc AS (SELECT a, b, count(*) AS n_ab FROM pairs GROUP BY a, b)
    SELECT pc.a AS a, pc.b AS b,
           CAST(pc.n_ab AS BIGINT) AS n_ab,
           CAST(pc.n_ab * t.n_tot * 1000 // (ua.n * ub.n) AS BIGINT)
             AS lift_milli
    FROM pc
    JOIN uni ua ON ua.tok = pc.a
    JOIN uni ub ON ub.tok = pc.b
    CROSS JOIN tot t
    ORDER BY pc.n_ab DESC, pc.a, pc.b
    LIMIT {BPE_TOPK}
    """,
)
def text_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, step one: mine the top-{BPE_TOPK} ADJACENT
    token pairs by corpus frequency — exactly the statistic a BPE/
    WordPiece trainer maximizes per merge round — with an integer
    association lift (n_ab·N·1000 div n_a·n_b, monotone in PMI) to
    separate genuinely-collocated pairs from products of two frequent
    tokens. Pair extraction is array-domain (a per-row transform over
    token positions), NOT a self-join of the token table on adjacent
    positions — at 100 TB the positional self-join would shuffle the
    whole exploded corpus twice.

    Scale shape: one explode → (a, b) count shuffle with map-side
    combine (distinct pairs, not occurrences, cross the wire), one
    unigram count shuffle, then broadcast unigram/total lookups onto
    the pair table and a TakeOrderedAndProject top-{BPE_TOPK} — no
    global sort. Iterating merges re-runs this with merged symbols;
    each round is the same two-shuffle pass. (Bounds: the oracle's
    range(1, 1e6) position generator assumes ≤1M tokens per document;
    lift's n_ab·N·1000 product stays in int64 up to ~10^10-token
    corpora — past that, compute the lift at reduced scale or in
    doubles and keep n_ab exact.)
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = TH.words_expr("text")
    w = docs.select(ws.alias("ws"))
    pairs = w.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ws) - 1, 0)),"
                " i -> struct(ws[i - 1] AS a, ws[i] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    uni = (
        w.select(F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = w.select(F.explode("ws").alias("tok")).agg(
        F.count(F.lit(1)).alias("n_tot")
    )
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    ua = uni.select(F.col("tok").alias("a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("n").alias("n_b"))
    return (
        pc.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.expr("n_ab * n_tot * 1000 div (n_a * n_b)")
            .cast("long")
            .alias("lift_milli"),
        )
        .orderBy(F.col("n_ab").desc(), "a", "b")
        .limit(BPE_TOPK)
    )


# --- text_bpe_iterative -------------------------------------------------------

BPE_ROUNDS = 3  #: merge rounds executed by the iterative trainer


def _bpe_cte_chain(rounds: int) -> list[str]:
    """The shared unrolled-CTE merge chain (the k-means
    unrolled-iteration pattern): per round r, mine adjacent pairs
    (p{{r}}), take the (n_ab DESC, a, b) top-1 (m{{r}}), apply it with
    DuckDB's replace() on a ';'-delimited token string — leftmost
    non-overlapping sequential replacement, the same greedy semantics
    as Spark's replace() — and re-split (w{{r+1}}). Same
    1M-positions-per-doc generator bound as the
    text_bpe_merge_candidates oracle. Unused tail CTEs are pruned by
    DuckDB, so the trace oracle composing only m0..m{{rounds-1}} and
    the vocab/encode oracles composing w{{rounds}} share one builder."""
    words = TH.sql_words("text")
    ctes = [f"w0 AS (SELECT doc_id, {words} AS ws FROM documents)"]
    for r in range(rounds):
        ctes.append(f"""p{r} AS (
      SELECT ws[g.i] AS a, ws[g.i + 1] AS b
      FROM w{r}, range(1, 1000000) AS g(i)
      WHERE g.i + 1 <= len(ws)
    )""")
        ctes.append(f"""m{r} AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      FROM p{r} GROUP BY a, b ORDER BY n_ab DESC, a, b LIMIT 1
    )""")
        pat = (
            f"';' || (SELECT a FROM m{r}) || ';;' || "
            f"(SELECT b FROM m{r}) || ';'"
        )
        rep = (
            f"';' || (SELECT a FROM m{r}) || ' ' || "
            f"(SELECT b FROM m{r}) || ';'"
        )
        ctes.append(f"""w{r + 1} AS (
      SELECT doc_id,
             CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE str_split(
                         trim(replace(';' || array_to_string(ws, ';;')
                                          || ';', {pat}, {rep}), ';'),
                         ';;')
             END AS ws
      FROM w{r}
    )""")
    return ctes


def _bpe_iter_oracle() -> str:
    ctes = _bpe_cte_chain(BPE_ROUNDS)
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r + 1} AS INTEGER) AS rnd, a, b, n_ab FROM m{r}"
        for r in range(BPE_ROUNDS)
    )
    return "WITH " + ",\n    ".join(ctes) + f"\n    {unions}"


@query("text_bpe_iterative", oracle=_bpe_iter_oracle())
def text_bpe_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer TRAINING loop: {BPE_ROUNDS} actual BPE merge rounds —
    per round, mine adjacent-pair frequencies over the current symbol
    sequences, take the most frequent pair (ties broken (a, b)), and
    APPLY the merge corpus-wide before re-mining. This is the step
    text_bpe_merge_candidates (step-one mining) was built toward: the
    statistic each round maximizes is recomputed on sequences where
    every earlier merge has replaced its occurrences greedily
    leftmost, exactly like a real BPE trainer's inner loop (Sennrich
    et al. 2016). Emits the merge trace (round, pair, frequency) —
    the artifact a tokenizer build actually persists.

    Merge application is a PER-ROW string rewrite, not a positional
    self-join: tokens are joined with ';' sentinels (';a;;b;' can
    only match whole tokens; tokens are \\w+ so the sentinel never
    collides) and the round's pair is replaced via replace() —
    leftmost non-overlapping sequential semantics on BOTH engines,
    which IS BPE's greedy merge order (an 'a a a' run under merge
    (a,a) yields [aa, a]). Each round: one explode → one
    map-side-combined (a, b) count shuffle → a TakeOrderedAndProject
    top-1 (bounded 1-row collect, the k-means driver pattern) → the
    rewrite mapped over the cached previous round. Per-round cost is
    two fact passes at any scale; rounds are a small constant. Each
    round's top-1 action materializes the current round's cache, at
    which point the superseded round's cache is dropped — cached
    footprint is one corpus copy regardless of BPE_ROUNDS.
    """
    _final, trace = _bpe_train(spark, sf_dir, BPE_ROUNDS)
    _final.unpersist()
    return spark.createDataFrame(
        trace, "rnd int, a string, b string, n_ab long"
    )


def _bpe_train(
    spark: SparkSession,
    sf_dir: str,
    rounds: int,
    apply_last: bool = False,
) -> tuple[DataFrame, list]:
    """The shared greedy BPE merge loop (Spark twin of the oracle's
    _bpe_cte_chain): per round, mine adjacent-pair frequencies over the
    cached current sequences, take the (n_ab DESC, a, b) top-1 (a
    bounded 1-row collect), and rewrite corpus-wide via the
    ';'-sentinel replace() trick. Returns (final, trace) where `final`
    is the CACHED sequence frame after the loop — the caller owns its
    unpersist — and trace is [(rnd, a, b, n_ab)].

    ``apply_last`` controls whether the LAST round's winning merge is
    applied to the corpus: the trace key (text_bpe_iterative) only
    reports the pair, so applying it would be a wasted full-corpus
    rewrite, while the vocabulary/encode keys consume the merged
    sequences themselves and need every traced merge applied. Cache
    hygiene (r6 lesson, unchanged): each round's top-1 action
    materializes the current cache, at which point the superseded
    round's cache is dropped — footprint is one corpus copy regardless
    of `rounds`. The final frame is returned UNMATERIALIZED beyond the
    last top-1 scan; its merge literals ride in the plan, so consumers
    may unpersist it and still recompute by lineage without re-mining.
    """
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select("doc_id", TH.words_expr("text").alias("ws")).cache()
    prev = None
    trace: list = []
    for rnd in range(1, rounds + 1):
        pairs = cur.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(ws) - 1, 0)),"
                    " i -> struct(ws[i - 1] AS a, ws[i] AS b))"
                )
            ).alias("p")
        ).select("p.a", "p.b")
        top_rows = (
            pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_ab"))
            .orderBy(F.col("n_ab").desc(), "a", "b")
            .limit(1)
            .take(1)
        )
        # The TakeOrderedAndProject above fully scanned `cur`, so its
        # cache is materialized; the round it superseded can go now.
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top_rows:
            break  # no adjacent pairs anywhere (every doc < 2 tokens)
        top = top_rows[0]
        trace.append((rnd, top["a"], top["b"], int(top["n_ab"])))
        if rnd == rounds and not apply_last:
            break
        pat = F.lit(";" + top["a"] + ";;" + top["b"] + ";")
        rep = F.lit(";" + top["a"] + " " + top["b"] + ";")
        nxt = cur.select(
            "doc_id",
            F.when(
                F.size("ws") == 0, F.array().cast("array<string>")
            )
            .otherwise(
                F.split(
                    F.btrim(
                        F.replace(
                            F.concat(
                                F.lit(";"),
                                F.array_join("ws", ";;"),
                                F.lit(";"),
                            ),
                            pat,
                            rep,
                        ),
                        F.lit(";"),
                    ),
                    ";;",
                )
            )
            .alias("ws"),
        ).cache()
        prev = cur
        cur = nxt
    if prev is not None:
        prev.unpersist()
    return cur, trace


# --- text_bpe_vocab / text_bpe_encode ----------------------------------------

BPE_VOCAB_TOPK = 50  #: vocabulary rows reported by text_bpe_vocab


def _bpe_vocab_oracle() -> str:
    """Composes the shared merge chain and reads the FINAL sequences:
    the carried vocabulary after every traced merge has been applied,
    each symbol with its width in base tokens (merged symbols are
    space-joined, so width = len(str_split(tok, ' ')))."""
    ctes = _bpe_cte_chain(BPE_ROUNDS)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    v AS (SELECT unnest(ws) AS tok FROM w{BPE_ROUNDS})
    SELECT tok,
           CAST(len(str_split(tok, ' ')) AS INTEGER) AS width,
           CAST(count(*) AS BIGINT) AS n
    FROM v GROUP BY tok
    ORDER BY n DESC, tok LIMIT {BPE_VOCAB_TOPK}"""
    )


@query("text_bpe_vocab", oracle=_bpe_vocab_oracle())
def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VOCABULARY carried across merge rounds — the other artifact
    a tokenizer build persists alongside text_bpe_iterative's merge
    trace. Runs the same {BPE_ROUNDS} greedy merges (shared _bpe_train
    loop, last merge APPLIED this time — the trace key skips that
    rewrite) and emits the top-{BPE_VOCAB_TOPK} symbols of the merged
    corpus by frequency, with each symbol's width in base tokens:
    width > 1 rows ARE the carry-over, merged symbols participating in
    the final vocabulary with their post-merge corpus counts (and, at
    higher round counts, in later merges — a round-2 winner can contain
    a round-1 symbol).

    Scale shape: the loop's per-round cost is unchanged (one explode →
    one map-side-combined pair-count shuffle → a 1-row top-1 collect →
    a per-row codegen rewrite); the vocabulary itself is one more
    explode → map-side-combined symbol count → TakeOrderedAndProject
    top-{BPE_VOCAB_TOPK} — no global sort, ≤{BPE_VOCAB_TOPK} rows ever
    reach the driver. Ordering (n DESC, tok) is a total order per
    symbol, so the LIMIT boundary is deterministic on both engines.
    """
    final, _trace = _bpe_train(spark, sf_dir, BPE_ROUNDS, apply_last=True)
    rows = (
        final.select(F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "tok",
            F.size(F.split("tok", " ")).cast("int").alias("width"),
            F.col("n").cast("long").alias("n"),
        )
        .orderBy(F.col("n").desc(), "tok")
        .limit(BPE_VOCAB_TOPK)
        .take(BPE_VOCAB_TOPK)
    )
    final.unpersist()
    return spark.createDataFrame(rows, "tok string, width int, n long")


def _bpe_encode_oracle() -> str:
    ctes = _bpe_cte_chain(BPE_ROUNDS)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    enc AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_bpe,
             CAST(coalesce(list_sum(list_transform(ws,
                    t -> len(str_split(t, ' ')))), 0) AS BIGINT) AS n_base
      FROM w{BPE_ROUNDS}
    )
    SELECT doc_id, n_base, n_bpe,
           CAST(CASE WHEN n_base = 0 THEN 0
                ELSE (n_base - n_bpe) * 10000 // n_base END AS BIGINT)
             AS saved_bp
    FROM enc"""
    )


@query("text_bpe_encode", oracle=_bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus under the learned merges — the inference half
    of the tokenizer story (train: text_bpe_iterative / text_bpe_vocab;
    encode: this; pack: pack_sequences). Per document: base token
    count, token count after the {BPE_ROUNDS} traced merges, and the
    compression in basis points — the number a data-pipeline owner
    actually budgets with (tokens-per-document drives training cost).
    n_base is recovered FROM the merged sequences (Σ symbol widths)
    rather than a second pass over raw text, so the whole key is one
    frame.

    Scale shape: after the shared training loop, encoding is a pure
    per-row projection (aggregate/size over the symbol array — JVM
    codegen, no shuffle, no UDF); the returned frame is one row per
    document with three int64s. The final cache is released before
    return: the merge literals ride in the plan, so the driver's
    collect recomputes by lineage ({BPE_ROUNDS} chained replace()
    rewrites over one documents scan) without re-mining.
    """
    final, _trace = _bpe_train(spark, sf_dir, BPE_ROUNDS, apply_last=True)
    out = (
        final.select(
            "doc_id",
            F.expr(
                "aggregate(ws, 0L, (acc, t) -> acc + size(split(t, ' ')))"
            )
            .cast("long")
            .alias("n_base"),
            F.size("ws").cast("long").alias("n_bpe"),
        )
        .select(
            "doc_id",
            "n_base",
            "n_bpe",
            F.expr(
                "CASE WHEN n_base = 0 THEN 0L "
                "ELSE (n_base - n_bpe) * 10000 div n_base END"
            )
            .cast("long")
            .alias("saved_bp"),
        )
    )
    final.unpersist()
    return out


# --- text_bpe_batched ---------------------------------------------------------

BPE_BATCH_ROUNDS = 2  #: merge rounds executed by the batched trainer
BPE_BATCH_B = 3  #: disjoint merges selected and applied per round
#: candidates scanned per round for the greedy-disjoint selection —
#: the window is PART of the operator's semantics (both engines scan
#: exactly the top-64 pairs by (n DESC, a, b)), which is what makes
#: the selection bounded and oracle-expressible
BPE_BATCH_WINDOW = 64


def _bpe_batched_oracle() -> str:
    """Unrolled batched-merge chain. Per round r: mine adjacent pairs
    (same fragment as _bpe_cte_chain, duplicated deliberately so this
    key's closure is independent of the single-merge keys'), rank the
    top-{window} by (n_ab DESC, a, b), greedily select up to B pairs
    sharing NO symbol with an earlier selection (unrolled as B chained
    CTEs: s{{r}}_{{k}} is the lowest-ranked candidate past s{{r}}_{{k-1}}
    whose symbols avoid every earlier slot — any skipped candidate
    conflicted with a slot whose symbols never leave the used set, so
    resuming past the previous slot's rank IS the greedy scan), then
    apply ALL selected merges in slot order with chained replace() on
    the ';'-delimited form. Empty slots coalesce to the never-matching
    ';#;' pattern (fixture tokens are [a-z0-9]; '#' cannot occur), so
    their replace() is a no-op on both engines."""
    words = TH.sql_words("text")
    w, b, rounds = BPE_BATCH_WINDOW, BPE_BATCH_B, BPE_BATCH_ROUNDS
    # Every CTE below is AS MATERIALIZED: the s-slots are referenced
    # many times (later slots' used-sets, the rewrite's pat/rep pairs),
    # and inlining would re-evaluate the whole mining chain per
    # reference — exponentially across rounds.
    ctes = [
        f"w0 AS MATERIALIZED (SELECT doc_id, {words} AS ws FROM documents)"
    ]
    for r in range(rounds):
        ctes.append(f"""p{r} AS MATERIALIZED (
      SELECT ws[g.i] AS a, ws[g.i + 1] AS b
      FROM w{r}, range(1, 1000000) AS g(i)
      WHERE g.i + 1 <= len(ws)
    )""")
        ctes.append(f"""c{r} AS MATERIALIZED (
      SELECT * FROM (
        SELECT a, b, n_ab,
               row_number() OVER (ORDER BY n_ab DESC, a, b) AS rk
        FROM (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
              FROM p{r} GROUP BY a, b)
      ) WHERE rk <= {w}
    )""")
        for k in range(1, b + 1):
            if k == 1:
                ctes.append(
                    f"s{r}_1 AS MATERIALIZED "
                    f"(SELECT * FROM c{r} ORDER BY rk LIMIT 1)"
                )
                continue
            used = " UNION ".join(
                f"SELECT a FROM s{r}_{j} UNION SELECT b FROM s{r}_{j}"
                for j in range(1, k)
            )
            ctes.append(f"""s{r}_{k} AS MATERIALIZED (
      SELECT * FROM c{r}
      WHERE rk > (SELECT rk FROM s{r}_{k - 1})
        AND a NOT IN ({used}) AND b NOT IN ({used})
      ORDER BY rk LIMIT 1
    )""")
        if r + 1 < rounds:
            joined = "';' || array_to_string(ws, ';;') || ';'"
            for k in range(1, b + 1):
                pat = (
                    f"coalesce((SELECT ';' || a || ';;' || b || ';' "
                    f"FROM s{r}_{k}), ';#;')"
                )
                rep = (
                    f"coalesce((SELECT ';' || a || ' ' || b || ';' "
                    f"FROM s{r}_{k}), ';#;')"
                )
                joined = f"replace({joined}, {pat}, {rep})"
            ctes.append(f"""w{r + 1} AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
                  ELSE str_split(trim({joined}, ';'), ';;')
             END AS ws
      FROM w{r}
    )""")
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r + 1} AS INTEGER) AS rnd, "
        f"CAST({k} AS INTEGER) AS slot, a, b, n_ab FROM s{r}_{k}"
        for r in range(rounds)
        for k in range(1, b + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + f"\n    {unions}"


def _bpe_batched_train(
    spark: SparkSession,
    sf_dir: str,
    rounds: int,
    bsz: int,
    window: int,
) -> list:
    """Batched BPE merge loop: per round, mine adjacent-pair counts,
    collect the bounded top-``window`` candidates (TakeOrderedAndProject
    — ≤window rows reach the driver), greedily select up to ``bsz``
    pairs whose symbols are pairwise disjoint, and apply ALL of them in
    one corpus rewrite (chained replace() in slot order). Disjointness
    makes the batch conflict-free: a merge only touches regions holding
    its own two symbols, never creates or destroys another selected
    pair's adjacency, so the chained application equals any order.
    Returns [(rnd, slot, a, b, n_ab)] with counts AS MINED (before this
    round's batch applies — the standard batched-trainer semantics).
    Cache hygiene mirrors _bpe_train: one corpus copy regardless of
    rounds."""
    docs = load_table(spark, sf_dir, "documents")
    cur = docs.select("doc_id", TH.words_expr("text").alias("ws")).cache()
    prev = None
    trace: list = []
    for rnd in range(1, rounds + 1):
        pairs = cur.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(ws) - 1, 0)),"
                    " i -> struct(ws[i - 1] AS a, ws[i] AS b))"
                )
            ).alias("p")
        ).select("p.a", "p.b")
        cands = (
            pairs.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n_ab"))
            .orderBy(F.col("n_ab").desc(), "a", "b")
            .limit(window)
            .take(window)
        )
        if prev is not None:
            prev.unpersist()
            prev = None
        used: set = set()
        sel = []
        for row in cands:
            if len(sel) == bsz:
                break
            if row["a"] in used or row["b"] in used:
                continue
            sel.append(row)
            used.add(row["a"])
            used.add(row["b"])
        trace.extend(
            (rnd, k, row["a"], row["b"], int(row["n_ab"]))
            for k, row in enumerate(sel, 1)
        )
        if rnd == rounds or not sel:
            break
        joined = F.concat(F.lit(";"), F.array_join("ws", ";;"), F.lit(";"))
        for row in sel:
            joined = F.replace(
                joined,
                F.lit(";" + row["a"] + ";;" + row["b"] + ";"),
                F.lit(";" + row["a"] + " " + row["b"] + ";"),
            )
        nxt = cur.select(
            "doc_id",
            F.when(F.size("ws") == 0, F.array().cast("array<string>"))
            .otherwise(F.split(F.btrim(joined, F.lit(";")), ";;"))
            .alias("ws"),
        ).cache()
        prev = cur
        cur = nxt
    if prev is not None:
        prev.unpersist()
    cur.unpersist()
    return trace


@query("text_bpe_batched", oracle=_bpe_batched_oracle())
def text_bpe_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED-merge BPE training round — the 100 TB form of the
    tokenizer trainer. text_bpe_iterative is exact sequential BPE
    (Sennrich et al. 2016): one merge per Spark round, so a realistic
    30k-merge vocabulary costs 30k scheduling round-trips — at the
    measured ~0.7 s/round fixed cost that is ~6 h of pure coordination
    before any data is touched. Production-scale trainers batch: per
    round, rank the top-{BPE_BATCH_WINDOW} pairs by (n DESC, a, b),
    greedily select up to {BPE_BATCH_B} pairs sharing no symbol, and
    apply them all in ONE corpus rewrite — symbol-disjointness makes
    the batch exactly order-independent (a merge never creates or
    destroys another selected pair's adjacency), so the only deviation
    from sequential BPE is that counts are mined once per batch, the
    documented batched-trainer approximation. Rounds shrink by B×; at
    B=1 the trace is bit-identical to text_bpe_iterative's (pinned by
    test). The candidate window is part of the semantics — both
    engines scan exactly the top-{BPE_BATCH_WINDOW} — which is what
    keeps the driver collect bounded and the selection expressible as
    unrolled SQL on the oracle side.

    Scale shape per round: one explode → one map-side-combined pair
    count shuffle → a ≤{BPE_BATCH_WINDOW}-row TakeOrderedAndProject
    collect → one chained-replace codegen rewrite applying all
    {BPE_BATCH_B} merges (vs {BPE_BATCH_B} full rewrites sequentially).
    Emits (rnd, slot, a, b, n_ab): the per-round selection in greedy
    order with as-mined counts.
    """
    trace = _bpe_batched_train(
        spark, sf_dir, BPE_BATCH_ROUNDS, BPE_BATCH_B, BPE_BATCH_WINDOW
    )
    return spark.createDataFrame(
        trace, "rnd int, slot int, a string, b string, n_ab long"
    )


# --- text_ngram_novelty -------------------------------------------------------

NOVELTY_N = 3  #: token n-gram size for the novelty profile
# The gram body below (Spark transform lambda AND the DuckDB oracle)
# spells out exactly three offsets; changing NOVELTY_N without
# regenerating both would silently produce wrong grams while staying
# engine-consistent. Fail loudly instead (r6 ADVICE) — as a raise, not
# an assert, so the guard survives `python -O` (r7 ADVICE).
if NOVELTY_N != 3:
    raise AssertionError("regenerate the gram concat in BOTH engines first")


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {TH.sql_words('text')} AS ws FROM documents
    ),
    grams AS (
      SELECT doc_id,
             {TH.sql_portable_hash64(
                 "ws[g.i] || ' ' || ws[g.i + 1] || ' ' || ws[g.i + 2]")} AS gh
      FROM w, range(1, 1000000) AS g(i)
      WHERE g.i + {NOVELTY_N} - 1 <= len(ws)
    ),
    d AS (SELECT DISTINCT doc_id, gh FROM grams),
    first AS (SELECT gh, min(doc_id) AS first_doc FROM d GROUP BY gh)
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = d.doc_id THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) AS novelty_bp
    FROM d JOIN first f ON f.gh = d.gh
    GROUP BY d.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus NOVELTY profile: for each document, the fraction of its
    distinct token {NOVELTY_N}-grams whose FIRST corpus occurrence
    (min doc_id — ingestion order in this fixture) is this document.
    The running-novelty curve is how corpus builders measure
    saturation ("are new crawl snapshots still contributing content,
    or re-crawling what we have?") and per-doc low novelty is a
    cheap near-dup/boilerplate signal that needs no pair
    materialization at all — it complements the pairwise dedup
    family with an O(corpus) diagnostic.

    Scale shape: explode to distinct (doc, gram-hash) — only 8-byte
    hashes shuffle — then ONE min-per-gram aggregate (map-side
    combine) joined back on the gram hash, and a per-doc count
    aggregate. No self-join, no pair space; the same two-shuffle
    budget as dedup_exact. At 100 TB "first occurrence" by an
    explicit ingestion-order column replaces min(doc_id) with min of
    that column — same plan.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = TH.words_expr("text")
    w = docs.select("doc_id", ws.alias("ws"), F.size(ws).alias("n"))
    grams = w.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n") >= NOVELTY_N,
                F.expr(
                    f"transform(sequence(1, n - {NOVELTY_N} + 1),"
                    " i -> ws[i - 1] || ' ' || ws[i] || ' ' || ws[i + 1])"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    ).select("doc_id", TH.portable_hash64(F.col("g")).alias("gh")).distinct()
    first = grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(first, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_novel").cast("long").alias("n_novel"),
            F.expr("n_novel * 10000 div n_grams").alias("novelty_bp"),
        )
    )

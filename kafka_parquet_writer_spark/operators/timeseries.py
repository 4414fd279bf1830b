"""Time-series operators: batch sessionization (gaps-and-islands),
hypertable-style multi-granularity rollup, and range/interval joins.

The reference engine partitions its output by event date
(`KafkaProtoParquetWriter.java:362-380`) but has no time-series query
surface at all; these are the operators a consumer of that date-laid
data actually runs. All timestamps are compared in integer
microseconds (`unix_micros` / `epoch_us`) so Spark and the DuckDB
oracle agree bit-for-bit — no double-epoch rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import (
    cents,
    pround,
    sql_cents,
    sql_pround,
)
from kafka_parquet_writer_spark.registry import query

#: session gap: a pause longer than this starts a new session (6 h in µs).
SESSION_GAP_US = 6 * 3600 * 1_000_000


@query(
    "sessionize_batch",
    oracle=f"""
    WITH x AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu, value FROM events
    ), g AS (
      SELECT user_id, tu, value,
             CASE WHEN tu - lag(tu) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    ), s AS (
      SELECT user_id, tu, value,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tu
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_seq
      FROM g
    )
    SELECT user_id, session_seq,
           count(*)                                              AS n_events,
           CAST(floor((max(tu) - min(tu)) / 1000000.0) AS BIGINT) AS duration_s,
           {sql_pround(f"sum({sql_cents('value')}) / 100.0", 2)}  AS val_sum
    FROM s
    GROUP BY user_id, session_seq
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands: a >6 h pause starts a
    new session; one row per (user, session) with count/duration/value.

    Scale shape: ONE shuffle on user_id serves both window passes and
    the final aggregate (Catalyst reuses the hash partitioning), so the
    whole operator is shuffle-once regardless of corpus size. Session
    boundaries are per-user local decisions — no global state, no
    driver involvement; skewed users degrade one task, not the job
    (the salting pattern in operators/skew.py applies if one user
    dominates). This is the batch twin of the streaming
    `stream_session_window` (operators/streaming_queries.py).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tu"), "value"
    )
    w = W.partitionBy("user_id").orderBy("tu", "event_id")
    brk = F.when(
        F.col("tu") - F.lag("tu").over(w) > SESSION_GAP_US, F.lit(1)
    ).otherwise(F.lit(0))
    run = W.partitionBy("user_id").orderBy("tu", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    sess = ev.withColumn("brk", brk).withColumn(
        "session_seq", F.sum("brk").over(run).cast("long")
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor((F.max("tu") - F.min("tu")) / F.lit(1000000.0))
        .cast("long")
        .alias("duration_s"),
        pround(F.sum(cents(F.col("value"))) / 100.0, 2).alias("val_sum"),
    )


@query(
    "rollup_time_hierarchy",
    oracle=f"""
    WITH x AS (
      SELECT strftime(ts, '%Y-%m-%d')     AS day,
             CAST(hour(ts) AS BIGINT)     AS hr,
             user_id,
             {sql_cents('value')}         AS vc
      FROM events
    )
    SELECT day, hr,
           CAST(GROUPING(day) AS INTEGER) * 2
             + CAST(GROUPING(hr) AS INTEGER)          AS gid,
           count(*)                                   AS n_events,
           count(DISTINCT user_id)                    AS n_users,
           {sql_pround('sum(vc) / 100.0', 2)}         AS val_sum
    FROM x
    GROUP BY ROLLUP (day, hr)
    """,
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: the same events
    rolled up at hourly, daily, and total granularity in one pass
    (rollup = Expand ×3 + a single hash aggregate).

    This is the materialization a TimescaleDB-like rollup maintains
    incrementally; at 100 TB the one-pass Expand beats three separate
    scans 3:1 on input I/O, and partial aggregation means the shuffle
    carries only group keys. count(DISTINCT user_id) rewrites to a
    two-phase expand+agg, still one shuffle family.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
        "user_id",
        cents(F.col("value")).alias("vc"),
    )
    return (
        ev.rollup("day", "hr")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            pround(F.sum("vc") / 100.0, 2).alias("val_sum"),
        )
        .select("day", "hr", "gid", "n_events", "n_users", "val_sum")
    )


#: irregular price bands — genuinely interval-typed (not reducible to a
#: width_bucket/floor expression), embedded identically in the oracle.
PRICE_BANDS = [
    ("economy", 900.0, 920.0),
    ("standard", 920.0, 950.0),
    ("premium", 950.0, 980.0),
    ("luxury", 980.0, 1000.0),
]


def _bands_values_sql() -> str:
    rows = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in PRICE_BANDS)
    return f"(VALUES {rows}) AS bands(band, lo, hi)"


@query(
    "join_range_band",
    oracle=f"""
    SELECT band,
           -- VALUES literals like 10.5 type as DECIMAL(4,1) in DuckDB;
           -- pin to DOUBLE to match the Spark column dtype exactly.
           CAST(lo AS DOUBLE) AS lo,
           count(*) AS n_parts,
           {sql_pround(f"sum({sql_cents('p_retailprice')})"
                       " / (100.0 * count(*))", 2)} AS avg_price
    FROM part
    JOIN {_bands_values_sql()}
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band, lo
    """,
)
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: assign each part to an irregular price
    band via `lo <= p < hi`, then aggregate per band.

    Scale shape: the band table is tiny and the fact side is huge, so
    the correct physical plan is a broadcast nested-loop join with the
    range predicate evaluated inline — zero shuffle on the fact side
    until the final 4-group aggregate, whose partials collapse
    map-side. This is the general interval-join pattern (IP→geo,
    time→fiscal-period, value→tier): broadcast the interval dim; if
    the interval side is too big to broadcast, the production path is
    to quantize intervals into equi-join grid cells exactly like
    dedup_embedding's grid join (operators/dedup.py).
    """
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        PRICE_BANDS, "band string, lo double, hi double"
    )
    joined = part.join(
        F.broadcast(bands),
        (F.col("p_retailprice") >= F.col("lo"))
        & (F.col("p_retailprice") < F.col("hi")),
    )
    return joined.groupBy("band", "lo").agg(
        F.count(F.lit(1)).alias("n_parts"),
        pround(
            F.sum(cents(F.col("p_retailprice")))
            / (100.0 * F.count(F.lit(1))),
            2,
        ).alias("avg_price"),
    )


#: binned interval join: half-width of the temporal window (30 min, µs);
#: bin width equals the half-width so a window spans ≤ 2 adjacent bins
RANGE_BIN_US = 1800 * 1_000_000


@query(
    "join_range_binned",
    oracle=f"""
    WITH e AS (
      SELECT event_id AS e_id, epoch_us(ts) AS e_tu
      FROM events WHERE event_type = 'error'
    ), c AS (
      SELECT epoch_us(ts) AS c_tu, {sql_cents('value')} AS vc
      FROM events WHERE event_type = 'click'
    )
    SELECT e_id,
           count(c_tu)                            AS n_nearby,
           {sql_pround('sum(vc) / 100.0', 2)}     AS click_val
    FROM e LEFT JOIN c ON abs(c_tu - e_tu) <= {RANGE_BIN_US}
    GROUP BY e_id
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval join, binned: for every error event, count (and
    sum the value of) ALL click events within ±30 minutes — a temporal
    co-occurrence join where BOTH sides are event-scale, so the
    broadcast-NLJ strategy of `join_range_band` is off the table.

    Scale shape: the O(n²) interval predicate becomes an EQUI-join by
    time binning — bin width = the window half-width, so any match lies
    in the error's own bin or an adjacent one. Errors fan out ×3 probe
    bins (explode of 3 literals, map-side); clicks keep their single
    bin; the join shuffles on bin id and the exact |Δt| ≤ W filter runs
    post-join. Cost ∝ Σ bin² (co-occurring density), never |E|×|C| —
    the same bucketing idea as the LSH dedup family, applied to time.
    A final left join restores zero-match errors (count 0, null sum),
    matching the declarative LEFT JOIN oracle.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("tu"),
        "event_type",
        "value",
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("tu").alias("e_tu"),
        F.floor(F.col("tu") / RANGE_BIN_US).alias("bin"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("tu").alias("c_tu"),
        cents(F.col("value")).alias("vc"),
        F.floor(F.col("tu") / RANGE_BIN_US).alias("cbin"),
    )
    probes = err.select(
        "e_id",
        "e_tu",
        F.explode(
            F.array(F.col("bin") - 1, F.col("bin"), F.col("bin") + 1)
        ).alias("pb"),
    )
    matched = (
        probes.join(clk, F.col("pb") == F.col("cbin"))
        .filter(F.abs(F.col("c_tu") - F.col("e_tu")) <= RANGE_BIN_US)
        .groupBy("e_id")
        .agg(
            F.count(F.lit(1)).alias("n_nearby"),
            pround(F.sum("vc") / 100.0, 2).alias("click_val"),
        )
    )
    return (
        err.select("e_id")
        .join(matched, "e_id", "left")
        .select(
            "e_id",
            F.coalesce(F.col("n_nearby"), F.lit(0)).alias("n_nearby"),
            F.col("click_val"),
        )
    )


#: CEP pattern: contiguous view→click→purchase in a user's event stream
CEP_PATTERN = "view,click,purchase"


@query(
    "events_pattern_seq",
    oracle=f"""
    SELECT user_id,
           count(*) AS n_events,
           CAST(len(regexp_extract_all(
                 string_agg(event_type, ',' ORDER BY epoch_us(ts), event_id),
                 '{CEP_PATTERN}')) AS BIGINT) AS n_conv
    FROM events
    GROUP BY user_id
    """,
)
def events_pattern_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (the CEP / MATCH_RECOGNIZE shape): per
    user, count non-overlapping contiguous view→click→purchase runs in
    the time-ordered event stream — conversion bursts with no
    intervening events.

    Scale shape: ONE shuffle on user_id; the ordered event-type string
    builds inside the aggregate (sort under collect_list — bounded by
    per-user history; a production pipeline sessionizes first, which
    is `sessionize_batch`, and matches within sessions). The pattern
    scan is then a per-row regexp — both engines consume matches
    left-to-right, so non-overlapping counts agree. This is the batch
    twin of a streaming CEP operator: the same contiguous-run
    semantics expressed as ordered aggregation + regex instead of an
    NFA over a keyed stream.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        "event_type",
    )
    seq = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("tu", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ",",
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.regexp_count(seq, F.lit(CEP_PATTERN)).cast("long").alias("n_conv"),
    )


#: smoothing: window length (trailing events) and EWMA decay (0.25 is
#: binary-exact, so the double fold is bit-identical across engines)
SMOOTH_LAGS = 8
EWMA_ALPHA = 0.25


@query(
    "window_smooth",
    oracle=f"""
    WITH x AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu,
             {sql_cents('value')} AS vc
      FROM events
    ), lagged AS (
      SELECT user_id, event_id,
             list_filter([{", ".join(
                 f"lag(vc, {SMOOTH_LAGS - 1 - i}) OVER w"
                 for i in range(SMOOTH_LAGS)
             )}], v -> v IS NOT NULL) AS win
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    ), s AS (
      SELECT user_id, event_id, win,
             list_sort(win) AS sw,
             len(win)       AS n
      FROM lagged
    )
    SELECT user_id, event_id,
           {sql_pround(
               "list_reduce(list_transform(win, v -> CAST(v AS DOUBLE)),"
               f" (acc, v) -> {EWMA_ALPHA} * v + {1 - EWMA_ALPHA} * acc)"
               " / 100.0", 6)} AS ewma,
           {sql_pround(
               "CASE WHEN n % 2 = 1 THEN CAST(sw[(n + 1) // 2] AS DOUBLE)"
               " ELSE (CAST(sw[n // 2] AS DOUBLE)"
               "       + CAST(sw[n // 2 + 1] AS DOUBLE)) / 2.0 END"
               " / 100.0", 6)} AS med
    FROM s
    """,
)
def window_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series smoothing over each user's event stream: trailing
    {SMOOTH_LAGS}-event EWMA (α={EWMA_ALPHA}) and exact rolling median
    — the denoising pass a metrics pipeline applies before anomaly
    thresholds.

    Scale shape: ONE shuffle on user_id; the trailing window
    materializes as an explicit oldest→newest lag array (deterministic
    frame order — never an implementation-ordered collect), and both
    smoothers are then per-row array folds: the EWMA is a sequential
    double fold (α binary-exact ⇒ bit-identical across engines), the
    median an array_sort + middle pick on fixed-point cents. No
    quadratic re-aggregation per frame, no UDFs.
    """
    x = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tu"),
        cents(F.col("value")).alias("vc"),
    )
    w = W.partitionBy("user_id").orderBy("tu", "event_id")
    lags = F.array(
        *[
            F.lag("vc", SMOOTH_LAGS - 1 - i).over(w)
            for i in range(SMOOTH_LAGS)
        ]
    )
    staged = x.select(
        "user_id",
        "event_id",
        F.filter(lags, lambda v: v.isNotNull()).alias("win"),
    )
    win = F.col("win")
    sw = F.array_sort(win)
    n = F.size(win)
    ewma = F.aggregate(
        F.transform(win, lambda v: v.cast("double")),
        F.lit(None).cast("double"),
        lambda acc, v: F.when(acc.isNull(), v).otherwise(
            EWMA_ALPHA * v + (1 - EWMA_ALPHA) * acc
        ),
    )
    med = F.when(
        n % 2 == 1,
        F.element_at(sw, ((n + 1) / 2).cast("int")).cast("double"),
    ).otherwise(
        (
            F.element_at(sw, (n / 2).cast("int")).cast("double")
            + F.element_at(sw, (n / 2 + 1).cast("int")).cast("double")
        )
        / 2.0
    )
    return staged.select(
        "user_id",
        "event_id",
        pround(ewma / 100.0, 6).alias("ewma"),
        pround(med / 100.0, 6).alias("med"),
    )


# ---------------------------------------------------------------------------
# interval × interval overlap join (binned)
# ---------------------------------------------------------------------------

#: only high-quantity shipments carry an interval (bounds the output)
IOV_MIN_QTY = 46
#: synthetic duration (days): 1..14, deterministic per line
IOV_DUR_MOD = 14
#: bin width in days — any width ≥ max duration caps the explode at 2
#: bins per interval
IOV_BIN_DAYS = 16


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH iv AS (
      SELECT l_suppkey,
             l_orderkey * 10 + l_linenumber AS iid,
             date_diff('day', DATE '1970-01-01',
                       CAST(l_shipdate AS DATE)) AS s,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               + (l_orderkey * 7 + l_linenumber) % {IOV_DUR_MOD} + 1 AS e
      FROM lineitem WHERE l_quantity >= {IOV_MIN_QTY}
    )
    SELECT a.l_suppkey, a.iid AS id1, b.iid AS id2,
           LEAST(a.e, b.e) - GREATEST(a.s, b.s) + 1 AS overlap_days
    FROM iv a JOIN iv b
      ON a.l_suppkey = b.l_suppkey AND a.iid < b.iid
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join: find pairs of same-supplier
    shipment windows (synthetic [ship, ship+1..14 d] intervals over
    high-quantity lines) that overlap in time — the "concurrent
    activity" join behind conflict detection, double-booking audits,
    and co-occurring-session analysis. The step past
    `join_range_binned`'s point-in-band shape: BOTH sides are
    intervals.

    Scale shape: each interval is exploded to its covering
    IOV_BIN_DAYS-day bins (≤ 2, since bin width ≥ max duration) and
    candidates meet in an **equi-join on (supplier, bin)** — never a
    non-equi nested loop, which is what Spark plans for a raw overlap
    predicate. Duplicate hits (pairs sharing 2 bins) collapse in one
    distinct. Output is pair-bounded per (supplier, bin) cell; skewed
    cells split with bin refinement the same way the range join bins.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= IOV_MIN_QTY
    )
    day = F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date"))
    iv = li.select(
        "l_suppkey",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
        day.alias("s"),
        (
            day
            + (F.col("l_orderkey") * 7 + F.col("l_linenumber"))
            % IOV_DUR_MOD
            + 1
        ).alias("e"),
    )
    binned = iv.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"s div {IOV_BIN_DAYS}"), F.expr(f"e div {IOV_BIN_DAYS}")
            )
        ),
    )
    a = binned.select(
        F.col("bin").alias("bin_a"),
        F.col("l_suppkey").alias("supp_a"),
        F.col("iid").alias("id1"),
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
    )
    b = binned.select(
        F.col("bin").alias("bin_b"),
        F.col("l_suppkey").alias("supp_b"),
        F.col("iid").alias("id2"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    return (
        a.join(
            b,
            (F.col("bin_a") == F.col("bin_b"))
            & (F.col("supp_a") == F.col("supp_b"))
            & (F.col("id1") < F.col("id2"))
            & (F.col("s1") <= F.col("e2"))
            & (F.col("s2") <= F.col("e1")),
        )
        .select(
            F.col("supp_a").alias("l_suppkey"),
            "id1",
            "id2",
            (
                F.least("e1", "e2") - F.greatest("s1", "s2") + 1
            ).alias("overlap_days"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# running distinct count (cumulative cardinality per entity)
# ---------------------------------------------------------------------------


@query(
    "window_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(first_seen) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_types_so_far
    FROM flagged
    """,
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count per entity over time — how many
    distinct event types each user has touched as of each event (the
    breadth-of-engagement curve). Running count-distinct has no
    streaming-friendly aggregate; the standard exact decomposition is
    a first-seen flag (row_number = 1 within (user, type)) followed by
    a running sum of flags — two window passes over ONE user_id
    shuffle, no per-row set state.

    Scale shape: ONE explicit user_id exchange serves both windows —
    hash(user_id) partitioning satisfies the (user_id, event_type)
    clustering the first window requires, so Spark inserts only sorts
    between them (left implicit, the planner adds a second exchange
    for the narrower key); state per row is a single int, vs the
    naive collect_set-over-window which buffers a growing set per row.
    """
    from kafka_parquet_writer_spark.session import repartition_for_compute

    ev = repartition_for_compute(
        load_table(spark, sf_dir, "events"), F.col("user_id")
    )
    w_first = W.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        ev.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("first_seen").over(w_run).alias("n_types_so_far"),
        )
    )


# ---------------------------------------------------------------------------
# time-weighted average (TWAP over irregular samples)
# ---------------------------------------------------------------------------


@query(
    "agg_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS vc,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM events
    )
    SELECT user_id,
           (floor((CAST(sum((t_next - t) * vc) AS DOUBLE)
                   / (100.0 * (max(t_next) - min(t)))) * 1e6 + 0.5) / 1e6)
             AS twap,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM seg
    WHERE t_next IS NOT NULL
    GROUP BY user_id
    HAVING max(t_next) > min(t)
    """,
)
def agg_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user over IRREGULAR samples —
    each observation holds until the next one, so its weight is the
    duration it was current (the metering/pricing TWAP, where a plain
    avg() over-weights bursts). Value is held step-wise: segment
    weight = micros to the next event; the last observation carries no
    segment (open-ended) and is excluded symmetric with the oracle.

    All weights are integer microseconds and values integer cents —
    the sum is exact; ONE division at the end produces the float.

    Scale shape: one user_id shuffle serving both the lead() window
    and the aggregate (same key, one exchange); no self-join of
    consecutive rows, which is the naive formulation's extra shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        cents(F.col("value")).alias("vc"),
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum((F.col("t_next") - F.col("t")) * F.col("vc")).alias("num"),
            F.max("t_next").alias("t_hi"),
            F.min("t").alias("t_lo"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .filter(F.col("t_hi") > F.col("t_lo"))
        .select(
            "user_id",
            pround(
                F.col("num").cast("double")
                / (100.0 * (F.col("t_hi") - F.col("t_lo"))),
                6,
            ).alias("twap"),
            "n_segments",
        )
    )


# --- ts_subsequence_topk ------------------------------------------------------

SUBSEQ_L = 8  #: subsequence window length (UCR-style query length)
SUBSEQ_K = 20  #: matches returned
#: the z-normalized query shape (a single spike), 6-decimal literals
#: embedded identically in both engines — the pattern is a constant of
#: the operator, precomputed offline like a real similarity-search
#: query vector
SUBSEQ_Q = [
    -0.629941, -0.629941, 0.377964, 2.393775,
    0.377964, -0.629941, -0.629941, -0.629941,
]


def _subseq_oracle() -> str:
    """Mirror of the Spark plan with IDENTICAL float association.
    Exactness argument (why the only pround is at the end): window
    values are exact int64 cents; their 8-sum is exact; mean = s8/8.0
    divides by a power of two, so it is an EXACT double; each
    deviation is (8·v − s8)/8 — an exact multiple of 1/8 — and its
    square ≤ ~6e13 < 2^53 stays exact, so ssq is exact REGARDLESS of
    association. sd = sqrt(ssq/8) and each z-score are single
    correctly-rounded IEEE ops, identical on both engines; only the
    final distance accumulation is association-sensitive, built as the
    same left-to-right chain on both sides and floor-rounded to 6
    decimals before the (d2, user_id, event_id) total-order top-K."""
    L, k = SUBSEQ_L, SUBSEQ_K
    # The mean-is-exact leg of the argument above needs the divisor to
    # be a power of two; everything else holds for any L.
    assert L > 0 and L & (L - 1) == 0, "SUBSEQ_L must be a power of two"
    lags = ", ".join(
        f"lag(vc, {L - 1 - i}) OVER w AS v{i + 1}" for i in range(L)
    )
    s8 = " + ".join(f"v{i + 1}" for i in range(L))
    ssq = " + ".join(f"(v{i + 1} - mn) * (v{i + 1} - mn)" for i in range(L))
    d2 = " + ".join(
        f"((v{i + 1} - mn) / sd - ({SUBSEQ_Q[i]})) * "
        f"((v{i + 1} - mn) / sd - ({SUBSEQ_Q[i]}))"
        for i in range(L)
    )
    vs = ", ".join(f"v{i + 1}" for i in range(L))
    return f"""
    WITH x AS (
      SELECT user_id, event_id, epoch_us(ts) AS tu, {sql_cents('value')} AS vc
      FROM events WHERE value IS NOT NULL
    ), lagged AS (
      SELECT user_id, event_id, {lags}
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    ), st AS (
      SELECT user_id, event_id, {vs}, ({s8}) / {float(L)!r} AS mn
      FROM lagged WHERE v1 IS NOT NULL
    ), ss AS (
      SELECT user_id, event_id, {vs}, mn, ({ssq}) AS ssq FROM st
    ), zd AS (
      SELECT user_id, event_id, {vs}, mn, sqrt(ssq / {float(L)!r}) AS sd
      FROM ss WHERE ssq > 0
    ), d AS (
      SELECT user_id, event_id, {sql_pround(d2, 6)} AS d2 FROM zd
    )
    SELECT user_id, event_id, d2
    FROM d ORDER BY d2, user_id, event_id LIMIT {k}
    """


@query("ts_subsequence_topk", oracle=_subseq_oracle())
def ts_subsequence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series SUBSEQUENCE similarity search (the UCR-suite /
    matrix-profile query shape; cf. the retrieved EDBT 2019 'Time
    Series Similarity Search for Streaming Data in Distributed
    Systems'): find the {SUBSEQ_K} length-{SUBSEQ_L} windows of any
    user's value series closest — in z-normalized Euclidean distance —
    to a constant query shape. Z-normalization (subtract window mean,
    divide by window std) is what makes the match amplitude- and
    offset-invariant, the standard semantics for pattern search;
    constant windows (std = 0) cannot be z-normalized and are skipped.
    Emits (user_id, event_id of the window's last event, d2).

    Scale shape: ONE shuffle on user_id serves the lag() window (the
    window_smooth pattern — per-row trailing values as plain columns,
    no array materialization); the mean/std/distance pipeline is a
    pure codegen projection; the top-K is TakeOrderedAndProject
    (per-partition partial top-K, no global sort). At 100 TB this is a
    single pass over the fact table with K rows on the driver — the
    brute-force baseline a real system prunes with early-abandon /
    LB_Keogh bounds, which only reduce the per-row constant.

    Float portability: all inputs become exact int64 cents; mean and
    every deviation are exact doubles by construction (powers-of-two
    divisions of exact integers), ssq is exact regardless of
    association, and sd/z-scores are single correctly-rounded IEEE
    ops — the ONLY association-sensitive float sum is the final
    distance chain, built left-to-right identically in both engines
    and floor-rounded to 6 decimals before the total-order top-K.
    The mean-exactness leg requires L be a power of two (asserted in
    the oracle builder); mean and std divisors derive from SUBSEQ_L,
    never a literal, so changing L keeps the semantics.
    """
    L, k = SUBSEQ_L, SUBSEQ_K
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("tu", "event_id")
    x = ev.filter(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tu"),
        cents(F.col("value")).alias("vc"),
    )
    lagged = x.select(
        "user_id",
        "event_id",
        *[
            F.lag("vc", L - 1 - i).over(w).alias(f"v{i + 1}")
            for i in range(L)
        ],
    ).filter(F.col("v1").isNotNull())
    s8 = F.col("v1")
    for i in range(2, L + 1):
        s8 = s8 + F.col(f"v{i}")
    st = lagged.withColumn("mn", s8 / F.lit(float(L)))
    ssq = (F.col("v1") - F.col("mn")) * (F.col("v1") - F.col("mn"))
    for i in range(2, L + 1):
        dv = F.col(f"v{i}") - F.col("mn")
        ssq = ssq + dv * dv
    zd = (
        st.withColumn("ssq", ssq)
        .filter(F.col("ssq") > 0)
        .withColumn("sd", F.sqrt(F.col("ssq") / F.lit(float(L))))
    )
    d2 = None
    for i in range(1, L + 1):
        zi = (F.col(f"v{i}") - F.col("mn")) / F.col("sd")
        term = (zi - F.lit(SUBSEQ_Q[i - 1])) * (zi - F.lit(SUBSEQ_Q[i - 1]))
        d2 = term if d2 is None else d2 + term
    return (
        zd.select("user_id", "event_id", pround(d2, 6).alias("d2"))
        .orderBy("d2", "user_id", "event_id")
        .limit(k)
    )

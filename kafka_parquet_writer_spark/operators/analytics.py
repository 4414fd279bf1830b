"""Extended analytics surface: statistical aggregates, pivot,
distribution window functions, scalar subqueries.

Numeric policy (see functions/portable.py): every statistic is built
from exact integer moment sums (Σx, Σx², Σxy over fixed-point ints),
with the float formula applied in one deterministic op order — so
stddev/corr hash-match across engines, which naive stddev_samp(double)
never would (different accumulation algorithms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import cents, pround, sql_cents, sql_pround
from kafka_parquet_writer_spark.registry import query

ORDER_STATUSES = ["F", "O", "P"]


@query(
    "agg_stats",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             count(*)                       AS n,
             sum(q)                         AS sx,
             sum(q * q)                     AS sxx,
             sum(ep)                        AS sy,
             sum(ep * ep)                   AS syy,
             sum(q * ep)                    AS sxy
      FROM (
        SELECT l_returnflag,
               CAST(floor(l_quantity + 0.5) AS BIGINT)      AS q,
               CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS ep
        FROM lineitem
      )
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           {sql_pround(
               'sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)'
               ' - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))'
               ' / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))', 6)} AS sd_qty,
           {sql_pround(
               '(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)'
               ' - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))'
               ' / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)'
               '   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))'
               ' * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)'
               '   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))', 6)}  AS corr_qty_price
    FROM m
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev + Pearson correlation from exact integer moments.

    Semantically stddev_samp(l_quantity) / corr(qty, price) with values
    rounded to whole units first (so the moment sums stay exact int64:
    Σep² ≤ 1e10·rows — safe beyond 1e8 rows/group; DECIMAL(38) past
    that). One shuffle, single-pass, mergeable — the same shape Spark's
    own stddev/corr use, minus the float accumulation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.floor(F.col("l_quantity") + 0.5).cast("long")
    ep = F.floor(F.col("l_extendedprice") + 0.5).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("sx"),
        F.sum(q * q).alias("sxx"),
        F.sum(ep).alias("sy"),
        F.sum(ep * ep).alias("syy"),
        F.sum(q * ep).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    sy, syy = F.col("sy").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return m.select(
        "l_returnflag",
        "n",
        pround(F.sqrt(var_x / (n * (n - 1).cast("double"))), 6).alias("sd_qty"),
        pround((n * sxy - sx * sy) / F.sqrt(var_x * var_y), 6).alias(
            "corr_qty_price"
        ),
    )


def _pivot_oracle() -> str:
    cases = ",\n           ".join(
        sql_pround(
            f"coalesce(sum(CASE WHEN o_orderstatus = '{s}' THEN tpc END), 0)"
            " / 100.0",
            2,
        )
        + f" AS rev_{s.lower()}"
        for s in ORDER_STATUSES
    )
    return f"""
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, {sql_cents('o_totalprice')} AS tpc
      FROM orders
    )
    SELECT o_orderpriority,
           {cases}
    FROM c
    GROUP BY o_orderpriority
    """


@query("pivot_wide", oracle=_pivot_oracle())
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: revenue by priority (rows) × order status (columns).

    Explicit pivot values keep the schema static (required for both the
    driver hash and any sane production job — dynamic pivot = an extra
    distinct-scan AND a schema that drifts with the data).
    """
    o = load_table(spark, sf_dir, "orders")
    from kafka_parquet_writer_spark.functions.portable import cents

    piv = (
        o.select(
            "o_orderpriority", "o_orderstatus", cents(F.col("o_totalprice")).alias("tpc")
        )
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.sum("tpc"))
    )
    return piv.select(
        "o_orderpriority",
        *[
            pround(F.coalesce(F.col(s), F.lit(0)) / 100.0, 2).alias(f"rev_{s.lower()}")
            for s in ORDER_STATUSES
        ],
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(ntile(4) OVER w AS INTEGER)                          AS quartile,
           (floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6)        AS pct_rank,
           (floor((cume_dist() OVER w) * 1e6 + 0.5) / 1e6)           AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist.

    The ordering includes the unique orderkey tie-break, making every
    rank integer-deterministic; percent_rank and cume_dist are then a
    single int/int division — engine-independent.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
        pround(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT)
          > (SELECT CAST(sum(CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT))
                         AS DOUBLE) / count(*)
             FROM lineitem) * 1.5
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: rows 1.5× above the global mean quantity.

    Spark formulation: the scalar aggregate is a 1-row frame broadcast
    into the filter (crossJoin) — exactly how Catalyst executes an
    uncorrelated scalar subquery (ScalarSubquery → broadcast exchange).
    The threshold derives from an exact cents sum, so both engines
    compare against the identical double.
    """
    from kafka_parquet_writer_spark.functions.portable import cents

    li = load_table(spark, sf_dir, "lineitem")
    qc = cents(F.col("l_quantity"))
    thresh = li.agg(
        (F.sum(qc).cast("double") / F.count(F.lit(1))).alias("avg_qc")
    )
    return (
        li.crossJoin(F.broadcast(thresh))
        .filter(qc > F.col("avg_qc") * 1.5)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "window_range_frame",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT)            AS tsec,
             CAST(floor(value * 1e2 + 0.5) AS BIGINT)    AS c
      FROM events
    )
    SELECT user_id, event_id,
           (floor((CAST(sum(c) OVER (PARTITION BY user_id ORDER BY tsec
                     RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
                   AS DOUBLE) / 100.0) * 1e4 + 0.5) / 1e4) AS roll_value
    FROM e
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event time: per-user rolling sum of the
    trailing 10 minutes — a *value*-bounded frame (rows at the same
    second are peers; frame width varies with event density), which the
    ROWS frames of `window_frame` cannot express.

    Values are summed as exact integer cents so peer-row inclusion
    order is irrelevant; the frame bound is on floor-seconds computed
    identically in both engines.
    """
    from kafka_parquet_writer_spark.functions.portable import cents

    ev = load_table(spark, sf_dir, "events").withColumn(
        "tsec", F.col("ts").cast("long")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tsec")
        .rangeBetween(-600, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        pround(F.sum(cents(F.col("value"))).over(w).cast("double") / 100.0, 4).alias(
            "roll_value"
        ),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           (floor((quantile_cont(value, 0.25)) * 1e6 + 0.5) / 1e6) AS p25,
           (floor((quantile_cont(value, 0.50)) * 1e6 + 0.5) / 1e6) AS p50,
           (floor((quantile_cont(value, 0.90)) * 1e6 + 0.5) / 1e6) AS p90
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics) per
    group. Spark's `percentile` and DuckDB's `quantile_cont` both use
    linear interpolation at p·(n−1); rounding to 6 digits absorbs the
    last-ulp formula difference. At 100 TB the same query shape swaps
    `percentile` for `approx_percentile` (t-digest, mergeable partials)
    — exact percentiles require a per-group sort buffer.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        pround(F.percentile("value", 0.25), 6).alias("p25"),
        pround(F.percentile("value", 0.50), 6).alias("p50"),
        pround(F.percentile("value", 0.90), 6).alias("p90"),
    )


@query(
    "subquery_exists",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F'
                        AND o2.o_totalprice < 50000)
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL entry point:
    customers with a >300k order and no cheap completed order. Catalyst
    rewrites the pair to a left-semi + left-anti join (same physical
    shape as `join_semi`/`join_anti`) — this query pins the SQL-parser
    path and the rewrite, complementing the DataFrame-API joins.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM v_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F'
                            AND o2.o_totalprice < 50000)
        """
    )


@query(
    "subquery_correlated_agg",
    oracle="""
    SELECT p.p_partkey, p.p_brand,
           (floor((p.p_retailprice) * 1e2 + 0.5) / 1e2) AS price_r
    FROM part p
    WHERE p.p_retailprice = (SELECT min(p2.p_retailprice)
                             FROM part p2
                             WHERE p2.p_brand = p.p_brand)
    """,
)
def subquery_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery (TPC-H Q2's shape):
    rows matching their group's aggregate. Catalyst decorrelates this
    into an aggregate + join — the rewrite this query pins via the SQL
    parser path; equality on raw doubles is safe because both engines
    compare the same stored values (no arithmetic).
    """
    load_table(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand,
               floor(p.p_retailprice * 1e2 + 0.5) / 1e2 AS price_r
        FROM v_part p
        WHERE p.p_retailprice = (SELECT min(p2.p_retailprice)
                                 FROM v_part p2
                                 WHERE p2.p_brand = p.p_brand)
        """
    )


@query(
    "events_funnel",
    oracle="""
    WITH e AS (SELECT user_id, event_type, ts FROM events),
    s1 AS (
      SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
                OVER (PARTITION BY user_id) AS t1
      FROM e
    ),
    s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
                OVER (PARTITION BY user_id) AS t2
      FROM s1
    ),
    s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
                OVER (PARTITION BY user_id) AS t3
      FROM s2
    )
    SELECT
      CAST(count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END) AS BIGINT)
        AS n_view,
      CAST(count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END) AS BIGINT)
        AS n_view_click,
      CAST(count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END) AS BIGINT)
        AS n_view_click_purchase
    FROM s3
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): per user, the
    first view, the first click strictly AFTER that view, the first
    purchase strictly after that click; counts how many users survive
    each stage. The product-analytics sequence-matching shape.

    Scale: three chained window aggregates over the SAME user_id
    partitioning — one shuffle total, each stage's threshold feeding
    the next without a self-join (the naive formulation is a 3-way
    self-join on the event table; this is one pass). The final
    stage-count aggregate is a 1-row reduction.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    wu = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu)
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
                F.col("ts"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2")),
                F.col("ts"),
            )
        ).over(wu),
    )
    return s3.agg(
        F.countDistinct(
            F.when(F.col("t1").isNotNull(), F.col("user_id"))
        ).alias("n_view"),
        F.countDistinct(
            F.when(F.col("t2").isNotNull(), F.col("user_id"))
        ).alias("n_view_click"),
        F.countDistinct(
            F.when(F.col("t3").isNotNull(), F.col("user_id"))
        ).alias("n_view_click_purchase"),
    )


@query(
    "agg_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_wk FROM events
    )
    SELECT strftime(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', CAST(f.cohort_wk AS DATE),
                          CAST(a.act_wk AS DATE)) / 7 AS INTEGER)
             AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN first_seen f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def agg_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week,
    counted in each later activity week (offset in weeks) — the
    engagement table every analytics stack computes.

    Scale: one user-grain aggregate (first event), one distinct
    projection of (user, week), an equi-join on user_id (both sides
    user-grain ≪ events), and the final (cohort, offset) aggregate —
    all shuffles on user_id reuse one partitioning; cohort weeks are
    formatted as strings so the output is engine-portable (date
    serialization differs, ISO strings don't).
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_wk")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.to_date("act_wk"), F.to_date("cohort_wk")) / 7
            ).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "agg_winsorized",
    oracle=f"""
    WITH x AS (
      SELECT o_orderpriority AS priority,
             o_orderkey,
             {sql_cents('o_totalprice')} AS vc
      FROM orders
    ), r AS (
      SELECT priority, vc,
             row_number() OVER (PARTITION BY priority
                                ORDER BY vc, o_orderkey) AS rn,
             count(*)    OVER (PARTITION BY priority)    AS n
      FROM x
    ), t AS (
      SELECT priority, vc, n,
             max(CASE WHEN rn = (n * 5  + 99) // 100 THEN vc END)
               OVER (PARTITION BY priority) AS lo,
             max(CASE WHEN rn = (n * 95 + 99) // 100 THEN vc END)
               OVER (PARTITION BY priority) AS hi
      FROM r
    ), c AS (
      SELECT priority, n, lo, hi,
             least(greatest(vc, lo), hi) AS cw
      FROM t
    )
    SELECT priority,
           CAST(max(n)  AS BIGINT) AS n_orders,
           CAST(max(lo) AS BIGINT) AS lo_cents,
           CAST(max(hi) AS BIGINT) AS hi_cents,
           {sql_pround('sum(cw) / 100.0 / max(n)', 2)} AS win_avg
    FROM c
    GROUP BY priority
    """,
)
def agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics: per order priority, clamp order
    totals at the exact empirical 5th/95th percentiles (discrete —
    the k-th smallest element, k = ceil(p·n), so both engines pick an
    actual data value, no interpolation arithmetic to diverge on) and
    report the clamped mean — the outlier-robust aggregate a feature
    pipeline ships instead of a raw mean.

    Scale shape: ONE shuffle on the group key serves everything — the
    rank/count windows, the percentile-element broadcast back to rows
    (a full-frame window max, not a self-join), the clamp, and the
    final aggregate all reuse the same hash partitioning. Fixed-point
    cents keep the percentile compare and the clamped sum
    engine-identical.
    """
    x = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        cents(F.col("o_totalprice")).alias("vc"),
    )
    w_ord = W.partitionBy("priority").orderBy("vc", "o_orderkey")
    w_all = W.partitionBy("priority").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    r = x.withColumn("rn", F.row_number().over(w_ord)).withColumn(
        "n", F.count(F.lit(1)).over(w_all)
    )
    k_lo = ((F.col("n") * 5 + 99) / 100).cast("long")
    k_hi = ((F.col("n") * 95 + 99) / 100).cast("long")
    t = r.withColumn(
        "lo", F.max(F.when(F.col("rn") == k_lo, F.col("vc"))).over(w_all)
    ).withColumn(
        "hi", F.max(F.when(F.col("rn") == k_hi, F.col("vc"))).over(w_all)
    )
    c = t.withColumn(
        "cw", F.least(F.greatest(F.col("vc"), F.col("lo")), F.col("hi"))
    )
    return c.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.max("lo").cast("long").alias("lo_cents"),
        F.max("hi").cast("long").alias("hi_cents"),
        pround(F.sum("cw") / 100.0 / F.max("n"), 2).alias("win_avg"),
    )


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------

#: attribution lookback window (µs) — clicks this long before a
#: purchase share its credit
ATTR_WINDOW_US = 10 * 60 * 1_000_000


@query(
    "events_attribution",
    oracle=f"""
    WITH pairs AS (
      SELECT p.event_id AS purchase_id,
             c.event_id AS click_id,
             p.value    AS pv,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts, c.event_id)      AS rn,
             count(*)   OVER (PARTITION BY p.event_id)          AS n
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON c.user_id = p.user_id
       AND c.ts <= p.ts
       AND epoch_us(p.ts) - epoch_us(c.ts) <= {ATTR_WINDOW_US}
    )
    SELECT purchase_id, click_id,
           {sql_pround(f'''CASE WHEN n = 1 THEN 1.0
                 WHEN n = 2 THEN 0.5
                 WHEN rn = 1 OR rn = n THEN 0.4
                 ELSE 0.2 / (n - 2) END''', 6)} AS weight,
           {sql_pround(f'''pv * (CASE WHEN n = 1 THEN 1.0
                      WHEN n = 2 THEN 0.5
                      WHEN rn = 1 OR rn = n THEN 0.4
                      ELSE 0.2 / (n - 2) END)''', 4)} AS credit
    FROM pairs
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every click
    within the lookback window before a purchase earns a share of its
    value — 40% to the first touch, 40% to the last, the middle 20%
    split evenly (1.0 / 0.5-0.5 for one- and two-click paths). The
    step past `join_asof`'s last-touch-only credit, and the query
    marketing analytics actually runs.

    Scale shape: one shuffle joins clicks to purchases on user_id with
    the time-band predicate bounding the pair fan-out (the
    `stream_stream_join` interval shape, batch-side); the position
    ranks are one window pass keyed by purchase_id. Weights are exact
    rational expressions of (rn, n) — no floating accumulation order
    to drift between engines.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("pv"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    pairs = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.unix_micros("p_ts") - F.unix_micros("c_ts")
            <= ATTR_WINDOW_US
        ),
    )
    w = W.partitionBy("purchase_id")
    pairs = pairs.withColumn(
        "rn",
        F.row_number().over(w.orderBy(F.col("c_ts"), F.col("click_id"))),
    ).withColumn("n", F.count(F.lit(1)).over(w))
    weight = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return pairs.select(
        "purchase_id",
        "click_id",
        pround(weight, 6).alias("weight"),
        pround(F.col("pv") * weight, 4).alias("credit"),
    )


# ---------------------------------------------------------------------------
# first-order behavior transitions (Markov chain estimation)
# ---------------------------------------------------------------------------


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    c AS (
      SELECT src, dst, count(*) AS n FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           (floor((CAST(n AS DOUBLE)
                   / sum(n) OVER (PARTITION BY src)) * 1e6 + 0.5) / 1e6)
             AS p
    FROM c
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior transition matrix: for each consecutive
    event pair within a user's timeline, count src→dst transitions and
    normalize per source state — the empirical Markov chain behind
    next-action prediction, funnel leak analysis, and session
    simulation.

    Scale shape: lead() and the (src, dst) aggregate are the whole
    plan — one user_id shuffle for the sequence, one |states|²-sized
    aggregate (map-side combined); the per-src normalization windows
    over the tiny transition matrix, never the events.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    w_src = W.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n",
        pround(
            F.col("n").cast("double") / F.sum("n").over(w_src), 6
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# concentration metrics (Gini over a grouped value distribution)
# ---------------------------------------------------------------------------


@query(
    "agg_gini",
    oracle=f"""
    WITH v AS (
      SELECT o_orderpriority AS grp,
             {sql_cents('o_totalprice')} AS x,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY {sql_cents('o_totalprice')},
                                         o_orderkey) AS i
      FROM orders
    )
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n,
           (floor((CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
                   / (count(*) * sum(x))) * 1e6 + 0.5) / 1e6) AS gini
    FROM v
    GROUP BY grp
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of order value per priority
    class — the inequality metric behind revenue-concentration and
    data-source-balance dashboards (a corpus mixture with gini → 1 is
    dominated by a few sources). Computed by the rank formulation
    G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending ranks — exact,
    no quantile binning.

    All sums are integer (cents × rank < 2^63 at any realistic scale);
    ONE division produces the float. Scale shape: one window pass for
    ranks + one aggregate, both on the same group key — one shuffle;
    the deterministic (value, key) rank order makes the result
    engine-identical despite duplicate values.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        cents(F.col("o_totalprice")).alias("x"),
        "o_orderkey",
    )
    w = W.partitionBy("grp").orderBy("x", "o_orderkey")
    v = o.withColumn("i", F.row_number().over(w))
    return v.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        pround(
            (
                2 * F.sum(F.col("i") * F.col("x"))
                - (F.count(F.lit(1)) + 1) * F.sum("x")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("x")),
            6,
        ).alias("gini"),
    )


# --- agg_decayed_value -------------------------------------------------------

#: per-day halving — decay weight = 2^-(age_days), exact in integers
DECAY_REF_DAYS = 19800  #: reference epoch-day (past the fixture's range)


@query(
    "agg_decayed_value",
    oracle=f"""
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS vc
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(vc) AS BIGINT) AS cents_raw,
           CAST(sum(vc // CAST(pow(2, LEAST({DECAY_REF_DAYS} - d, 62))
                               AS BIGINT)) AS BIGINT) AS cents_decayed
    FROM e GROUP BY user_id
    """,
)
def agg_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-DECAYED user value: each event's cents contribute halved
    per day of age relative to a fixed reference day — the recency-
    weighted engagement/LTV score ranking pipelines maintain (recent
    activity dominates, old activity fades instead of being cliff-
    dropped by a window). Float e^{{-λΔt}} weights would be engine-
    unportable (pow/exp reassociation); per-day HALVING is the exact
    integer form: weight = 2^-(age_days), contribution = vc div
    2^age_days — order-free int64 addition, value-hash-exact, and the
    half-life is tunable by rescaling the day bucket.

    Scale shape: a pure per-row projection (epoch-day + shift) into
    ONE map-side-combined groupBy(user) — the same single-shuffle
    budget as agg_hash; nothing about decay changes the plan. An
    incremental refresh folds new days in by adding their decayed
    contributions and right-shifting the stored total per elapsed day
    (2^-k decays compose) — the agg_incremental pattern applies
    as-is.
    """
    ev = load_table(spark, sf_dir, "events")
    age = F.least(
        F.lit(DECAY_REF_DAYS) - F.floor(F.unix_timestamp("ts") / 86400),
        F.lit(62),
    ).cast("int")
    vc = cents(F.col("value"))
    # exact integer division by 2^age (both engines truncate toward
    # zero; all fixture values are positive so floor ≡ trunc anyway)
    return (
        ev.select(
            "user_id",
            vc.alias("vc"),
            F.expr(
                f"CAST(floor(value * 1e2 + 0.5) AS LONG)"
                f" div shiftleft(CAST(1 AS LONG),"
                f" CAST(least({DECAY_REF_DAYS} - floor(unix_timestamp(ts)"
                f" / 86400), 62) AS INT))"
            ).alias("dec"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("vc").cast("long").alias("cents_raw"),
            F.sum("dec").cast("long").alias("cents_decayed"),
        )
    )

"""TPC-DS-shaped query patterns over the TPC-H-ish fixture.

The reference is a Kafka→Parquet landing writer
(`KafkaProtoParquetWriter.java:156-380`); the tables it lands feed
exactly these report shapes downstream. Two canonical TPC-DS plan
shapes the TPC-H sweep doesn't cover:

- **channel union → rollup** (TPC-DS Q5's skeleton): several tagged
  channel scans UNION ALL into one stream, aggregated with ROLLUP
  subtotals. Exercises union-through-aggregate planning.
- **rollup + windowed rank over the aggregate** (TPC-DS Q67's
  skeleton): a dimension join, ROLLUP lattice, then rank WITHIN the
  aggregated output — the "top sellers per category including
  subtotal rows" report.

Channels derive from l_returnflag (the fixture has no shipmode):
'A'→store, 'N'→web, 'R'→catalog. Shapes, not the benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import cents, sql_cents
from kafka_parquet_writer_spark.registry import query

#: l_returnflag → sales channel tag
CHANNELS = [("A", "store"), ("N", "web"), ("R", "catalog")]

_SALES = "l_extendedprice * (1 - l_discount)"
_TAXED = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


@query(
    "channel_union_rollup",
    oracle=f"""
    WITH chan AS (
      {" UNION ALL ".join(
        f'''SELECT '{tag}' AS channel,
                   CAST(year(l_shipdate) AS INTEGER) AS yr,
                   {sql_cents(_SALES)} AS sales_c,
                   {sql_cents(_TAXED)} AS taxed_c
            FROM lineitem WHERE l_returnflag = '{flag}' '''
        for flag, tag in CHANNELS)}
    )
    SELECT CASE WHEN GROUPING(channel) = 1 THEN 'ALL' ELSE channel END
             AS channel,
           CASE WHEN GROUPING(yr) = 1 THEN -1 ELSE yr END AS yr,
           count(*) AS n,
           CAST(sum(sales_c) AS BIGINT) AS sales_vc,
           CAST(sum(taxed_c) AS BIGINT) AS taxed_vc
    FROM chan
    GROUP BY ROLLUP (channel, yr)
    """,
)
def channel_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q5 shape: three tagged channel scans (store/web/catalog
    slices of lineitem) UNION ALL into one stream; ROLLUP(channel,
    year) produces per-channel-year rows, channel subtotals, and the
    grand total in ONE aggregate. GROUPING() markers become portable
    'ALL'/-1 labels; money is exact fixed-point cents on both engines.

    Scale shape: Spark collapses the union of same-source scans into
    one pass where filters allow, and ROLLUP plans as a single Expand
    (3 replicas/row at 2 dims) into ONE two-phase hash aggregate —
    subtotals cost one shuffle, not one job per level. Each channel
    scan pushes its l_returnflag filter into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sales = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    taxed = cents(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    chan = None
    for flag, tag in CHANNELS:
        part = li.filter(F.col("l_returnflag") == flag).select(
            F.lit(tag).alias("channel"),
            F.year("l_shipdate").cast("int").alias("yr"),
            sales.alias("sales_c"),
            taxed.alias("taxed_c"),
        )
        chan = part if chan is None else chan.unionAll(part)
    return (
        chan.rollup("channel", "yr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("sales_c").alias("sales_vc"),
            F.sum("taxed_c").alias("taxed_vc"),
            F.grouping("channel").alias("g_c"),
            F.grouping("yr").alias("g_y"),
        )
        .select(
            F.when(F.col("g_c") == 1, "ALL").otherwise(F.col("channel"))
            .alias("channel"),
            F.when(F.col("g_y") == 1, -1).otherwise(F.col("yr"))
            .cast("int").alias("yr"),
            "n",
            "sales_vc",
            "taxed_vc",
        )
    )


RANK_TOPN = 3


@query(
    "rollup_share_rank",
    oracle=f"""
    WITH sales AS (
      SELECT split_part(p.p_type, ' ', 1) AS category,
             p.p_brand AS brand,
             {sql_cents(_SALES)} AS sales_c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    agg AS (
      SELECT CASE WHEN GROUPING(category) = 1 THEN 'ALL' ELSE category END
               AS category,
             CASE WHEN GROUPING(brand) = 1 THEN 'ALL' ELSE brand END
               AS brand,
             CAST(GROUPING(category) * 2 + GROUPING(brand) AS INTEGER)
               AS lvl,
             CAST(sum(sales_c) AS BIGINT) AS sales_vc
      FROM sales GROUP BY ROLLUP (category, brand)
    )
    SELECT category, brand, lvl, sales_vc,
           CAST(row_number() OVER (PARTITION BY lvl, category
                                   ORDER BY sales_vc DESC, brand)
                AS INTEGER) AS rnk
    FROM agg
    QUALIFY row_number() OVER (PARTITION BY lvl, category
                               ORDER BY sales_vc DESC, brand) <= {RANK_TOPN}
    """,
)
def rollup_share_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape: dimension join (part), ROLLUP(category,
    brand) lattice, then a windowed rank over the AGGREGATED output —
    top-{RANK_TOPN} brands per category by sales, with the subtotal
    rows ranked at their own lattice level. category = first word of
    p_type; money in exact cents.

    Scale shape: the dim join broadcasts part (no fact shuffle for the
    join); ROLLUP is one Expand + one two-phase hash aggregate; the
    rank window runs over the aggregate (|categories×brands| rows),
    never the fact table — the WindowGroupLimit top-k pushdown applies
    to that tiny relation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "sales_c"
        ),
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("category"),
        F.col("p_brand").alias("brand"),
    )
    sales = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = (
        sales.rollup("category", "brand")
        .agg(
            F.sum("sales_c").alias("sales_vc"),
            F.grouping("category").alias("g_c"),
            F.grouping("brand").alias("g_b"),
        )
        .select(
            F.when(F.col("g_c") == 1, "ALL").otherwise(F.col("category"))
            .alias("category"),
            F.when(F.col("g_b") == 1, "ALL").otherwise(F.col("brand"))
            .alias("brand"),
            (F.col("g_c") * 2 + F.col("g_b")).cast("int").alias("lvl"),
            "sales_vc",
        )
    )
    w = W.partitionBy("lvl", "category").orderBy(
        F.col("sales_vc").desc(), "brand"
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= RANK_TOPN)
        .select("category", "brand", "lvl", "sales_vc", "rnk")
    )


# --- rollup_margin_hierarchy (TPC-DS Q36 shape) ------------------------------

_REV4_ORACLE = (
    "CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5)"
    " AS BIGINT)"
)


@query(
    "rollup_margin_hierarchy",
    oracle=f"""
    WITH sales AS (
      SELECT split_part(p.p_type, ' ', 1) AS category,
             p.p_brand AS brand,
             {_REV4_ORACLE} AS rev4,
             CAST(floor(p.p_retailprice * 0.5 * 1e2 + 0.5) AS BIGINT)
               * CAST(floor(l.l_quantity * 1e2 + 0.5) AS BIGINT) AS cost4
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    agg AS (
      SELECT CASE WHEN GROUPING(category) = 1 THEN 'ALL' ELSE category END
               AS category,
             CASE WHEN GROUPING(brand) = 1 THEN 'ALL' ELSE brand END
               AS brand,
             CAST(GROUPING(category) + GROUPING(brand) AS INTEGER)
               AS lochierarchy,
             CAST(sum(rev4) AS BIGINT) AS rev4,
             CAST(sum(rev4 - cost4) AS BIGINT) AS profit4
      FROM sales GROUP BY ROLLUP (category, brand)
    )
    SELECT category, brand, lochierarchy,
           CAST(profit4 * 10000 // rev4 AS BIGINT) AS margin_bp,
           CAST(row_number() OVER (
                  PARTITION BY lochierarchy,
                               CASE WHEN lochierarchy = 0
                                    THEN category ELSE 'ALL' END
                  ORDER BY profit4 * 10000 // rev4, category, brand)
                AS INTEGER) AS rnk
    FROM agg
    """,
)
def rollup_margin_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36 shape: gross-margin RATIO over a ROLLUP hierarchy
    (category > brand), with `lochierarchy` = number of rolled-up
    levels and rank-within-parent ordered by margin ASCENDING (the
    "worst margins at each level of the hierarchy" report). Differs
    from rollup_share_rank (Q67) in both metric — a ratio of two
    rollup sums, not a single sum — and ranking scope — within the
    PARENT node, keyed by the grouping level itself. Margin is exact
    integer basis points (profit4·10⁴ div rev4; both operands exact
    1e-4 fixed point, cost modeled as 0.5×p_retailprice per the
    fixture's tpch_q9 convention — `tpch.py:tpch_q9`).

    Scale shape: broadcast part into the fact scan, ROLLUP = one
    Expand (3 replicas at 2 dims) into ONE two-phase hash aggregate;
    the window runs over the AGGREGATE (|categories|×|brands| rows),
    never the fact. At 100 TB: one fact shuffle, everything after is
    dimension-sized.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_brand", "p_retailprice"
    )
    rev4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e4
        + F.lit(0.5)
    ).cast("long")
    cost4 = (
        F.floor(F.col("p_retailprice") * 0.5 * 1e2 + F.lit(0.5)).cast("long")
        * F.floor(F.col("l_quantity") * 1e2 + F.lit(0.5)).cast("long")
    )
    sales = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("category"),
        F.col("p_brand").alias("brand"),
        rev4.alias("rev4"),
        cost4.alias("cost4"),
    )
    agg = (
        sales.rollup("category", "brand")
        .agg(
            F.sum("rev4").alias("rev4"),
            F.sum(F.col("rev4") - F.col("cost4")).alias("profit4"),
            F.grouping("category").alias("g_c"),
            F.grouping("brand").alias("g_b"),
        )
        .select(
            F.when(F.col("g_c") == 1, "ALL").otherwise(F.col("category"))
            .alias("category"),
            F.when(F.col("g_b") == 1, "ALL").otherwise(F.col("brand"))
            .alias("brand"),
            (F.col("g_c") + F.col("g_b")).cast("int").alias("lochierarchy"),
            F.expr("profit4 * 10000 div rev4").alias("margin_bp"),
        )
    )
    w = W.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("category")).otherwise("ALL"),
    ).orderBy("margin_bp", "category", "brand")
    return agg.select(
        "category",
        "brand",
        "lochierarchy",
        "margin_bp",
        F.row_number().over(w).cast("int").alias("rnk"),
    )


# --- events_time_bands (TPC-DS Q88 shape) ------------------------------------

#: (band label suffix, hour, extra predicate) — the Q88 pattern of a
#: time slot crossed with an attribute disjunction, all counted in one
#: scan. Predicates must be portable SQL (run verbatim in DuckDB).
TIME_BANDS = [
    (8, "value BETWEEN 5 AND 50 OR event_type IN ('view', 'click')"),
    (9, "value BETWEEN 10 AND 80 OR event_type IN ('purchase')"),
    (10, "value BETWEEN 0 AND 30 OR event_type IN ('signup', 'error')"),
    (11, "value BETWEEN 20 AND 120 OR event_type IN ('click')"),
    (12, "value BETWEEN 5 AND 60 OR event_type IN ('view')"),
    (13, "value BETWEEN 15 AND 90 OR event_type IN ('purchase', 'click')"),
    (14, "value BETWEEN 0 AND 45 OR event_type IN ('error')"),
    (15, "value BETWEEN 30 AND 200 OR event_type IN ('signup')"),
]


@query(
    "events_time_bands",
    oracle=f"""
    SELECT {", ".join(
        f'''CAST(sum(CASE WHEN CAST(hour(ts) AS INTEGER) = {h}
                          AND ({pred}) THEN 1 ELSE 0 END)
             AS BIGINT) AS h{h}_cnt'''
        for h, pred in TIME_BANDS)}
    FROM events
    """,
)
def events_time_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: eight (time slot × attribute disjunction)
    counts as ONE conditional-aggregation scan producing a single
    8-column row. The benchmark text writes this as 8 scalar
    subqueries cross-joined — 8 scans; the Spark-first form folds all
    bands into one pass (the same declared-rules pattern as dq_rules,
    applied to Q88's report).

    Scale shape: one scan, zero shuffles before the final 1-row
    global aggregate (partial aggregation reduces each partition to 8
    counters). Adding a band is a tuple in TIME_BANDS, not a job. At
    100 TB this is scan-bound — the minimum possible cost for the
    answer.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        *[
            F.sum(
                F.when(
                    (F.hour("ts").cast("int") == h) & F.expr(pred), 1
                ).otherwise(0)
            ).alias(f"h{h}_cnt")
            for h, pred in TIME_BANDS
        ]
    )


# --- cross_channel_intersect (TPC-DS Q14 shape) ------------------------------


@query(
    "cross_channel_intersect",
    oracle=f"""
    WITH cross_items AS (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT CASE l.l_returnflag WHEN 'A' THEN 'store'
                               WHEN 'N' THEN 'web'
                               ELSE 'catalog' END AS channel,
           CAST(count(DISTINCT l.l_partkey) AS BIGINT) AS n_items,
           CAST(count(*) AS BIGINT) AS n_sales,
           CAST(sum({sql_cents(_SALES)}) AS BIGINT) AS sales_vc
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT l_partkey FROM cross_items)
    GROUP BY 1
    """,
)
def cross_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14 shape: items sold in ALL channels (a 3-way INTERSECT
    of channel item sets) gate the per-channel sales report — the
    "cross-channel assortment" pattern. Exercises native set-op
    planning (Spark rewrites INTERSECT into distinct + left-semi
    joins) composed with a semi-join back onto the fact.

    Scale shape: each channel item set is a DISTINCT over a filtered
    scan (map-side combined, item-sized not fact-sized); the
    intersects and the fact gate are semi-joins on the item key — the
    item set is dimension-sized, so at 100 TB Spark's AQE converts the
    fact gate to a broadcast semi-join and the fact never shuffles for
    it; the only fact shuffle is the final per-channel aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    # the 3-way INTERSECT of per-channel distinct item sets ≡ ONE
    # aggregate over the fact: per item, a boolean per channel flag,
    # kept when all three are set (r15: the set-op form cost 3 scans +
    # 3 distinct shuffles + 2 intersect semi-join stacks — ~12
    # exchanges — for the same set; native set-op planning stays
    # exercised by the dedicated set_ops key)
    present = [
        F.max(F.col("l_returnflag") == flag).alias(f"in_{i}")
        for i, (flag, _tag) in enumerate(CHANNELS)
    ]
    all_present = None
    for i in range(len(CHANNELS)):
        c = F.col(f"in_{i}")
        all_present = c if all_present is None else all_present & c
    items = (
        li.groupBy("l_partkey").agg(*present).filter(all_present)
        .select("l_partkey")
    )
    sales = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(items, "l_partkey", "left_semi")
        .groupBy(
            F.when(F.col("l_returnflag") == "A", "store")
            .when(F.col("l_returnflag") == "N", "web")
            .otherwise("catalog")
            .alias("channel")
        )
        .agg(
            F.count_distinct("l_partkey").cast("long").alias("n_items"),
            F.count(F.lit(1)).alias("n_sales"),
            F.sum(sales).alias("sales_vc"),
        )
    )


# --- basket_count_band (TPC-DS Q34 shape) -----------------------------------

BASKET_LO, BASKET_HI = 4, 6  #: line-count band defining a "big basket"


@query(
    "basket_count_band",
    oracle=f"""
    WITH baskets AS (
      SELECT l_orderkey, count(*) AS cnt
      FROM lineitem GROUP BY l_orderkey
      HAVING count(*) BETWEEN {BASKET_LO} AND {BASKET_HI}
    )
    SELECT c.c_custkey, c.c_name, b.l_orderkey AS o_orderkey, 
           CAST(b.cnt AS BIGINT) AS cnt
    FROM baskets b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def basket_count_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34's plan skeleton (frequent-buyer ticket-size band):
    aggregate the FACT table per basket, keep baskets whose item count
    falls in a band via HAVING, then join the survivors BACK to the
    dimension for customer attribution — the
    aggregate→HAVING→join-back composition none of the other TPC-DS
    shapes (Q5/Q14/Q36/Q67/Q88) exercise. Fixture mapping: lineitem
    per-order line counts in [{BASKET_LO}, {BASKET_HI}], finished
    orders only, attributed to customer key+name.

    Scale shape: the HAVING filter runs ON the aggregate (post
    map-side-combine, so the shuffle carries partial counts, never
    lines), and the surviving basket set — a small fraction of orders
    — drives the join back, with AQE free to broadcast it against the
    dimension side. The fact table is aggregated exactly once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").between(BASKET_LO, BASKET_HI))
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    cust = load_table(spark, sf_dir, "customer")
    return (
        baskets.join(
            orders, baskets["l_orderkey"] == orders["o_orderkey"]
        )
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )

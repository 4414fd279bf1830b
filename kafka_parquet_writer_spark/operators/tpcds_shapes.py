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

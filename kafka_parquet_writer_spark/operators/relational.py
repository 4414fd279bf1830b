"""Relational operator inventory (SURVEY.md §2B rows 1-16).

None of these exist in the reference — `/root/reference/src/main` is two
files (`KafkaProtoParquetWriter.java`, `ParquetFile.java`) implementing a
Kafka→Parquet pipe with zero relational operators (SURVEY.md §2A,
"explicit absences"). Each query below is the Spark-idiomatic
formulation, declared via DataFrame ops so Catalyst plans pushdown /
pruning / join strategy; AQE (enabled in session.py) handles skew and
partition coalescing at scale.

Numeric policy: money columns are 2-decimal doubles; aggregates convert
them to exact int64 cents first (functions/portable.py) so sums are
exact integers — engine-independent regardless of summation order — and
final rounding uses the portable floor-form. At extreme scale cent-unit
products can outgrow int64 (bound noted per query); production swaps in
DECIMAL(38, n), same shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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


def _c(name: str) -> Column:
    return cents(F.col(name))


# ---------------------------------------------------------------------------
# scan + projection
# ---------------------------------------------------------------------------
@query(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: ReadSchema must contain only the 4 columns.

    Scale: parquet column pruning means IO ∝ selected columns, not table
    width — verified in tests via the physical plan's ReadSchema.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# filter with compound predicate
# ---------------------------------------------------------------------------
@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 30
      AND l_returnflag IN ('A', 'R')
      AND (l_discount < 0.05 OR l_tax >= 0.03)
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate IS NOT NULL
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate (AND/OR/IN/BETWEEN/null-check/timestamp cmp).

    Scale: the whole conjunction is pushable — Catalyst splits it into
    parquet-level PushedFilters; row-group stats skip non-matching
    row groups before decode.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 30)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_discount") < 0.05) | (F.col("l_tax") >= 0.03))
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount")


# ---------------------------------------------------------------------------
# hash aggregation — TPC-H Q1 shape; the flagship query (entry())
# ---------------------------------------------------------------------------
@query(
    "agg_hash",
    oracle=f"""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             {sql_cents('l_quantity')}      AS qc,
             {sql_cents('l_extendedprice')} AS epc,
             {sql_cents('l_discount')}      AS dpc,
             {sql_cents('l_tax')}           AS tpc
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           {sql_pround('sum(qc) / 100.0', 2)}                        AS sum_qty,
           {sql_pround('sum(epc) / 100.0', 2)}                       AS sum_base_price,
           {sql_pround('sum(epc * (100 - dpc)) / 1e4', 2)}           AS sum_disc_price,
           {sql_pround('sum(epc * (100 - dpc) * (100 + tpc)) / 1e6', 2)} AS sum_charge,
           {sql_pround('sum(qc) / (100.0 * count(*))', 6)}           AS avg_qty,
           {sql_pround('sum(epc) / (100.0 * count(*))', 6)}          AS avg_price,
           {sql_pround('sum(dpc) / (100.0 * count(*))', 6)}          AS avg_disc,
           count(*)                                                  AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: multi-measure hash aggregation over a pushed-down filter.

    All measures aggregate exact integer cent/percent units (sums are
    exact — no float summation order anywhere), then scale back to
    dollars. Bound: charge units peak ~1e11/row — int64 holds ~9e7 such
    rows per group; beyond that, DECIMAL(38).

    Scale: Spark's HashAggregate is two-phase (partial map-side combine
    → shuffle on the 2 group keys → final merge), so shuffle volume is
    O(#groups × partitions), not O(rows).
    """
    li = load_table(spark, sf_dir, "lineitem")
    qc, epc, dpc, tpc = _c("l_quantity"), _c("l_extendedprice"), _c("l_discount"), _c("l_tax")
    cnt = F.count(F.lit(1))
    disc_u = epc * (100 - dpc)
    charge_u = disc_u * (100 + tpc)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum(qc) / 100.0, 2).alias("sum_qty"),
            pround(F.sum(epc) / 100.0, 2).alias("sum_base_price"),
            pround(F.sum(disc_u) / 1e4, 2).alias("sum_disc_price"),
            pround(F.sum(charge_u) / 1e6, 2).alias("sum_charge"),
            pround(F.sum(qc) / (100.0 * cnt), 6).alias("avg_qty"),
            pround(F.sum(epc) / (100.0 * cnt), 6).alias("avg_price"),
            pround(F.sum(dpc) / (100.0 * cnt), 6).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# distinct + count-distinct
# ---------------------------------------------------------------------------
@query(
    "agg_distinct",
    oracle="""
    SELECT
      o_orderstatus,
      CAST(count(DISTINCT o_custkey) AS BIGINT)       AS n_cust,
      CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
      count(*)                                        AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — Spark plans expand + two-level aggregation.

    Scale: multiple distinct aggregates trigger an Expand (row
    multiplication ×#distinct-cols); acceptable at 2 distincts. For
    high-cardinality distincts at 100 TB prefer approx_count_distinct
    (see agg_approx_distinct).
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           count(*)                                AS n_events,
           TRUE                                    AS approx_within_10pct
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB-scale path for
    count-distinct: constant memory per group, no Expand, mergeable
    sketches across partitions. rsd=0.01 ⇒ ~1% error bound.

    Oracle form: the sketch value itself is engine-specific, so the
    checked output carries the exact distinct count plus a boolean
    asserting the HLL estimate landed within ±10% of it (DuckDB asserts
    the literal TRUE). A drifting sketch flips the boolean and fails the
    hash — a real accuracy gate, not a rows-only count.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("n_exact"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        "n_events",
        (
            (F.col("approx_users") >= 0.9 * F.col("n_exact"))
            & (F.col("approx_users") <= 1.1 * F.col("n_exact"))
        ).alias("approx_within_10pct"),
    )


# ---------------------------------------------------------------------------
# grouping sets / rollup
# ---------------------------------------------------------------------------
@query(
    "grouping_sets",
    oracle=f"""
    WITH c AS (
      SELECT n_name, o_orderpriority, {sql_cents('o_totalprice')} AS tpc
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
    )
    SELECT
      n_name,
      o_orderpriority,
      CAST(GROUPING(n_name) AS INTEGER) * 2
        + CAST(GROUPING(o_orderpriority) AS INTEGER)  AS gid,
      {sql_pround('sum(tpc) / 100.0', 2)}             AS revenue,
      count(*)                                        AS n_orders
    FROM c
    GROUP BY ROLLUP (n_name, o_orderpriority)
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a joined star; grouping id distinguishes subtotal rows.

    Scale: rollup = Expand(×3 here) + single hash agg; nation is
    broadcast so the only shuffle is the orders⋈customer equi-join.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            pround(F.sum(_c("o_totalprice")) / 100.0, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("n_name", "o_orderpriority", "gid", "revenue", "n_orders")
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------
@query(
    "join_inner_hash",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           {sql_pround(
               f"sum({sql_cents('l_extendedprice')} * "
               f"(100 - {sql_cents('l_discount')})) / 1e4", 2)} AS revenue
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_quantity > 45
    GROUP BY o_orderpriority
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-×-large equi inner join (TPC-H Q4 shape).

    Scale: both sides shuffle on orderkey; the l_quantity filter is
    pushed below the join so the shuffled lineitem side is pre-reduced.
    AQE converts to broadcast at runtime if the filtered side is small.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    rev_u = _c("l_extendedprice") * (100 - _c("l_discount"))
    return (
        o.join(li, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            pround(F.sum(rev_u) / 1e4, 2).alias("revenue"),
        )
    )


@query(
    "join_multiway",
    oracle=f"""
    SELECT n_name,
           {sql_pround(
               f"sum({sql_cents('l_extendedprice')} * "
               f"(100 - {sql_cents('l_discount')})) / 1e4", 2)} AS revenue,
           count(*) AS n_lines
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    GROUP BY n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join.

    Scale: supplier/nation/region are broadcast (no shuffle); the two
    big fact joins (orders⋈customer, lineitem⋈orders) shuffle on their
    keys. Catalyst places the broadcasts below the shuffles.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev_u = _c("l_extendedprice") * (100 - _c("l_discount"))
    return joined.groupBy("n_name").agg(
        pround(F.sum(rev_u) / 1e4, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "join_outer",
    oracle=f"""
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           {sql_pround(f"coalesce(sum({sql_cents('o_totalprice')}), 0) / 100.0", 2)}
             AS total_spent
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders.

    Scale: outer joins can't broadcast the preserved side when it's the
    big one; here both sides shuffle on custkey. count(col) correctly
    skips the null-extended rows.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            pround(
                F.coalesce(F.sum(cents(F.col("o_totalprice"))), F.lit(0)) / 100.0, 2
            ).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle=f"""
    WITH big_spenders AS (
      SELECT o_custkey AS custkey,
             {sql_pround(f"sum({sql_cents('o_totalprice')}) / 100.0", 2)} AS spent
      FROM orders GROUP BY o_custkey HAVING sum(o_totalprice) > 300000
    ),
    high_balance AS (
      SELECT c_custkey AS custkey, {sql_pround('c_acctbal', 2)} AS acctbal
      FROM customer WHERE c_acctbal > 5000
    )
    SELECT coalesce(b.custkey, h.custkey) AS custkey,
           b.spent                        AS spent,
           h.acctbal                      AS acctbal
    FROM big_spenders b
    FULL OUTER JOIN high_balance h ON b.custkey = h.custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two derived sets with null-extension both ways.

    The HAVING filter uses the raw double sum (selectivity only); the
    *output* value is the exact cents sum, so the row set and values are
    both deterministic (threshold 300000 is far from any sum boundary).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum("o_totalprice").alias("raw_spent"),
            pround(F.sum(cents(F.col("o_totalprice"))) / 100.0, 2).alias("spent"),
        )
        .filter(F.col("raw_spent") > 300000)
        .select("custkey", "spent")
    )
    high = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey"),
        pround(F.col("c_acctbal"), 2).alias("acctbal"),
    )
    b, h = big.alias("b"), high.alias("h")
    return b.join(h, F.col("b.custkey") == F.col("h.custkey"), "full_outer").select(
        F.coalesce(F.col("b.custkey"), F.col("h.custkey")).alias("custkey"),
        F.col("b.spent").alias("spent"),
        F.col("h.acctbal").alias("acctbal"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): no duplication of the left side.

    Scale: semi joins only ship the join key of the right side;
    Spark can use a broadcast of just the distinct keys.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_pround('c_acctbal', 2)} AS acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no urgent orders.

    The build side is FILTERED (urgent orders only) on purpose: the
    fixture gives every customer at least one order, so the unfiltered
    anti join returned 0 rows at every driver-checked SF — a green
    that proved only that both engines agree on "empty" (the r5
    dedup_url vacuous-green class, flagged by verify_oracle's r12
    0-row warning). No-urgent-orders customers exist at all three
    fixtures (18 / 203 / 1986), so the check now exercises real anti
    semantics; the filter also pushes into the build-side scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", pround(F.col("c_acctbal"), 2).alias("acctbal")
    )


@query(
    "join_theta",
    oracle="""
    SELECT p.p_partkey,
           CAST(count(*) AS BIGINT) AS n_cheaper_same_size
    FROM part p
    JOIN part q
      ON q.p_size = p.p_size AND q.p_retailprice < p.p_retailprice
    GROUP BY p.p_partkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (p_size) + non-equi residual (price <).

    Scale: the equi component keeps this a hash/sort-merge join with a
    residual filter — NOT a nested-loop cross product. A pure non-equi
    join would need range-bucketing (see join_asof for that pattern).
    """
    p = load_table(spark, sf_dir, "part").alias("p")
    q = load_table(spark, sf_dir, "part").alias("q")
    return (
        p.join(
            q,
            (F.col("q.p_size") == F.col("p.p_size"))
            & (F.col("q.p_retailprice") < F.col("p.p_retailprice")),
        )
        .groupBy(F.col("p.p_partkey").alias("p_partkey"))
        .agg(F.count(F.lit(1)).alias("n_cheaper_same_size"))
    )


@query(
    "join_asof",
    oracle=f"""
    SELECT p.event_id                       AS purchase_id,
           p.user_id                        AS user_id,
           {sql_pround('p.value', 2)}       AS purchase_value,
           c.event_id                       AS last_click_id,
           epoch_us(p.ts) - epoch_us(c.ts)  AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): each purchase matched to the
    user's most recent click at-or-before it.

    Spark-first formulation: union the two streams tagged, sort within
    user by (ts, tag), carry the last click forward with
    ``last(..., ignorenulls=True)`` over an unbounded-preceding frame —
    one shuffle on user_id, no nested loop, scales linearly.
    Tag order (click before purchase at equal ts) matches DuckDB ASOF's
    ``<=`` semantics. Reference has no joins at all (SURVEY.md §2A).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    is_click = F.col("event_type") == "click"
    w = W.partitionBy("user_id").orderBy(
        F.col("ts"), is_click.cast("int").desc(), F.col("event_id")
    ).rowsBetween(W.unboundedPreceding, 0)
    enriched = ev.withColumn(
        "last_click_id",
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w),
    ).withColumn(
        "last_click_ts",
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        enriched.filter(
            (F.col("event_type") == "purchase") & F.col("last_click_id").isNotNull()
        ).select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            pround(F.col("value"), 2).alias("purchase_value"),
            F.col("last_click_id"),
            (F.unix_micros("ts") - F.unix_micros("last_click_ts")).alias("gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------
@query(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey,
             o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn,
             CAST(rank() OVER (PARTITION BY o_custkey
                     ORDER BY floor(o_totalprice / 50000) DESC) AS INTEGER) AS rnk,
             CAST(dense_rank() OVER (PARTITION BY o_custkey
                     ORDER BY floor(o_totalprice / 50000) DESC) AS INTEGER) AS drnk
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer (top-3 orders).

    row_number's ordering includes the unique o_orderkey tie-break so the
    selected set is deterministic; rank/dense_rank rank a coarsened value
    so ties genuinely occur. Scale: one shuffle on o_custkey; per-group
    sort only (no global sort).
    """
    o = load_table(spark, sf_dir, "orders")
    w_rn = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    bucket = F.floor(F.col("o_totalprice") / 50000)
    w_rk = W.partitionBy("o_custkey").orderBy(bucket.desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).cast("int").alias("rnk"),
            F.dense_rank().over(w_rk).cast("int").alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_frame",
    oracle=f"""
    WITH c AS (
      SELECT event_id, user_id, ts, {sql_cents('value')} AS vc FROM events
    )
    SELECT event_id,
           user_id,
           {sql_pround('sum(vc) OVER w_run / 100.0', 4)} AS running_sum,
           {sql_pround('(sum(vc) OVER w_mov) / (100.0 * (count(*) OVER w_mov))', 6)}
             AS moving_avg_3
    FROM c
    WINDOW
      w_run AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_mov AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frames: running sum + 3-row moving average per user.

    Frame sums run over exact cents so frame-evaluation strategy
    (sliding vs recompute) can't perturb results.
    """
    ev = load_table(spark, sf_dir, "events")
    vc = cents(F.col("value"))
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = base.rowsBetween(W.unboundedPreceding, 0)
    mov = base.rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        pround(F.sum(vc).over(run) / 100.0, 4).alias("running_sum"),
        pround(
            F.sum(vc).over(mov) / (100.0 * F.count(F.lit(1)).over(mov)), 6
        ).alias("moving_avg_3"),
    )


@query(
    "window_lag_lead",
    oracle=f"""
    SELECT event_id,
           user_id,
           {sql_pround('value', 2)}                 AS value_r,
           {sql_pround('lag(value)  OVER w', 2)}    AS prev_value,
           {sql_pround('lead(value) OVER w', 2)}    AS next_value,
           epoch_us(ts) - epoch_us(lag(ts) OVER w)  AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation + inter-event gap in microseconds."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        pround(F.col("value"), 2).alias("value_r"),
        pround(F.lag("value").over(w), 2).alias("prev_value"),
        pround(F.lead("value").over(w), 2).alias("next_value"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# sort + limit (top-k)
# ---------------------------------------------------------------------------
@query(
    "sort_limit_topk",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, {sql_pround('l_extendedprice', 2)} AS price
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject — per-partition heaps of
    size k then a k-merge on the driver; never a global sort. The
    (orderkey, linenumber) tie-break makes the set deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
        .select(
            "l_orderkey",
            "l_linenumber",
            pround(F.col("l_extendedprice"), 2).alias("price"),
        )
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------
@query(
    "set_ops",
    oracle="""
    WITH big AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 250000),
         recent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1997-01-01')
    SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM big UNION SELECT * FROM recent)
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n
    FROM (SELECT * FROM big INTERSECT SELECT * FROM recent)
    UNION ALL
    SELECT 'except' AS op, count(*) AS n
    FROM (SELECT * FROM big EXCEPT SELECT * FROM recent)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over two derived key sets.

    Scale: all three are shuffles on the full row as key; for 100 TB
    prefer formulating as joins on explicit keys (semi/anti) which can
    broadcast — done here only for the op-parity demo.
    """
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 250000).select("o_custkey").distinct()
    recent = (
        o.filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )

    def count1(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(label).alias("op"), "n")

    return (
        count1(big.union(recent).distinct(), "union")
        .unionByName(count1(big.intersect(recent), "intersect"))
        .unionByName(count1(big.exceptAll(recent).distinct(), "except"))
    )


@query(
    "tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           (floor((CAST(sum(CAST(floor(l.l_extendedprice
                                       * (1 - l.l_discount) * 1e4 + 0.5)
                               AS BIGINT)) AS DOUBLE) / 1e4) * 1e2 + 0.5)
            / 1e2)             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate  > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): selective dimension filter →
    fact join → revenue aggregation → top-10. The canonical
    filter-join-agg-topk composition; revenue summed in exact 1e-4
    fixed point so ordering ties are engine-independent.

    Plan shape at scale: customer filter broadcasts into orders, that
    result (still small relative to lineitem) joins the fact table on
    l_orderkey; the top-10 is TakeOrderedAndProject — no global sort.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e4 + F.lit(0.5)
    ).cast("long")
    return (
        li.join(o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(pround(F.sum(rev4).cast("double") / 1e4, 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT (floor((CAST(sum(CAST(floor(l_extendedprice * l_discount * 1e4 + 0.5)
                              AS BIGINT)) AS DOUBLE) / 1e4) * 1e2 + 0.5) / 1e2)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate <  DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure filter + global
    aggregate — the query whose entire cost is the scan, so its plan
    must show every predicate in PushedFilters and a two-column
    ReadSchema... which Catalyst does automatically from this
    declarative form. Revenue in exact 1e-4 fixed point.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev4 = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * 1e4 + F.lit(0.5)
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            pround(F.sum(rev4).cast("double") / 1e4, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(floor(l_quantity * 1e2 + 0.5) AS BIGINT)) > 30000
    )
    SELECT c.c_name, o.o_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           (floor((CAST(sum(CAST(floor(l.l_quantity * 1e2 + 0.5) AS BIGINT))
                   AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): HAVING-filtered aggregate as
    a semi-join filter on the fact table, then re-aggregation and
    top-20. The `big` keys are a tiny set, so the IN becomes a
    broadcast semi-join — the fact table is scanned twice but shuffled
    only on the pre-filtered keys (exact-cents HAVING threshold keeps
    both engines' row sets identical).
    """
    li = load_table(spark, sf_dir, "lineitem")
    qc = cents(F.col("l_quantity"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qc).alias("sq"))
        .filter(F.col("sq") > 30000)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_custkey", "o_orderkey", "o_orderdate")
        .agg(pround(F.sum(qc).cast("double") / 100.0, 2).alias("total_qty"))
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT (floor((100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5)
                      AS BIGINT) ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1e4 + 0.5)
                             AS BIGINT)) AS DOUBLE)) * 1e6 + 0.5) / 1e6)
             AS promo_share_pct,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1995-09-01'
      AND l.l_shipdate <  DATE '1995-10-01'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional aggregation — the
    CASE-inside-SUM shape that computes a ratio of two aggregates in
    ONE pass (never two scans + a join). Part is broadcast; revenue in
    exact 1e-4 fixed point so the ratio's operands are integers.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01")
        & (F.col("l_shipdate") < "1995-10-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev4 = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e4 + F.lit(0.5)
    ).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", rev4).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            pround(
                100.0 * F.sum(promo).cast("double") / F.sum(rev4).cast("double"),
                6,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_lateral_topk",
    oracle=f"""
    SELECT c.c_custkey, o.o_orderkey, o.vc
    FROM customer c, LATERAL (
      SELECT o_orderkey, {sql_cents('o_totalprice')} AS vc
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY vc DESC, o_orderkey
      LIMIT 2
    ) o
    WHERE c.c_custkey % 10 = 0
    """,
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — each customer's top-2 orders by
    value, written the way an analyst writes it (per-row dependent
    subquery with ORDER BY + LIMIT) rather than the window
    formulation. Catalyst decorrelates the lateral into a join +
    per-key limit, so the declarative form costs the same as
    window_rank's rank()<=k — this key pins that the decorrelation
    path exists and stays value-correct.

    Scale shape: after decorrelation the plan is one shuffle on the
    correlation key with a per-group top-k — no per-customer query
    execution, which is what LATERAL naively implies and what a
    100 TB plan must never do.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "v_lat_customer"
    )
    load_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey", "o_orderkey", f"{sql_cents('o_totalprice')} AS vc"
    ).createOrReplaceTempView("v_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.vc
        FROM v_lat_customer c, LATERAL (
          SELECT o_orderkey, vc
          FROM v_lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY vc DESC, o_orderkey
          LIMIT 2
        ) o
        WHERE c.c_custkey % 10 = 0
        """
    )


# ---------------------------------------------------------------------------
# as-of join with tolerance + direction (the pandas merge_asof contract)
# ---------------------------------------------------------------------------

ASOF_TOL_US = 3_600_000_000  #: 1 hour tolerance


@query(
    "join_asof_tolerance",
    oracle=f"""
    WITH ev AS (
      SELECT * FROM events WHERE event_type IN ('purchase', 'click')
    ),
    wb AS (
      SELECT *,
        last_value(CASE WHEN event_type = 'click' THEN event_id END
                   IGNORE NULLS) OVER back AS b_id,
        last_value(CASE WHEN event_type = 'click' THEN ts END
                   IGNORE NULLS) OVER back AS b_ts,
        first_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS) OVER fwd AS f_id,
        first_value(CASE WHEN event_type = 'click' THEN ts END
                    IGNORE NULLS) OVER fwd AS f_ts
      FROM ev
      WINDOW
        back AS (PARTITION BY user_id
                 ORDER BY ts, CAST(event_type = 'click' AS INT) DESC,
                          event_id
                 ROWS UNBOUNDED PRECEDING),
        fwd AS (PARTITION BY user_id
                ORDER BY ts, CAST(event_type = 'click' AS INT) ASC,
                         event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    g AS (
      SELECT event_id AS purchase_id, user_id,
             b_id, f_id,
             epoch_us(ts) - epoch_us(b_ts) AS gb,
             epoch_us(f_ts) - epoch_us(ts) AS gf
      FROM wb WHERE event_type = 'purchase'
    )
    SELECT purchase_id, user_id,
           CASE WHEN b_id IS NOT NULL AND gb <= {ASOF_TOL_US}
                     AND (f_id IS NULL OR gf > {ASOF_TOL_US} OR gb <= gf)
                THEN b_id ELSE f_id END AS click_id,
           CASE WHEN b_id IS NOT NULL AND gb <= {ASOF_TOL_US}
                     AND (f_id IS NULL OR gf > {ASOF_TOL_US} OR gb <= gf)
                THEN 'backward' ELSE 'forward' END AS direction,
           CASE WHEN b_id IS NOT NULL AND gb <= {ASOF_TOL_US}
                     AND (f_id IS NULL OR gf > {ASOF_TOL_US} OR gb <= gf)
                THEN gb ELSE gf END AS gap_us
    FROM g
    WHERE (b_id IS NOT NULL AND gb <= {ASOF_TOL_US})
       OR (f_id IS NOT NULL AND gf <= {ASOF_TOL_US})
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with the full pandas `merge_asof` contract —
    direction='nearest' + tolerance: each purchase matches the CLOSEST
    click within ±1 hour, in either direction, ties preferring
    backward (pandas' rule). `join_asof` covers plain backward; real
    feature pipelines (sensor alignment, price snapping, attribution
    windows) need the bounded-staleness nearest form, and an
    out-of-tolerance purchase must drop rather than silently match a
    stale click.

    Spark-first shape, no nested loop: the tagged union gets TWO
    ignore-nulls windows over one user_id shuffle — last click at-or-
    before (unbounded-preceding frame, clicks ordered before purchases
    at equal ts so a same-instant click is backward with gap 0) and
    first click at-or-after (current-row→unbounded-following frame,
    purchases first at equal ts) — then a per-row CASE picks the
    nearer in-tolerance candidate. Cost: one exchange + two sorts,
    linear at any scale; DuckDB's ASOF JOIN cannot express
    nearest/tolerance, so the oracle is the identical window algebra.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    is_click = F.col("event_type") == "click"
    back = W.partitionBy("user_id").orderBy(
        F.col("ts"), is_click.cast("int").desc(), F.col("event_id")
    ).rowsBetween(W.unboundedPreceding, 0)
    fwd = W.partitionBy("user_id").orderBy(
        F.col("ts"), is_click.cast("int").asc(), F.col("event_id")
    ).rowsBetween(0, W.unboundedFollowing)
    click_id = F.when(is_click, F.col("event_id"))
    click_ts = F.when(is_click, F.col("ts"))
    g = (
        ev.withColumn("b_id", F.last(click_id, ignorenulls=True).over(back))
        .withColumn("b_ts", F.last(click_ts, ignorenulls=True).over(back))
        .withColumn("f_id", F.first(click_id, ignorenulls=True).over(fwd))
        .withColumn("f_ts", F.first(click_ts, ignorenulls=True).over(fwd))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "b_id",
            "f_id",
            (F.unix_micros("ts") - F.unix_micros("b_ts")).alias("gb"),
            (F.unix_micros("f_ts") - F.unix_micros("ts")).alias("gf"),
        )
    )
    tol = F.lit(ASOF_TOL_US)
    valid_b = F.col("b_id").isNotNull() & (F.col("gb") <= tol)
    valid_f = F.col("f_id").isNotNull() & (F.col("gf") <= tol)
    take_b = valid_b & (
        F.col("f_id").isNull() | (F.col("gf") > tol) | (F.col("gb") <= F.col("gf"))
    )
    return g.filter(valid_b | valid_f).select(
        "purchase_id",
        "user_id",
        F.when(take_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "click_id"
        ),
        F.when(take_b, "backward").otherwise("forward").alias("direction"),
        F.when(take_b, F.col("gb")).otherwise(F.col("gf")).alias("gap_us"),
    )

"""Incremental / dataset-maintenance operators: materialized-view
delta merge, deterministic stratified sampling, and wide→long unpivot.

These are the maintenance jobs that run *around* a corpus the
reference's writer lands (`KafkaProtoParquetWriter.java:362-380` date
directories): refreshing rollups as new partitions arrive, drawing
reproducible per-source samples for eval sets, and reshaping metric
tables. All are fully value-oracled.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import (
    cents,
    pround,
    sql_cents,
    sql_pround,
)
from kafka_parquet_writer_spark.functions.texthash import (
    portable_hash64,
    sql_portable_hash64,
)
from kafka_parquet_writer_spark.registry import query

#: snapshot/delta split point for the incremental-aggregate demo.
MV_SPLIT_DATE = "1999-01-01"


@query(
    "agg_incremental",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           {sql_pround(f"sum({sql_cents('o_totalprice')}) / 100.0", 2)}
             AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: merge a pre-computed
    snapshot aggregate (orders before MV_SPLIT_DATE) with a delta
    aggregate (orders on/after it) and prove the merge equals a full
    recompute — the oracle aggregates the whole table in one pass.

    Scale shape: this is THE pattern for keeping a 100 TB rollup fresh
    — re-aggregate only the new date partitions (partition pruning
    makes the delta scan proportional to the delta, `tests/
    test_partition_pruning.py`) and merge mergeable partials
    (count/sum here; any algebraic aggregate works). The merge itself
    shuffles only pre-aggregated rows: |groups|, not |orders|. The
    union→re-agg is exactly Spark's own partial/final agg split,
    expressed across time instead of across tasks.
    """
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(MV_SPLIT_DATE).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents(F.col("o_totalprice"))).alias("tc"),
        )

    snapshot = partial(orders.filter(F.col("o_orderdate") < split))
    delta = partial(orders.filter(F.col("o_orderdate") >= split))
    merged = (
        snapshot.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n_orders"), F.sum("tc").alias("tc"))
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        pround(F.col("tc") / 100.0, 2).alias("revenue"),
    )


def _strat_rates(seed: int = 7) -> list[tuple[str, int]]:
    """Seeded per-source sampling rates (percent), embedded as literals
    in BOTH the Spark plan and the oracle SQL (seeded-literal rule)."""
    rng = np.random.RandomState(seed)
    return [(f"src{i}", int(rng.randint(5, 61))) for i in range(20)]


_STRAT_SALT = "strat42:"


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, source, bucket
    FROM (
      SELECT doc_id, source,
             {sql_portable_hash64(
                 f"'{_STRAT_SALT}' || CAST(doc_id AS VARCHAR)")} % 100
               AS bucket
      FROM documents
    )
    JOIN (VALUES {", ".join(f"('{s}', {r})" for s, r in _strat_rates())})
      AS rates(source, rate_pct) USING (source)
    WHERE bucket < rate_pct
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: each source stratum keeps a
    different seeded percentage of documents, selected by a portable
    salted hash of the key — NOT `df.sample`, whose output depends on
    partitioning and is irreproducible across engines and reruns.

    Scale shape: the filter is a stateless per-row expression — no
    shuffle, no state, trivially parallel, and pushed beneath
    everything downstream. Hash-based sampling is also *stable under
    growth*: re-running on an appended corpus keeps every previously
    sampled doc_id (bucket is a pure function of the key), which is
    what makes eval-set draws reproducible as the corpus evolves. The
    rates table is broadcast (20 rows).
    """
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(_strat_rates(), "source string, rate_pct int")
    bucket = (
        portable_hash64(
            F.concat(F.lit(_STRAT_SALT), F.col("doc_id").cast("string"))
        )
        % 100
    )
    return (
        docs.select("doc_id", "source", bucket.alias("bucket"))
        .join(F.broadcast(rates), "source")
        .filter(F.col("bucket") < F.col("rate_pct"))
        .select("doc_id", "source", "bucket")
    )


@query(
    "unpivot_long",
    oracle=f"""
    WITH w AS (
      SELECT l_returnflag,
             CAST(sum({sql_cents('l_quantity')})      AS BIGINT) AS qty_c,
             CAST(sum({sql_cents('l_extendedprice')}) AS BIGINT) AS price_c,
             CAST(sum({sql_cents('l_discount')})      AS BIGINT) AS disc_c
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_c'   AS measure, qty_c   AS amount FROM w
    UNION ALL
    SELECT l_returnflag, 'price_c' AS measure, price_c AS amount FROM w
    UNION ALL
    SELECT l_returnflag, 'disc_c'  AS measure, disc_c  AS amount FROM w
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt): aggregate three measures per return
    flag, then unpivot to one (flag, measure, amount) row per cell —
    the inverse of pivot_wide (operators/analytics.py).

    Scale shape: `unpivot` is a zero-shuffle Expand (×3 row
    multiplication after the aggregate, so it multiplies |groups| not
    |lineitem|). Melting BEFORE aggregating would 3× the shuffle; the
    aggregate-then-melt order here is the one that survives scale-up.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(cents(F.col("l_quantity"))).alias("qty_c"),
        F.sum(cents(F.col("l_extendedprice"))).alias("price_c"),
        F.sum(cents(F.col("l_discount"))).alias("disc_c"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_c", "price_c", "disc_c"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


#: "new customer" split for the join-IVM demo (both join sides change)
IVM_CUST_SPLIT = 1000


@query(
    "join_incremental",
    oracle=f"""
    SELECT c_nationkey,
           count(*) AS n_orders,
           {sql_pround(f"sum({sql_cents('o_totalprice')}) / 100.0", 2)}
             AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: both sides change
    (orders gain rows after MV_SPLIT_DATE, customers gain keys ≥
    {IVM_CUST_SPLIT}), and the view refreshes from the delta algebra
      Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB
    merged over the old view A₀⋈B₀ — proven equal to a full recompute
    (the oracle joins and aggregates the whole tables in one pass).

    Scale shape: the three delta joins are each delta-proportional —
    ΔA prunes to new date partitions before its join (partition
    pruning, not a full scan), ΔB is a small broadcast side, and
    ΔA⋈ΔB is tiny×tiny. The old-view term is the already-materialized
    aggregate (|groups| rows, re-aggregated as mergeable partials like
    `agg_incremental`). Nothing re-joins the 100 TB history.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    date_split = F.lit(MV_SPLIT_DATE).cast("timestamp")
    a0 = orders.filter(F.col("o_orderdate") < date_split)
    da = orders.filter(F.col("o_orderdate") >= date_split)
    b0 = cust.filter(F.col("c_custkey") < IVM_CUST_SPLIT)
    db = cust.filter(F.col("c_custkey") >= IVM_CUST_SPLIT)

    def partial(o: DataFrame, c: DataFrame) -> DataFrame:
        return (
            o.select("o_custkey", cents(F.col("o_totalprice")).alias("tc"))
            .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("tc").alias("tc"))
        )

    merged = (
        partial(a0, b0)       # the materialized old view's partials
        .unionByName(partial(da, b0))   # ΔA ⋈ B₀
        .unionByName(partial(a0, db))   # A₀ ⋈ ΔB
        .unionByName(partial(da, db))   # ΔA ⋈ ΔB
        .groupBy("c_nationkey")
        .agg(F.sum("n").alias("n_orders"), F.sum("tc").alias("tc"))
    )
    return merged.select(
        "c_nationkey",
        "n_orders",
        pround(F.col("tc") / 100.0, 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# snapshot diff (CDC extraction between two table versions)
# ---------------------------------------------------------------------------

#: deterministic derivation of two "versions" of orders from the fixture:
#: rows missing from the OLD snapshot (arrived later), rows missing from
#: the NEW one (deleted), and a price bump marking updated rows
DIFF_OLD_SKIP_MOD = 11   # o_orderkey % 11 == 0 → absent from old
DIFF_NEW_SKIP_MOD = 13   # o_orderkey % 13 == 0 → absent from new
DIFF_BUMP_MOD = 5        # o_orderkey % 5  == 0 → price +10% in new


@query(
    "snapshot_diff",
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey, {sql_cents('o_totalprice')} AS vc
      FROM orders WHERE o_orderkey % {DIFF_OLD_SKIP_MOD} <> 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % {DIFF_BUMP_MOD} = 0
                  THEN {sql_cents('o_totalprice')} * 110 // 100
                  ELSE {sql_cents('o_totalprice')} END AS vc
      FROM orders WHERE o_orderkey % {DIFF_NEW_SKIP_MOD} <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change,
           o.vc AS old_vc,
           n.vc AS new_vc
    FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.vc <> n.vc
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture extraction between two snapshots of a table:
    full-outer join on the primary key, classify each divergence as
    insert / delete / update, drop unchanged rows — the diff feed that
    turns periodic full snapshots into an incremental downstream (the
    consumer-side inverse of tablefmt.merge). Snapshots are derived
    deterministically from the fixture (modular row skips + an integer
    price bump) so both engines diff identical inputs.

    Scale shape: ONE shuffle join on the key — the irreducible cost of
    diffing unordered snapshots; unchanged rows (the overwhelming
    majority at 100 TB) are filtered before projection, so the output
    is change-sized, not table-sized. With both snapshots bucketed on
    the key (sources/bucketed.py) the exchange disappears entirely;
    cents fixed-point keeps the update test exact.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("vc")
    )
    old = o.filter(F.col("o_orderkey") % DIFF_OLD_SKIP_MOD != 0).select(
        F.col("o_orderkey").alias("ok"), F.col("vc").alias("old_vc")
    )
    new = o.filter(F.col("o_orderkey") % DIFF_NEW_SKIP_MOD != 0).select(
        F.col("o_orderkey").alias("nk"),
        F.when(
            F.col("o_orderkey") % DIFF_BUMP_MOD == 0,
            F.expr("vc * 110 div 100"),
        )
        .otherwise(F.col("vc"))
        .alias("new_vc"),
    )
    joined = old.join(new, F.col("ok") == F.col("nk"), "full_outer")
    return (
        joined.filter(
            F.col("ok").isNull()
            | F.col("nk").isNull()
            | (F.col("old_vc") != F.col("new_vc"))
        )
        .select(
            F.coalesce(F.col("ok"), F.col("nk")).alias("o_orderkey"),
            F.when(F.col("ok").isNull(), "insert")
            .when(F.col("nk").isNull(), "delete")
            .otherwise("update")
            .alias("change"),
            "old_vc",
            "new_vc",
        )
    )

"""Skew mitigation: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one viral document, one默认 user id,
one null-ish sentinel) can put an entire shuffle partition on one
executor. Two standard counters, both expressed declaratively so
Catalyst still owns the physical plan:

- **Salted two-stage aggregation**: groupBy(key, salt) partial →
  groupBy(key) merge. Spark's hash aggregation already does map-side
  partial combine, which absorbs most agg skew; explicit salting is the
  stronger form for when hot-key partials still dominate a reducer
  (e.g. collect_list/percentile-style measures that don't combine, or
  extreme key concentration). The salt is deterministic (hash of a
  high-cardinality sibling column) so results are reproducible.
- **Salted join**: salt the large side into B sub-keys, replicate the
  small side B× (explode over sequence(0, B-1)), join on (key, salt) —
  a hot key's rows spread over B reducers instead of one. AQE's
  skew-join splitting handles moderate skew automatically; explicit
  salting is for the pathological tail and for engines/planners where
  the skew isn't known until runtime.

The reference processes records one-at-a-time per thread and never
shuffles, so skew cannot arise there (KafkaProtoParquetWriter.java:260
poll loop) — this is engine-side scale armor. Both declared queries are
salt-invariant by construction, so the DuckDB oracle is the plain
unsalted SQL and verifies that salting does not change results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import cents, pround
from kafka_parquet_writer_spark.registry import query

DEFAULT_SALT_BUCKETS = 32


def with_salt(df: DataFrame, from_col: str | Column, buckets: int) -> DataFrame:
    """Add a deterministic `_salt` column in [0, buckets) derived from a
    high-cardinality column (NOT the group key — salting the key by
    itself would be a no-op)."""
    c = F.col(from_col) if isinstance(from_col, str) else from_col
    return df.withColumn("_salt", F.pmod(F.xxhash64(c), F.lit(buckets)))


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    salt_from: str,
    measures: list[tuple[str, Column, str]],
    buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``measures`` is [(alias, expr, kind)] with kind ∈ {sum, count, min,
    max} — the re-aggregable measures (count merges with sum). Stage 1
    aggregates (keys + salt); stage 2 merges partials per key.
    """
    partial_aggs, merge_aggs = [], []
    for alias, expr, kind in measures:
        if kind == "count":
            partial_aggs.append(F.count(expr).alias(alias))
            merge_aggs.append(F.sum(alias).alias(alias))
        elif kind == "sum":
            partial_aggs.append(F.sum(expr).alias(alias))
            merge_aggs.append(F.sum(alias).alias(alias))
        elif kind in ("min", "max"):
            fn = F.min if kind == "min" else F.max
            partial_aggs.append(fn(expr).alias(alias))
            merge_aggs.append(fn(alias).alias(alias))
        else:
            raise ValueError(f"non-re-aggregable measure kind {kind!r}")
    partial = (
        with_salt(df, salt_from, buckets)
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str | Column,
    buckets: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side
    replicated ``buckets``×. Join keys become (on, _salt), spreading
    each hot key across ``buckets`` reducers. Result is identical to
    the unsalted join for any 1-row-per-key small side.

    ``how`` is restricted to inner/left/left_semi/left_anti: the small
    side is replicated, so right/full outer would emit each unmatched
    small-side key ``buckets``× (duplicate null-extended rows). Salt
    the OTHER side (swap the arguments) for a right-skewed outer join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; got {how!r} — "
            "right/full would duplicate unmatched replicated small-side rows"
        )
    l = with_salt(large, salt_from, buckets)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return l.join(s, [on, "_salt"], how).drop("_salt")


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           (floor((sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) / 100.0)
                  * 1e4 + 0.5) / 1e4) AS sum_value,
           (floor((min(value)) * 1e4 + 0.5) / 1e4) AS min_value,
           (floor((max(value)) * 1e4 + 0.5) / 1e4) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over a deliberately hot key (event_type has only a
    handful of values over the whole table) via salted two-stage
    aggregation. Oracle is the plain GROUP BY — proving salt-invariance.
    """
    ev = load_table(spark, sf_dir, "events")
    out = salted_group_agg(
        ev,
        keys=["event_type"],
        salt_from="event_id",
        measures=[
            ("n", F.lit(1), "count"),
            ("sum_cents", cents(F.col("value")), "sum"),
            ("min_value", F.col("value"), "min"),
            ("max_value", F.col("value"), "max"),
        ],
    )
    return out.select(
        "event_type",
        "n",
        pround(F.col("sum_cents") / 100.0, 4).alias("sum_value"),
        pround(F.col("min_value"), 4).alias("min_value"),
        pround(F.col("max_value"), 4).alias("max_value"),
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_lines,
           (floor((sum(CAST(floor(l.l_extendedprice * 1e2 + 0.5) AS BIGINT))
                   / 100.0) * 1e2 + 0.5) / 1e2) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ supplier with the fact side salted 32 ways and the
    supplier side replicated — the shuffle-join skew pattern — then
    revenue by supplier nation. A merge-join hint forces the shuffle
    path (a broadcast join would hide the salt's effect). Oracle is the
    plain unsalted join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    joined = salted_join(
        li, sup.hint("merge"), on="l_suppkey", salt_from="l_orderkey"
    )
    return (
        joined.join(F.broadcast(nat), "s_nationkey")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(cents(F.col("l_extendedprice"))).alias("rev_cents"),
        )
        .select(
            "n_name",
            "n_lines",
            pround(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        )
    )

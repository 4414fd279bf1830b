"""Bucketed co-located joins: pre-bucketing both sides of a recurring
join key eliminates the join shuffle entirely — the 100 TB pattern for
fact⋈fact joins that run every day on the same key.

The reference writes plain directories (no table metadata, no
bucketing); this is one of the capabilities the Spark-native engine
adds. Asserts the physical property, not just the result: the bucketed
join plans ZERO shuffle exchanges, the unbucketed control plans two.
"""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.plans import count_exchanges

N_BUCKETS = 4


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    return "b_orders", "b_lineitem"


def _join(spark, left_name_or_df, right_name_or_df):
    l = (
        spark.table(left_name_or_df)
        if isinstance(left_name_or_df, str)
        else left_name_or_df
    )
    r = (
        spark.table(right_name_or_df)
        if isinstance(right_name_or_df, str)
        else right_name_or_df
    )
    return l.join(r, l["o_orderkey"] == r["l_orderkey"]).select(
        "o_orderkey", "l_quantity", "o_totalprice"
    )


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = _join(spark, b_orders, b_lineitem)
        assert count_exchanges(bucketed) == 0  # co-located: no shuffle

        plain = _join(
            spark,
            load_table(spark, SF_SMOKE, "orders"),
            load_table(spark, SF_SMOKE, "lineitem"),
        )
        assert count_exchanges(plain) == 2  # control: both sides shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_matches_plain_results(spark, bucketed_tables):
    b_orders, b_lineitem = bucketed_tables
    bucketed = _join(spark, b_orders, b_lineitem)
    plain = _join(
        spark,
        load_table(spark, SF_SMOKE, "orders"),
        load_table(spark, SF_SMOKE, "lineitem"),
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


# --- library API (sources/bucketed.py): write_bucketed / smb_join ----

from kafka_parquet_writer_spark.sources.bucketed import (
    bucket_spec,
    smb_join,
    suggest_bucket_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def api_bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "api_orders", "o_orderkey", N_BUCKETS)
    write_bucketed(lineitem, "api_lineitem", "l_orderkey", N_BUCKETS)
    write_bucketed(orders, "api_orders_8", "o_orderkey", 2 * N_BUCKETS)
    orders.write.mode("overwrite").saveAsTable("api_orders_flat")
    return "api_orders", "api_lineitem"


def test_smb_join_shuffle_free_and_correct(spark, api_bucketed_tables):
    left, right = api_bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = smb_join(spark, left, right, "o_orderkey", "l_orderkey").select(
            "o_orderkey", "l_quantity", "o_totalprice"
        )
        assert count_exchanges(j) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    plain = _join(
        spark,
        load_table(spark, SF_SMOKE, "orders"),
        load_table(spark, SF_SMOKE, "lineitem"),
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))


def test_smb_join_refuses_incompatible_layouts(spark, api_bucketed_tables):
    left, right = api_bucketed_tables
    with pytest.raises(ValueError, match="not bucketed"):
        smb_join(spark, "api_orders_flat", right, "o_orderkey", "l_orderkey")
    with pytest.raises(ValueError, match="bucket counts differ"):
        smb_join(spark, "api_orders_8", right, "o_orderkey", "l_orderkey")
    with pytest.raises(ValueError, match="bucketed on"):
        smb_join(spark, left, right, "o_custkey", "l_orderkey")


def test_bucket_spec_reads_catalog(spark, api_bucketed_tables):
    left, _ = api_bucketed_tables
    assert bucket_spec(spark, left) == (["o_orderkey"], N_BUCKETS)
    assert bucket_spec(spark, "api_orders_flat") is None


def test_suggest_bucket_count_power_of_two(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    # tiny target forces multiple buckets; count must be a power of two
    n = suggest_bucket_count(li, target_bucket_bytes=64 << 10)
    assert n >= 2 and (n & (n - 1)) == 0
    # huge target collapses to a single bucket
    assert suggest_bucket_count(li, target_bucket_bytes=1 << 40) == 1


def test_snapshot_diff_bucketed_no_exchange(spark, bucketed_tables):
    """snapshot_diff's docstring claim, proven: with both snapshots
    derived from a table bucketed on the diff key, the full-outer
    join's exchange disappears — a daily 100 TB snapshot diff becomes
    shuffle-free when snapshots land bucketed."""
    from kafka_parquet_writer_spark.operators.incremental import (
        DIFF_BUMP_MOD,
        DIFF_NEW_SKIP_MOD,
        DIFF_OLD_SKIP_MOD,
    )

    b_orders, _ = bucketed_tables
    o = spark.table(b_orders).select(
        "o_orderkey", (F.col("o_totalprice") * 100).cast("long").alias("vc")
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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        diff = old.join(new, F.col("ok") == F.col("nk"), "full_outer").filter(
            F.col("ok").isNull()
            | F.col("nk").isNull()
            | (F.col("old_vc") != F.col("new_vc"))
        )
        assert count_exchanges(diff) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")

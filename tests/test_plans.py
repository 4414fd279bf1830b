"""Physical-plan regression gates: the plans we ship are the plans we
want at 100 TB — filters pushed to the scan, projections pruned,
dimensions broadcast, top-k never a global sort."""

import __spark_entry__ as E
from kafka_parquet_writer_spark.plans import (
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
)


def test_scan_project_prunes_columns(spark, sf_dir):
    df = E.queries()["scan_project"](spark, sf_dir)
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"}


def test_filter_pred_pushdown(spark, sf_dir):
    df = E.queries()["filter_pred"](spark, sf_dir)
    assert has_pushed_filters(df, "l_quantity", "l_returnflag", "l_shipdate")


def test_agg_hash_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(E.queries()["agg_hash"](spark, sf_dir))
    # two-phase agg: partial_ functions before the exchange
    assert "partial_" in plan or "HashAggregate" in plan
    assert "PushedFilters" in plan


def test_join_multiway_broadcasts_dims(spark, sf_dir):
    df = E.queries()["join_multiway"](spark, sf_dir)
    assert uses_broadcast_join(df)


def test_topk_never_global_sort(spark, sf_dir):
    plan = formatted_plan(E.queries()["sort_limit_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_window_not_nested_loop(spark, sf_dir):
    plan = formatted_plan(E.queries()["join_asof"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan

"""Physical-plan inspection helpers (pushdown / broadcast assertions)."""

from kafka_parquet_writer_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    has_pushed_filters,
    read_schema_columns,
    uses_broadcast_join,
    count_exchanges,
)

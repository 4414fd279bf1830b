"""Batch source readers: parquet / CSV / JSON-lines with an explicit
schema discipline.

The reference reads exactly one source (Kafka, byte values —
`KafkaProtoParquetWriter.java:156-166`); at-rest data is parquet of its
own making. An engine that replaces it must also read the sidecar
formats real pipelines exchange. Rules encoded here, all scale-driven:

- **Schema is explicit for text formats.** CSV/JSON inference scans the
  data once before the real job (a full extra pass at 100 TB) and can
  drift between runs; readers here require a schema (or take the
  documented single-pass inference hit only when asked).
- **Malformed rows are data, not crashes.** PERMISSIVE mode +
  `_corrupt_record` column mirrors the decoders' DLQ stance
  (sources/decoders.py) — the reference crashes its worker on the first
  bad record (`:272-277`).
- **Timestamps parse in UTC** to match the engine session default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType | str) -> StructType:
    from pyspark.sql.types import StringType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if any(f.name == CORRUPT_COL for f in schema.fields):
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """CSV with explicit schema (or opt-in inference). Malformed rows
    land in ``_corrupt_record`` instead of failing the job."""
    if schema is None and not infer:
        raise ValueError(
            "read_csv requires a schema (or infer=True to accept a full "
            "extra pass over the data)"
        )
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(_with_corrupt_field(schema))
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """JSON-lines with explicit schema (or opt-in inference); malformed
    lines land in ``_corrupt_record``."""
    if schema is None and not infer:
        raise ValueError(
            "read_json requires a schema (or infer=True to accept a full "
            "extra pass over the data)"
        )
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(_with_corrupt_field(schema))
    return reader.json(path)


def corrupt_records(df: DataFrame) -> DataFrame:
    """The DLQ view: rows that failed to parse.

    NOTE: Spark's text scanners re-parse only the referenced columns per
    query, so a filter touching only ``_corrupt_record`` can observe
    nulls. Materialize the parsed frame first (``df.cache()`` for small
    batches; write-then-read for large ones) before splitting it into
    the valid/corrupt views."""
    from pyspark.sql import functions as F

    if CORRUPT_COL not in df.columns:
        return df.limit(0)
    return df.filter(F.col(CORRUPT_COL).isNotNull())


def valid_records(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    if CORRUPT_COL not in df.columns:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

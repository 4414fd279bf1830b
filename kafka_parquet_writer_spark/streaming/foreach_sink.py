"""foreachBatch sinks: streaming writes with semantics the plain file
sink cannot express.

The built-in parquet sink is append-only (matching the reference, which
only ever appends records to rolling files). Real pipelines also need
*keyed upsert* — late corrections, CDC feeds, dimension refreshes.
``start_upsert_stream`` runs each micro-batch through the batch
merge-by-key utility (streaming/maintenance.upsert_parquet) and
atomically swaps a `current` symlink to the new version — a poor man's
table format: readers always see a complete consistent snapshot, and
the swap is the same invisible-until-committed discipline the reference
implements with tmp+rename (KafkaProtoParquetWriter.java:236-241).

Versions accumulate under ``<dir>/v<epoch>``; pruning old versions is
the caller's retention policy (or compaction's, at scale a real table
format — Delta/Iceberg/Hudi — owns this, and this module is the
dependency-free stand-in with the same interface shape).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from kafka_parquet_writer_spark.streaming.maintenance import upsert_parquet

CURRENT_LINK = "current"


def current_version_dir(table_dir: str) -> str | None:
    link = os.path.join(table_dir, CURRENT_LINK)
    return os.path.realpath(link) if os.path.islink(link) else None


def read_current(spark: SparkSession, table_dir: str) -> DataFrame:
    cur = current_version_dir(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no current version under {table_dir}")
    return spark.read.parquet(cur)


def _swap_current(table_dir: str, version_dir: str) -> None:
    """Atomic pointer swap: symlink rename is atomic on POSIX."""
    link = os.path.join(table_dir, CURRENT_LINK)
    tmp = link + ".tmp"
    if os.path.lexists(tmp):
        os.unlink(tmp)
    os.symlink(version_dir, tmp)
    os.replace(tmp, link)


def start_upsert_stream(
    stream_df: DataFrame,
    table_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    order_col: str | None = None,
    available_now: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Stream → keyed-upsert table. Each micro-batch merges into the
    current version and publishes a new one; failures never corrupt the
    published snapshot (the swap happens only after a complete write).

    Batch replays after a crash re-merge idempotently: upsert by key is
    a set-union where updates win, so re-applying a batch yields the
    same table — the property that upgrades the checkpoint's
    at-least-once batch delivery to effectively-once table state.
    """
    os.makedirs(table_dir, exist_ok=True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = current_version_dir(table_dir)
        version = os.path.join(table_dir, f"v{batch_id}")
        # Replay guard: a crash AFTER _swap_current but BEFORE the
        # checkpoint commit re-delivers this batch with cur already
        # pointing at v{batch_id}. Re-merging would read from and
        # overwrite the same directory (Spark refuses, wedging the
        # stream forever); the batch's effects are already published,
        # so the idempotent replay is a no-op.
        if cur is not None and cur == os.path.realpath(version):
            return
        upsert_parquet(
            spark, cur, batch_df, keys=keys, dst_dir=version, order_col=order_col
        )
        _swap_current(table_dir, version)

    writer = stream_df.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()

"""Streaming ETL layer — the reference-faithful surface.

`ingest` maps sahabpardaz/kafka-parquet-writer's pipeline
(Kafka → proto decode → rotating time-partitioned Parquet,
`KafkaProtoParquetWriter.java`) onto Structured Streaming;
`windows` adds the event-time capabilities the reference lacks.
"""

from kafka_parquet_writer_spark.streaming.ingest import (  # noqa: F401
    IngestConfig,
    IngestMetrics,
    build_pipeline,
    ingest_once,
    start_ingest,
)

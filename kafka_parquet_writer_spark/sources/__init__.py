"""Sources & decoders: Kafka reader options, file sources, and the
binary-value decoders that mirror the reference's proto parse step."""

from kafka_parquet_writer_spark.sources.decoders import (  # noqa: F401
    json_decoder,
    proto_decoder,
    wire_format_decoder,
)

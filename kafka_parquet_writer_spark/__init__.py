"""kafka_parquet_writer_spark — a PySpark-native analytics + streaming-ETL engine.

Re-expresses the capabilities of sahabpardaz/kafka-parquet-writer
(reference: /root/reference, a Kafka→Parquet streaming ETL library,
`KafkaProtoParquetWriter.java` + `ParquetFile.java`) on top of Apache Spark:

- **Streaming ETL layer** (`streaming/`): Kafka (or file) source → decode →
  time-partitioned Parquet sink with rotation semantics, mapped onto
  Structured Streaming (exactly-once file sink vs the reference's
  at-least-once ack-after-flush — strictly stronger).
- **Query layer** (`operators/`): the declared query inventory of SURVEY.md §2B
  — scans, filters, aggregations, joins (incl. as-of), windows, set ops,
  scalar function families — plus the LLM-data-pipeline operators
  (dedup exact/MinHash-LSH/SimHash/embedding, similarity search,
  text analysis, multimodal columns), every operator designed for
  100 TB scale (broadcast small dims, no driver collects, LSH instead of
  cross products, partial aggregation).

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join selection, and AQE re-planning.
"""

from kafka_parquet_writer_spark.session import get_spark
from kafka_parquet_writer_spark.catalog import TABLES, load_table, register_views
from kafka_parquet_writer_spark.registry import QUERIES, ORACLES

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "QUERIES",
    "ORACLES",
]

__version__ = "0.1.0"

"""Operator modules. Importing this package registers every declared
query (SURVEY.md §2B) into kafka_parquet_writer_spark.registry."""

from kafka_parquet_writer_spark.operators import (  # noqa: F401
    relational,
    analytics,
    scalar,
    tpch,
    dedup,
    similarity,
    text,
    multimodal,
    udfs,
    etl_batch,
    streaming_queries,
    skew,
    pipeline,
    timeseries,
    incremental,
    graph,
    corpus_prep,
    llm_prep,
    mlfeat,
    formats,
    governance,
    web_curation,
    table_queries,
    geo,
)

"""User-defined function surface: scalar pandas UDF, grouped-map UDAF
(applyInPandas), and a UDTF-shaped table function (mapInPandas).

Rules of engagement at scale (why each exists):
- scalar pandas UDF: Arrow-batched, ~10-100× over row-at-a-time Python;
  still slower than built-ins — use only for logic Catalyst can't express.
- applyInPandas: whole group materializes in one pandas frame — bound
  group sizes or pre-aggregate.
- mapInPandas: streaming per-partition iterator — constant memory.

Row-at-a-time ``F.udf`` is deliberately NOT used in any declared query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import pround
from kafka_parquet_writer_spark.registry import query


@query(
    "udf_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           (floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1e2 + 0.5)
            / 1e2) AS charge
    FROM lineitem
    WHERE l_quantity >= 30
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF computing the line charge.

    Same IEEE double ops as the SQL expression, so values hash-match;
    rounding applied JVM-side after the UDF.
    """

    @F.pandas_udf("double")
    def charge_udf(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ep * (1 - disc) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(charge_udf("l_extendedprice", "l_discount", "l_tax"), 2).alias("charge"),
    )


@query(
    "udaf_grouped",
    oracle="""
    SELECT user_id,
           count(*) AS n,
           (floor((sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT))
                   / (100.0 * count(*))) * 1e6 + 0.5) / 1e6) AS mean_value,
           (floor((median(value)) * 1e6 + 0.5) / 1e6)        AS median_value,
           (floor((max(value) - min(value)) * 1e6 + 0.5) / 1e6) AS value_range
    FROM events
    GROUP BY user_id
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDAF via applyInPandas: per-user stats computed in
    pandas (count / mean / median / range).

    The mean is computed over exact integer cents (pandas' pairwise
    float summation would otherwise diverge from SQL engines in the last
    ulp); median interpolation ((a+b)/2 of the same two doubles) and
    max-min are engine-independent by construction. Scale: one shuffle
    on user_id; group sizes bounded (events per user).
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"]
        cents = np.floor(v.to_numpy() * 100.0 + 0.5).astype("int64")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "mean_value": [cents.sum() / (100.0 * len(pdf))],
                "median_value": [float(v.median())],
                "value_range": [float(v.max() - v.min())],
            }
        )

    # applyInPandas ships every input column through Arrow — column
    # pruning does not reach inside the UDF — so project to the two
    # columns the stats need before grouping (drops the wide JSON
    # `props` string from the shuffle AND the Arrow transfer).
    # Explicit repartition on the key: the pandas stage is Python-
    # compute-bound, so it wants core-count parallelism; AQE would
    # coalesce the (byte-wise tiny) shuffle to ~1 partition and
    # serialize the Python work. The groupBy reuses this partitioning —
    # no second exchange.
    from kafka_parquet_writer_spark.session import repartition_for_compute

    ev = repartition_for_compute(
        load_table(spark, sf_dir, "events").select("user_id", "value"),
        F.col("user_id"),
    )
    out = ev.groupBy("user_id").applyInPandas(
        stats,
        schema=(
            "user_id long, n long, mean_value double, median_value double, "
            "value_range double"
        ),
    )
    return out.select(
        "user_id",
        "n",
        pround(F.col("mean_value"), 6).alias("mean_value"),
        pround(F.col("median_value"), 6).alias("median_value"),
        pround(F.col("value_range"), 6).alias("value_range"),
    )


#: one oracle for both UDTF surfaces (mapInPandas shape and the
#: native @udtf) — same semantics, one string, no drift
_TOKENS_ORACLE = """
    SELECT doc, u.token AS token, CAST(u.pos AS INTEGER) AS pos
    FROM (
      SELECT doc_id AS doc,
             unnest(list_transform(range(1, len(w) + 1),
                    i -> struct_pack(token := w[i], pos := i - 1))) AS u
      FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           t -> t <> '') AS w
        FROM documents
        WHERE doc_id < 50
      )
    )
    """


@query(
    "udtf_tokens",
    oracle=_TOKENS_ORACLE,
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped table function: one input row → N output rows
    (token, position), implemented as a streaming mapInPandas generator
    (the Python-UDTF execution shape; see also F.udtf in pyspark 4 —
    same semantics, registered for SQL's LATERAL)."""

    def explode_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs, toks, poss = [], [], []
            for doc, text in zip(pdf["doc_id"], pdf["text"]):
                for i, tok in enumerate(t for t in text.lower().split() if t):
                    docs.append(doc)
                    toks.append(tok)
                    poss.append(i)
            yield pd.DataFrame({"doc": docs, "token": toks, "pos": poss})

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select("doc_id", "text").mapInPandas(
        explode_tokens, schema="doc long, token string, pos int"
    )


@query(
    "udtf_lateral_native",
    oracle=_TOKENS_ORACLE,
)
def udtf_lateral_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE Python UDTF API (pyspark 4 `@udtf` class), registered
    for SQL and invoked through LATERAL — the user-facing table-function
    surface, complementing udtf_tokens' mapInPandas execution shape
    (same semantics, same oracle). Arrow transfer is enabled
    per-session (`spark.sql.execution.pythonUDTF.arrow.enabled`);
    UDTFs remain the convenience path — bulk tokenization at 100 TB
    stays on the JVM split/explode expressions (text.py).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class Tokens:
        def eval(self, text: str):
            for i, t in enumerate(x for x in text.lower().split() if x):
                yield (t, i)

    spark.udtf.register("kpws_tokens_udtf", Tokens)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("v_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id AS doc, t.token, t.pos
        FROM v_udtf_docs d, LATERAL kpws_tokens_udtf(d.text) t
        """
    )

"""Scalar expression function families (SURVEY.md §2B rows 17-21).

The reference has zero scalar expression functions (SURVEY.md §2A
absences — its only per-record transform is a protobuf parse,
`KafkaProtoParquetWriter.java:269-277`). These queries exercise Spark's
built-in JVM-side expression library — everything stays inside
whole-stage codegen; no Python executes per row.

Oracle-parity notes:
- DuckDB length()/len() return BIGINT where Spark returns INT → CAST.
- DuckDB ceil/floor(double) return DOUBLE where Spark returns BIGINT → CAST.
- DuckDB regexp_replace replaces the first match unless the 'g' flag is
  passed; Spark replaces all.
- Transcendentals (ln/pow) may differ in the last ulp between libm and
  the JVM → rounded to 6 digits on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.functions.portable import pround
from kafka_parquet_writer_spark.registry import query


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                        AS brand_u,
           lower(p_type)                                         AS type_l,
           substr(p_name, 1, 12)                                 AS name_prefix,
           CAST(length(p_name) AS INTEGER)                       AS name_len,
           concat_ws('-', p_brand, p_type)                       AS brand_type,
           (p_name LIKE '%a%')                                   AS has_a,
           regexp_extract(p_name, '([a-z]+)', 1)                 AS first_word,
           CAST(len(string_split(p_name, ' ')) AS INTEGER)       AS n_words,
           trim(concat(' ', p_brand, ' '))                       AS trimmed,
           regexp_replace(p_type, '[aeiou]', '*', 'g')           AS devoweled
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: case, substring, length, concat, LIKE,
    regex extract/replace, split, trim."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.regexp_replace("p_type", "[aeiou]", "*").alias("devoweled"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)                    AS o_year,
           CAST(month(o_orderdate) AS INTEGER)                   AS o_month,
           CAST(day(o_orderdate) AS INTEGER)                     AS o_day,
           CAST(quarter(o_orderdate) AS INTEGER)                 AS o_quarter,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-06-01', o_orderdate) AS INTEGER)
                                                                 AS days_since,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')  AS plus_3m,
           strftime(last_day(o_orderdate), '%Y-%m-%d')           AS month_end,
           strftime(o_orderdate, '%Y/%m/%d %H:%M:%S')            AS ts_str
    FROM orders
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: extract, truncate, diff, add_months, last_day,
    formatting. Session TZ pinned to UTC (session.py) so results match
    DuckDB's naive timestamps."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff("o_orderdate", F.lit("1995-06-01").cast("timestamp")).alias(
            "days_since"
        ),
        F.date_format(F.add_months("o_orderdate", 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format("o_orderdate", "yyyy/MM/dd HH:mm:ss").alias("ts_str"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           (floor((l_extendedprice) * 1e1 + 0.5) / 1e1)                      AS price_r1,
           (floor((abs(l_discount - 0.05)) * 1e6 + 0.5) / 1e6)               AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)               AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)              AS qty_floor,
           (floor((pow(l_quantity, 2)) * 1e6 + 0.5) / 1e6)                   AS qty_sq,
           (floor((ln(l_extendedprice)) * 1e6 + 0.5) / 1e6)                  AS price_ln,
           (floor((sqrt(l_quantity)) * 1e6 + 0.5) / 1e6)                     AS qty_sqrt,
           l_linenumber % 3                               AS line_mod,
           CASE WHEN l_discount > 0.05 THEN 'hi' ELSE 'lo' END AS disc_band,
           (floor((coalesce(greatest(l_quantity, 25.0), 0)) * 1e2 + 0.5) / 1e2)   AS qty_floor25
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional family: round/abs/ceil/floor/pow/ln/sqrt/mod,
    CASE WHEN, coalesce, greatest."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice"), 1).alias("price_r1"),
        pround(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        pround(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        pround(F.log("l_extendedprice"), 6).alias("price_ln"),
        pround(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.when(F.col("l_discount") > 0.05, "hi").otherwise("lo").alias("disc_band"),
        pround(F.coalesce(F.greatest("l_quantity", F.lit(25.0)), F.lit(0.0)), 2).alias(
            "qty_floor25"
        ),
    )


@query(
    "scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                             AS dim,
           (floor((list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b)) * 1e6 + 0.5) / 1e6)                                    AS sq_norm,
           (floor((CAST(list_slice(embedding, 1, 1)[1] AS DOUBLE)) * 1e6 + 0.5) / 1e6)    AS first_val,
           (floor((list_reduce(
               list_transform(list_slice(embedding, 1, 8),
                              x -> CAST(x AS DOUBLE)),
               (a, b) -> a + b)) * 1e6 + 0.5) / 1e6)                                    AS head8_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)    AS n_pos,
           (floor((CAST(list_sort(list_slice(embedding, 1, 8))[1] AS DOUBLE)) * 1e6 + 0.5) / 1e6)
                                                                       AS head8_min
    FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over embedding vectors: size, slice,
    element access, higher-order transform/filter/aggregate, sort_array.

    Scale: all higher-order functions run JVM-side per row — no explode,
    no shuffle, no Python. This is the cheap path for vector math.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        pround(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + dbl(x) * dbl(x)
            ),
            6,
        ).alias("sq_norm"),
        pround(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        pround(
            F.aggregate(
                F.slice("embedding", 1, 8), F.lit(0.0), lambda acc, x: acc + dbl(x)
            ),
            6,
        ).alias("head8_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        pround(
            F.element_at(F.sort_array(F.slice("embedding", 1, 8)), 1).cast("double"), 6
        ).alias("head8_min"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                    AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER)   AS k_int,
           (CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 = 0)
                                                                AS k_div10
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from a string column (events.props).

    get_json_object is JVM-side (Jackson); for repeated multi-key access
    at scale prefer one from_json into a struct, parsed once.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        (k.cast("int") % 10 == 0).alias("k_div10"),
    )


@query(
    "scalar_map",
    oracle="""
    SELECT event_id,
           map_extract(map(['type','uid'],
                           [event_type, CAST(user_id AS VARCHAR)]),
                       'type')[1]                                   AS m_type,
           map_extract(map(['type','uid'],
                           [event_type, CAST(user_id AS VARCHAR)]),
                       'uid')[1]                                    AS m_uid,
           CAST(cardinality(map(['type','uid'],
                                [event_type, CAST(user_id AS VARCHAR)]))
                AS INTEGER)                                         AS n_keys,
           array_to_string(map_keys(map(['type','uid'],
                                        [event_type,
                                         CAST(user_id AS VARCHAR)])), ',')
                                                                    AS keys_csv
    FROM events
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType function family: construct a map column from key/value
    expressions, then element_at / map_keys / size — all JVM-side
    expressions. Outputs are extracted scalars (never a raw map column:
    map iteration order is engine-defined, so hashing raw maps is not
    portable — the practical rule for any cross-engine pipeline)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").alias("m_uid"),
        F.size(m).alias("n_keys"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )


@query(
    "scalar_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(cust := o_custkey,
                       status := o_orderstatus).cust   AS s_cust,
           struct_pack(cust := o_custkey,
                       status := o_orderstatus).status AS s_status,
           struct_pack(a := struct_pack(k := o_orderkey),
                       b := o_totalprice > 100000.0).a.k AS nested_k,
           struct_pack(a := struct_pack(k := o_orderkey),
                       b := o_totalprice > 100000.0).b   AS is_big
    FROM orders
    """,
)
def scalar_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction and field access (incl. nested structs) —
    the scalar family's missing composite type. Pure projection: zero
    shuffles, whole-stage codegen, field access compiles to a direct
    column reference after Catalyst's CreateStruct/GetStructField
    simplification (the struct never materializes)."""
    o = load_table(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_custkey").alias("cust"), F.col("o_orderstatus").alias("status")
    )
    nested = F.struct(
        F.struct(F.col("o_orderkey").alias("k")).alias("a"),
        (F.col("o_totalprice") > 100000.0).alias("b"),
    )
    return o.select(
        "o_orderkey",
        s["cust"].alias("s_cust"),
        s["status"].alias("s_status"),
        nested["a"]["k"].alias("nested_k"),
        nested["b"].alias("is_big"),
    )


@query(
    "scalar_variant",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_max,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data through Spark 4's VARIANT type:
    `parse_json` turns the JSON payload column into a binary variant
    once, then typed `try_variant_get` path extraction feeds ordinary
    aggregation. The step past scalar_json's per-access string
    parsing: at 100 TB the variant encodes once at ingest (and shreds
    into columnar storage where the format supports it) while
    `get_json_object` re-parses text on every access of every query.
    The DuckDB oracle extracts the same paths from the JSON text, so
    the value hash proves the variant path semantics-identical.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )

"""Web-corpus curation: URL canonicalization dedup.

A crawl's first and cheapest dedup key is the URL itself — the same
page is fetched as `http://Example.COM/a/?utm_source=x&b=1&a=2#frag`
and `https://example.com/a?a=2&b=1`, and treating those as distinct
documents double-counts the page in the corpus. Canonicalization is a
pure per-row string normalization, so it runs at scan speed and drops
the bulk of trivial duplicates before the expensive shingle/embedding
passes (operators/dedup.py).

The fixture has no URL column, so each document derives one
deterministically from doc_id with doc_id-dependent noise — scheme
flips, host case, utm_* tracking params, shuffled query order,
fragments, trailing slashes — such that every group of documents
sharing doc_id div 4 canonicalizes to the same URL. The host is
derived from doc_id div 4 as well (NOT from any per-document column:
round 4 built it from `source`, which varies within every div-4
group, so no canonical group ever had >1 member and the driver's
green row was vacuous — 0 rows == 0 rows). Both engines build and
canonicalize the same strings, so the oracle is exact and, with
URL_GROUP=4, nonempty at every sf.

Canonical form (the standard normalization set):
  scheme→https, host lowercased, default port dropped, fragment
  dropped, utm_* params dropped, remaining params sorted, trailing
  slash dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.registry import query

#: documents per synthetic page (doc_id div N share a canonical URL)
URL_GROUP = 4


def _synth_url_sql() -> str:
    """DuckDB expression building the noisy URL for a doc row."""
    return f"""
    CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END ||
    CASE WHEN doc_id % 3 = 0
         THEN upper('site-' || CAST(doc_id // {URL_GROUP} % 13 AS VARCHAR))
         ELSE 'site-' || CAST(doc_id // {URL_GROUP} % 13 AS VARCHAR) END ||
    '.example.com' ||
    CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END ||
    '/page/' || CAST(doc_id // {URL_GROUP} AS VARCHAR) ||
    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
    CASE WHEN doc_id % 4 < 2
         THEN '?b=' || CAST(doc_id // {URL_GROUP} % 7 AS VARCHAR)
              || '&utm_source=feed&a=1'
         ELSE '?a=1&b=' || CAST(doc_id // {URL_GROUP} % 7 AS VARCHAR) END ||
    CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END
    """


def _synth_url_col() -> F.Column:
    """Spark expression equal to _synth_url_sql."""
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, "http://").otherwise("https://"),
        F.when(
            d % 3 == 0,
            F.upper(
                F.expr(
                    f"'site-' || CAST(doc_id div {URL_GROUP} % 13 AS STRING)"
                )
            ),
        ).otherwise(
            F.expr(f"'site-' || CAST(doc_id div {URL_GROUP} % 13 AS STRING)")
        ),
        F.lit(".example.com"),
        F.when(d % 5 == 0, ":443").otherwise(""),
        F.lit("/page/"),
        F.expr(f"CAST(doc_id div {URL_GROUP} AS STRING)"),
        F.when(d % 2 == 0, "/").otherwise(""),
        F.when(
            d % 4 < 2,
            F.concat(
                F.lit("?b="),
                F.expr(f"CAST(doc_id div {URL_GROUP} % 7 AS STRING)"),
                F.lit("&utm_source=feed&a=1"),
            ),
        ).otherwise(
            F.concat(
                F.lit("?a=1&b="),
                F.expr(f"CAST(doc_id div {URL_GROUP} % 7 AS STRING)"),
            )
        ),
        F.when(d % 7 == 0, "#section-2").otherwise(""),
    )


#: canonicalization pipeline, as paired (Spark builder, SQL fragment)
#: steps documented in the module docstring


def _canon_col(url: F.Column) -> F.Column:
    # strip fragment, force https, lowercase scheme+host (host = up to
    # first '/') while preserving path case, drop :443, strip trailing
    # slash on the path part, drop utm_* params and sort the rest
    no_frag = F.regexp_replace(url, r"#.*$", "")
    https = F.regexp_replace(no_frag, r"^http://", "https://")
    host = F.lower(F.regexp_extract(https, r"^https://([^/?]*)", 1))
    host = F.regexp_replace(host, r":443$", "")
    rest = F.regexp_replace(https, r"^https://[^/?]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    q = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.startswith("utm_"),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(""),
    )


def _canon_sql(url_expr: str) -> str:
    return f"""
    'https://' ||
    regexp_replace(
      lower(regexp_extract(regexp_replace(regexp_replace({url_expr},
                '#.*$', ''), '^http://', 'https://'),
            '^https://([^/?]*)', 1)),
      ':443$', '') ||
    regexp_replace(
      regexp_extract(regexp_replace(regexp_replace(regexp_replace({url_expr},
                '#.*$', ''), '^http://', 'https://'),
            '^https://[^/?]*', ''), '^([^?]*)', 1),
      '/$', '') ||
    CASE WHEN array_to_string(list_sort(list_filter(
              string_split(regexp_extract(regexp_replace({url_expr},
                    '#.*$', ''), '\\?(.*)$', 1), '&'),
              p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') <> ''
         THEN '?' || array_to_string(list_sort(list_filter(
              string_split(regexp_extract(regexp_replace({url_expr},
                    '#.*$', ''), '\\?(.*)$', 1), '&'),
              p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&')
         ELSE '' END
    """


@query(
    "dedup_url",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, ({_synth_url_sql()}) AS url FROM documents
    ),
    c AS (SELECT doc_id, ({_canon_sql('url')}) AS canonical_url FROM u)
    SELECT canonical_url,
           min(doc_id) AS keeper_id,
           count(*) AS n_docs
    FROM c
    GROUP BY canonical_url
    HAVING count(*) > 1
    """,
)
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup: normalize each document's URL
    (scheme/host case, default port, fragment, utm_* tracking params,
    query-param order, trailing slash) and keep the min-doc_id member
    of every canonical group — emitting the duplicate groups with
    their keeper. The cheapest dedup pass a web corpus runs, ahead of
    shingle/embedding near-dup (operators/dedup.py).

    Scale shape: canonicalization is a stateless per-row expression
    chain (regex + array ops, all JVM codegen); the only shuffle is
    the groupBy on the canonical URL — identical cost to dedup_exact,
    and at 100 TB the same deterministic min-per-key pattern (no
    window, no sort) picks keepers.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _synth_url_col().alias("url")
    )
    c = docs.select("doc_id", _canon_col(F.col("url")).alias("canonical_url"))
    return (
        c.groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# URL component extraction (the parse_url scalar family)
# ---------------------------------------------------------------------------


@query(
    "scalar_url",
    oracle=f"""
    WITH u AS (SELECT doc_id, ({_synth_url_sql()}) AS url FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           lower(regexp_replace(
             regexp_extract(url, '^[a-z]+://([^/?#]*)', 1),
             ':[0-9]+$', '')) AS host,
           CASE WHEN regexp_extract(url, '^[a-z]+://[^/?#]*:([0-9]+)', 1)
                     <> ''
                THEN CAST(regexp_extract(url,
                       '^[a-z]+://[^/?#]*:([0-9]+)', 1) AS BIGINT)
                WHEN regexp_extract(url, '^([a-z]+)://', 1) = 'https'
                THEN 443 ELSE 80 END AS port,
           regexp_extract(regexp_replace(url, '[?#].*$', ''),
                          '^[a-z]+://[^/]*(/.*)$', 1) AS path,
           regexp_extract(url, '[?&]b=([^&#]*)', 1) AS qp_b,
           regexp_extract(url, '#(.*)$', 1) <> '' AS has_fragment
    FROM u
    """,
)
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction — the `parse_url` scalar family over
    the same synthetic crawl URLs dedup_url canonicalizes: scheme,
    host (lowercased, port stripped), effective port (explicit, else
    the scheme default), path, a named query-parameter lookup, and
    fragment presence. Feature engineering over crawl metadata
    (domain-level mixing, per-site quotas, path-depth filters) starts
    with exactly these accessors; Spark ships `parse_url` but DuckDB
    has no twin, so the portable formulation — and the one used here
    on BOTH engines — is anchored regex extraction (Java-regex ∩ RE2
    dialect, the text_pii_scrub rule).

    Scale shape: pure per-row projections — parallelizes with the
    scan, no shuffle, nothing to tune.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", _synth_url_col().alias("url"))
    url = F.col("url")
    scheme = F.regexp_extract(url, r"^([a-z]+)://", 1)
    explicit_port = F.regexp_extract(url, r"^[a-z]+://[^/?#]*:([0-9]+)", 1)
    return u.select(
        "doc_id",
        scheme.alias("scheme"),
        F.lower(
            F.regexp_replace(
                F.regexp_extract(url, r"^[a-z]+://([^/?#]*)", 1),
                r":[0-9]+$",
                "",
            )
        ).alias("host"),
        F.when(explicit_port != "", explicit_port.cast("long"))
        .when(scheme == "https", F.lit(443))
        .otherwise(F.lit(80))
        .cast("long")
        .alias("port"),
        F.regexp_extract(
            F.regexp_replace(url, r"[?#].*$", ""),
            r"^[a-z]+://[^/]*(/.*)$",
            1,
        ).alias("path"),
        F.regexp_extract(url, r"[?&]b=([^&#]*)", 1).alias("qp_b"),
        (F.regexp_extract(url, r"#(.*)$", 1) != "").alias("has_fragment"),
    )

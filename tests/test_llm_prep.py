"""Semantic properties of the LLM curation operators (llm_prep.py) that
the DuckDB oracle alone doesn't pin down: benchmark docs never flag
themselves, sampling is deterministic and budget-respecting, and
duplicate content never straddles the train/val split."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.operators.llm_prep import (
    DECON_BENCH_MOD,
    DECON_MIN_SHARED,
    MIX_BUDGET_PCT,
    MIX_TARGET_BP,
    SPLIT_VAL_PCT,
    decontaminate_ngram,
    mixture_sample,
    split_leakage_free,
)


def test_decontaminate_never_flags_benchmark_docs(spark):
    out = decontaminate_ngram(spark, SF_SMOKE)
    assert (
        out.filter(F.col("doc_id") % DECON_BENCH_MOD == 0).count() == 0
    )
    assert out.filter(F.col("n_shared") < DECON_MIN_SHARED).count() == 0


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The corpus (100 TB side) must meet the benchmark shingle set via
    a broadcast hash join — a shuffle of the corpus here is the
    scale-killer this operator exists to avoid."""
    plan = decontaminate_ngram(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only SortMergeJoin-able shuffle allowed is the final count agg
    assert "SortMergeJoin" not in plan


def test_mixture_sample_deterministic(spark):
    a = sorted(r["doc_id"] for r in mixture_sample(spark, SF_SMOKE).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(spark, SF_SMOKE).collect())
    assert a == b and len(a) > 0


def test_mixture_sample_respects_budget_and_rates(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    ).collect()[0][0]
    out = mixture_sample(spark, SF_SMOKE)
    rows = out.collect()
    # every emitted rate is a valid basis-point fraction
    assert all(0 <= r["rate_bp"] <= 10000 for r in rows)
    # the sample's total tokens stay within the configured budget plus
    # hash-sampling slack (binomial; generous bound for a tiny fixture)
    sampled = sum(r["tok"] for r in rows)
    budget = total_tokens * MIX_BUDGET_PCT / 100
    assert sampled <= budget * 1.35, (sampled, budget)
    # a language at rate 10000 keeps every doc; below it keeps a subset
    per_lang = {
        r["lang"]: r["cnt"]
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(per_lang) <= set(MIX_TARGET_BP)


def test_split_leakage_free_groups_duplicates(spark):
    out = split_leakage_free(spark, SF_SMOKE)
    # same content key ⇒ same split, by construction AND by data
    leaky = (
        out.groupBy("content_key")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert leaky == 0
    # both splits are non-empty and val is the minority at ~SPLIT_VAL_PCT
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) == {"train", "val"}
    frac = counts["val"] / (counts["val"] + counts["train"])
    assert 0.02 <= frac <= 0.3, frac


def test_split_is_map_only(spark):
    """The split must not shuffle — it's a per-row expression that
    composes with the scan (verified on the physical plan)."""
    plan = split_leakage_free(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

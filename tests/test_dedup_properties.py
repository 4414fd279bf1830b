"""Property tests for the dedup/text operators (hypothesis where cheap,
direct properties elsewhere)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import __spark_entry__ as E
from kafka_parquet_writer_spark.operators.dedup import (
    MINHASH_COEFFS,
    _shingle_pairs,
    minhash_signatures,
)
from kafka_parquet_writer_spark.sources.decoders import (
    encode_wire_format,
    parse_wire_format,
)


@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=200),
        st.one_of(
            st.integers(min_value=-(2**63), max_value=2**62),
            st.text(max_size=50),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_wire_format_encode_parse_roundtrip(fields):
    parsed = parse_wire_format(encode_wire_format(fields))
    for fnum, val in fields.items():
        got = parsed[fnum][0]
        if isinstance(val, int):
            # wire varints are unsigned: negatives round-trip as their
            # 64-bit two's complement (the decoder layer re-signs them)
            assert got == val & 0xFFFFFFFFFFFFFFFF
        else:
            assert got.decode() == val


def test_dedup_exact_idempotent(spark, sf_dir):
    """Dedup applied to its own output is the identity."""
    once = E.queries()["dedup_exact"](spark, sf_dir)
    keys = once.select("user_id", "event_type")
    assert keys.count() == keys.distinct().count()


def test_minhash_xxhash_production_path(spark, sf_dir):
    """The dictionary-free (xxhash64) signature path produces one
    signature row per doc and identical signatures for docs with
    identical shingle sets."""
    sh = _shingle_pairs(spark, sf_dir)
    sigs = minhash_signatures(sh, MINHASH_COEFFS, use_xxhash=True)
    n_docs = sh.select("doc").distinct().count()
    assert sigs.count() == n_docs
    # identical shingle sets ⇒ identical signatures: group docs by
    # sorted shingle fingerprint and check signature uniformity
    sets = sh.groupBy("doc").agg(
        F.md5(F.concat_ws("|", F.sort_array(F.collect_list("shingle")))).alias("sig_set")
    )
    joined = sigs.join(sets, "doc")
    h_cols = [c for c in sigs.columns if c.startswith("h")]
    per_set = joined.groupBy("sig_set").agg(
        *[F.countDistinct(c).alias(c) for c in h_cols]
    )
    bad = per_set.filter(
        " OR ".join(f"{c} > 1" for c in h_cols)
    ).count()
    assert bad == 0


def test_jaccard_pairs_symmetric_threshold(spark, sf_dir):
    """Every reported near-dup pair has d1 < d2 and jac within [0.6, 1]."""
    rows = E.queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    for r in rows:
        assert r.d1 < r.d2
        assert 0.6 <= r.jac <= 1.0


def test_rotation_binning_conservation(spark, sf_dir):
    """Every record lands in exactly one (shard, size_bin) and bins are
    contiguous from 0 per shard (totality, SURVEY.md §5.2)."""
    out = E.queries()["etl_rotation_binning"](spark, sf_dir)
    ev_n = out.count()
    assert out.select("event_id").distinct().count() == ev_n
    per_shard = out.groupBy("shard").agg(
        F.min("size_bin").alias("lo"),
        F.max("size_bin").alias("hi"),
        F.countDistinct("size_bin").alias("nbins"),
    )
    for r in per_shard.collect():
        assert r.lo == 0
        assert r.nbins == r.hi + 1  # contiguous


def test_connected_components_synthetic(spark):
    from kafka_parquet_writer_spark.operators.dedup import connected_components

    # two chains and a singleton-free isolated pair: {1,2,3,4}, {10,11}, {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "d1 long, d2 long"
    )
    got = {
        r["doc"]: r["comp"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_path_converges_in_log_rounds(spark):
    """Star contraction must handle large-diameter graphs in O(log n)
    rounds — the case that kills label propagation (rounds ∝ diameter).
    A 128-hop path has diameter 128; the round budget here is 12."""
    from kafka_parquet_writer_spark.operators import dedup as D

    n = 128
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "d1 long, d2 long"
    )
    # driver_finish_edges=0 forces the pure distributed loop — this
    # test pins the star-contraction convergence rate, not the
    # driver-finish shortcut
    labels = {
        r["doc"]: r["comp"]
        for r in D.connected_components(
            edges, driver_finish_edges=0
        ).collect()
    }
    assert len(labels) == n + 1
    assert set(labels.values()) == {0}
    assert D._LAST_CC_ROUNDS <= 12


def test_connected_components_driver_finish_matches_distributed(spark):
    """The r15 two-phase finish: the union-find driver path must emit
    exactly the distributed loop's labels on a seeded random graph
    (chains, merges, isolated pairs all present at n=300, m=220)."""
    import random

    from kafka_parquet_writer_spark.operators import dedup as D

    rng = random.Random(4321)
    n, m = 300, 220
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "d1 long, d2 long")

    dist = {
        r["doc"]: r["comp"]
        for r in D.connected_components(
            edges, driver_finish_edges=0
        ).collect()
    }
    assert D._LAST_CC_ROUNDS >= 1
    drv = {
        r["doc"]: r["comp"]
        for r in D.connected_components(
            edges, driver_finish_edges=10**6
        ).collect()
    }
    assert D._LAST_CC_ROUNDS == 0
    assert drv == dist


def test_connected_components_random_graph_matches_union_find(spark):
    """Seeded random graph vs a plain Python union-find oracle."""
    import random

    from kafka_parquet_writer_spark.operators.dedup import connected_components

    rng = random.Random(1234)
    n, m = 300, 220
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    pairs = [(a, b) for a, b in pairs if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for ab in pairs for x in ab}
    expected = {x: find(x) for x in touched}

    edges = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {r["doc"]: r["comp"] for r in connected_components(edges).collect()}
    assert got == expected

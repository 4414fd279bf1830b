"""Metamorphic properties of the round-6 operators — invariants the
DuckDB value oracles do NOT express (they prove engine-equality, not
these)."""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E
from tests.conftest import SF_ORACLE, SF_SMOKE


def _unit_fixture_vectors(sf_dir, limit=200):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    u = np.vstack(t["embedding"].to_numpy()).astype(np.float64)
    u = u / np.linalg.norm(u, axis=1, keepdims=True)
    return t["vec_id"].to_numpy()[:limit], u[:limit]


def test_imi_shortcut_equals_full_product_enumeration():
    """The top-probe × top-probe combination shortcut must pick the
    SAME probe cells as brute-force enumeration of all m1·m2 product
    cells ordered by (combined score, cell id) — on every fixture
    vector. This is the exactness claim in _make_imi_assigner's
    docstring, checked against the definitionally-correct form."""
    from kafka_parquet_writer_spark.operators.dedup import (
        ANN_DEDUP_PROBE,
        ANN_IMI_SIDE,
        _imi_banks,
        _make_imi_assigner,
    )

    vec_ids, u = _unit_fixture_vectors(SF_ORACLE)
    c1l, c2l = _imi_banks(ANN_IMI_SIDE, ANN_IMI_SIDE)
    c1, c2 = np.asarray(c1l), np.asarray(c2l)

    # production closure
    pdf = pd.DataFrame({"vec_id": vec_ids, "u": list(u)})
    out = pd.concat(
        list(_make_imi_assigner(ANN_IMI_SIDE, ANN_IMI_SIDE)([pdf])),
        ignore_index=True,
    )
    got = {
        vid: list(g["cell"])
        for vid, g in out.groupby("vec_id", sort=False)
    }

    # brute force: all m1*m2 cells, sorted by (s1+s2, cell)
    s1 = -(u[:, :32] @ c1.T)
    s2 = -(u[:, 32:] @ c2.T)
    for k, vid in enumerate(vec_ids):
        full = sorted(
            (s1[k, i] + s2[k, j], i * ANN_IMI_SIDE + j)
            for i in range(ANN_IMI_SIDE)
            for j in range(ANN_IMI_SIDE)
        )
        want = [c for _, c in full[:ANN_DEDUP_PROBE]]
        assert got[int(vid)] == want, vid


def test_imi_product_centroids_unit_norm():
    """Every combined centroid concat(c1_i, c2_j) must have unit norm
    (up to the 6-decimal literal rounding) — the property that makes
    max-dot IMI assignment spherical k-means like the flat bank."""
    from kafka_parquet_writer_spark.operators.dedup import _imi_banks

    c1, c2 = _imi_banks(8, 8)
    n1 = [sum(x * x for x in r) for r in c1]
    n2 = [sum(x * x for x in r) for r in c2]
    for a in n1:
        for b in n2:
            assert abs((a + b) - 1.0) < 1e-4


def test_imi_banks_prefix_stable():
    """Growing either bank must keep the smaller bank as an exact
    prefix (independent seeded streams) — the same growth guarantee
    as the flat bank's _dedup_centroids."""
    from kafka_parquet_writer_spark.operators.dedup import _imi_banks

    c1s, c2s = _imi_banks(4, 6)
    c1b, c2b = _imi_banks(16, 16)
    assert c1b[:4] == c1s
    assert c2b[:6] == c2s


def test_ann_flat_ceiling_hands_off_to_imi(spark, monkeypatch):
    """Past ANN_DEDUP_MAX_LITERAL_CELLS the production key must run
    the two-level path (not raise, not cap): force the ceiling to 1
    so the smoke fixture's m=16 exceeds it, and check the result is a
    valid near-dup pair set of the usual shape."""
    import kafka_parquet_writer_spark.operators.dedup as D

    monkeypatch.setattr(D, "ANN_DEDUP_MAX_LITERAL_CELLS", 1)
    out = D.dedup_embedding_ann(spark, SF_SMOKE)
    rows = out.collect()
    assert out.columns == ["v1", "v2", "cos"]
    for r in rows:
        assert r["v1"] < r["v2"]
        assert r["cos"] >= D.COSINE_DUP_THRESHOLD - 1e-6


def test_containment_positional_filter_lossless(spark):
    """The r6 positional filter must not drop any true containment
    pair: the operator's output at smoke SF equals the unfiltered
    all-pairs containment computed directly (numpy reference)."""
    from kafka_parquet_writer_spark.operators.dedup import (
        CONTAIN_MIN_SHINGLES,
        CONTAIN_T,
        _tid_sets,
    )

    st = _tid_sets(spark, SF_SMOKE).collect()
    sets: dict[int, set] = {}
    for r in st:
        sets.setdefault(r["doc"], set()).add(r["tid"])
    want = set()
    docs = sorted(sets)
    for x in docs:
        for y in docs:
            a, b = sets[x], sets[y]
            if len(a) < len(b) or (len(a) == len(b) and x < y):
                if len(a) >= CONTAIN_MIN_SHINGLES and len(a & b) / len(
                    a
                ) >= CONTAIN_T:
                    want.add((x, y))
    got = {
        (r["d1"], r["d2"])
        for r in E.queries()["dedup_containment"](spark, SF_SMOKE).collect()
    }
    assert got == want

"""Multimodal blob pipeline: pack → (stub) decode via mapInPandas."""

from pyspark.sql import functions as F

from kafka_parquet_writer_spark.catalog import load_table
from kafka_parquet_writer_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image_meta,
    extract_features,
    pack_blobs,
    resize_images,
    sample_video_frames,
)
from kafka_parquet_writer_spark.operators.similarity import brute_force_topk_matrix


def test_pack_decode_pipeline(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    blobs = pack_blobs(docs)
    assert [f.name for f in blobs.schema.fields] == [
        "doc_id", "modality", "blob", "meta",
    ]
    decoded = decode_image_meta(blobs)
    rows = decoded.collect()
    assert len(rows) == docs.count()
    by_id = {r.doc_id: r for r in rows}
    src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for doc_id, text in list(src.items())[:20]:
        r = by_id[doc_id]
        n = len(text.encode())
        assert r.n_bytes == n
        assert r.width == n % 640 + 1 and r.height == (n * 7) % 480 + 1
        assert r.ok


def test_blob_metadata_matches_struct(spark, sf_dir):
    blobs = pack_blobs(load_table(spark, sf_dir, "documents"))
    bad = blobs.filter(F.octet_length("blob") != F.col("meta.n_bytes")).count()
    assert bad == 0


def test_resize_normalizes_payload_and_meta(spark, sf_dir):
    blobs = pack_blobs(load_table(spark, sf_dir, "documents")).limit(50)
    resized = resize_images(blobs, width=8, height=4)
    rows = resized.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.blob) == 32
        assert r.meta.width == 8 and r.meta.height == 4
        assert r.meta.n_bytes == 32


def test_frame_sampling_expands_rows(spark, sf_dir):
    blobs = pack_blobs(load_table(spark, sf_dir, "documents")).limit(20)
    frames = sample_video_frames(blobs, frame_bytes=16, every_n=2)
    rows = frames.collect()
    src = {r.doc_id: len(r.blob) for r in blobs.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, n in src.items():
        expected = len(range(0, max(1, n // 16), 2))
        assert len(by_doc[doc_id]) == expected
        idxs = sorted(f.frame_idx for f in by_doc[doc_id])
        assert idxs == list(range(0, 2 * len(idxs), 2))


def test_feature_extraction_yields_unit_l1_vectors(spark, sf_dir):
    blobs = pack_blobs(load_table(spark, sf_dir, "documents")).limit(30)
    feats = extract_features(blobs)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        assert abs(sum(r.feature) - 1.0) < 1e-5  # L1-normalized histogram


def test_matrix_topk_matches_numpy_ground_truth(spark, sf_dir):
    """The BLAS mapInPandas brute-force path agrees with an independent
    numpy computation of cosine top-k."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    all_rows = emb.collect()
    queries = [(r.vec_id, list(r.embedding)) for r in all_rows if r.vec_id < 5]
    cands = [(r.vec_id, np.array(r.embedding, dtype=np.float64)) for r in all_rows
             if r.vec_id >= 5]
    fast = brute_force_topk_matrix(
        emb.filter(F.col("vec_id") >= 5), queries, k=5
    )
    got = {}
    for r in fast.collect():
        got.setdefault(r.q_id, []).append((r.rnk, r.n_id))
    c_ids = np.array([c[0] for c in cands])
    c_mat = np.stack([c[1] for c in cands])
    c_mat = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
    for q_id, q_vec in queries:
        q = np.array(q_vec, dtype=np.float64)
        sims = c_mat @ (q / np.linalg.norm(q))
        order = np.lexsort((c_ids, -sims))[:5]
        expected = [int(c_ids[i]) for i in order]
        actual = [n for _, n in sorted(got[q_id])]
        assert actual == expected, q_id

"""Parquet roundtrip for the persisted ANN artifacts (VERDICT r6 #5):
SQ8 and PQ join IVF in the store/load + ``*_topk_indexed`` family — the
probe against the stored artifact must reproduce the in-memory probe
exactly, and the artifact must be self-sufficient (no original vectors,
no re-encoding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opteryx_spark.catalog import load_table
from opteryx_spark.operators import similarity as S


def _emb(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    return emb.filter(F.col("vec_id") != 0), qvec


def test_sq8_roundtrip_identity(spark, sf_dir, tmp_path):
    corpus, qvec = _emb(spark, sf_dir)
    path = str(tmp_path / "sq8")
    S.sq8_persist(corpus, path)
    got = S.sq8_topk_indexed(spark, path, qvec, k=5, shortlist=20).collect()
    want = S.sq8_probe(S.quantize_int8(corpus), qvec, k=5, shortlist=20).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 5


def test_sq8_artifact_schema_and_recall(spark, sf_dir, tmp_path):
    corpus, qvec = _emb(spark, sf_dir)
    path = str(tmp_path / "sq8")
    S.sq8_persist(corpus, path)
    art = spark.read.parquet(path)
    # the artifact is the whole probe input: ids, int8 codes, scale — no floats
    assert sorted(art.columns) == ["qvec", "scale", "vec_id"]
    # dequantized rescore tracks the exact brute-force ranking
    idx_ids = {r["vec_id"] for r in S.sq8_topk_indexed(spark, path, qvec, k=10)
               .collect()}
    brute_ids = {r["vec_id"] for r in S.cosine_topk(corpus, qvec, k=10).collect()}
    assert len(idx_ids & brute_ids) >= 6  # SQ8 recall trade, not a free fall


def test_pq_roundtrip_identity(spark, sf_dir, tmp_path):
    corpus, qvec = _emb(spark, sf_dir)
    path = str(tmp_path / "pq")
    S.pq_persist(corpus, path)
    got = S.pq_adc_topk_indexed(spark, path, qvec, k=5).collect()
    want = S.pq_adc_topk(corpus, qvec, k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_pq_sidecar_self_describing(spark, sf_dir, tmp_path):
    corpus, _ = _emb(spark, sf_dir)
    path = str(tmp_path / "pq")
    S.pq_persist(corpus, path, m=8, n_codes=16, qscale=1000)
    books = spark.read.parquet(path + "_books")
    rows = books.orderBy("j").collect()
    # probe parameters ride with the codebooks — a probe cannot mix params
    assert len(rows) == 16
    assert rows[0]["m"] == 8 and rows[0]["qscale"] == 1000
    assert len(rows[0]["c"]) == 64
    # the codes frame is m longs per vector — the entire scan payload
    codes = spark.read.parquet(path)
    assert sorted(codes.columns) == ["codes", "vec_id"]
    sample = codes.first()
    assert len(sample["codes"]) == 8
    assert all(0 <= c < 16 for c in sample["codes"])

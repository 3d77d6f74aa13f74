"""Similarity search: brute-force cosine top-k vs numpy ground truth; IVF
bucketed variant recall + pruning accounting."""

import numpy as np
import pytest

from auto_archiver_spark.operators.similarity import (
    assign_buckets,
    cosine_topk,
    ivf_topk,
    train_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, X


def test_cosine_topk_matches_numpy(emb, emb_np):
    ids, X = emb_np
    q = X[ids == 0][0]
    cos = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -np.round(cos, 6)))[:10]
    expected = list(ids[order])
    got = [r.vec_id for r in cosine_topk(emb, list(q), k=10).collect()]
    assert got == expected


def test_ivf_recall_and_pruning(emb, emb_np):
    ids, X = emb_np
    q = X[ids == 7][0]
    cents = train_centroids(emb, n_centroids=8)
    bucketed = assign_buckets(emb, cents).localCheckpoint()
    exact = {r.vec_id for r in cosine_topk(emb, list(q), k=10).collect()}
    approx = {r.vec_id for r in ivf_topk(bucketed, cents, list(q), k=10, nprobe=4).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.6, f"IVF recall {recall}"
    # nprobe=8 == scan everything -> exact
    full = {r.vec_id for r in ivf_topk(bucketed, cents, list(q), k=10, nprobe=8).collect()}
    assert full == exact
    n_buckets = bucketed.select("ivf_bucket").distinct().count()
    assert n_buckets > 1  # pruning is real: probing 4 of >1 buckets skips data

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


def test_embedding_lsh_locality(spark):
    """Hyperplane LSH: identical vectors share the signature; a near-copy
    differs in few bits; an orthogonal-ish vector differs in many."""
    import numpy as np

    from auto_archiver_spark.operators.similarity import embedding_lsh_signature

    rng = np.random.default_rng(3)
    base = rng.normal(size=16)
    near = base + rng.normal(scale=0.01, size=16)
    far = rng.normal(size=16)
    planes = [list(rng.normal(size=16)) for _ in range(16)]
    df = spark.createDataFrame(
        [(0, [float(x) for x in base]), (1, [float(x) for x in near]),
         (2, [float(x) for x in base]), (3, [float(x) for x in far])],
        "vec_id long, embedding array<double>",
    )
    sigs = {r.vec_id: r.lsh_sig
            for r in embedding_lsh_signature(df, planes).collect()}
    assert sigs[0] == sigs[2]  # exact copy -> same bucket key
    assert bin(sigs[0] ^ sigs[1]).count("1") <= 2  # near-copy -> few bit flips
    assert bin(sigs[0] ^ sigs[3]).count("1") >= 3  # unrelated -> many

"""Vectorized hyperplane LSH: determinism, recall, refine exactness."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gpiv_spark.operators.embed_lsh import (
    band_signatures,
    cosine_refine,
    hyperplane_matrix,
    lsh_candidate_pairs,
)


def _vecs(spark, n=80, dim=16, parts=1):
    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, (n, dim))
    # plant: vec i+1000 is a near-copy of vec i for i < 10
    planted = base[:10] * (1 + 0.01 * rng.normal(0, 1, (10, dim)))
    ids = np.concatenate([np.arange(n), np.arange(10) + 1000])
    embs = np.vstack([base, planted])
    pdf = pd.DataFrame(
        {"vec_id": ids, "embedding": [row.tolist() for row in embs]}
    )
    return (
        spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
        .repartition(parts)
    ), embs, ids


def test_hyperplane_matrix_matches_sql_formula():
    h = hyperplane_matrix(5, 3)
    for i in range(5):
        for j in range(3):
            assert h[i, j] == ((j * 311 + i * 127) % 1009) / 1009.0 - 0.5


def test_signatures_partitioning_invariant(spark):
    one, _, _ = _vecs(spark, parts=1)
    many, _, _ = _vecs(spark, parts=7)
    a = band_signatures(one).toPandas().sort_values(
        ["vec_id", "band"]).reset_index(drop=True)
    b = band_signatures(many).toPandas().sort_values(
        ["vec_id", "band"]).reset_index(drop=True)
    assert a.equals(b), "signatures must be a pure function of the vector"


def test_candidates_catch_planted_pairs(spark):
    df, _, _ = _vecs(spark, parts=4)
    cand = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(df).collect()
    }
    for i in range(10):
        assert (i, i + 1000) in cand, f"planted pair {i} missed"


def test_refine_matches_numpy_cosine(spark):
    df, embs, ids = _vecs(spark, parts=3)
    pairs = spark.createDataFrame(
        [(int(i), int(i) + 1000) for i in range(10)], "id_a long, id_b long"
    )
    got = cosine_refine(pairs, df).toPandas().set_index("vec_a")
    pos = {int(v): k for k, v in enumerate(ids)}
    for i in range(10):
        a, b = embs[pos[i]], embs[pos[i + 1000]]
        want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(got.loc[i, "cosine"] - round(want, 6)) < 2e-6
        assert got.loc[i, "cosine"] > 0.9


def test_degenerate_bucket_capped_linear_not_quadratic(spark):
    """10^4 byte-identical embeddings land in ONE bucket per band; the
    bucket cap must star-link them (O(n) candidates via the bucket
    representative), never emit the O(n^2) all-pairs set — and the star
    must still connect every member to the representative."""
    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr("array(1.0D, 2.0D, -1.0D, 0.5D)").alias("embedding"),
    )
    pairs = lsh_candidate_pairs(df, bucket_cap=100).toPandas()
    # star over the min id: exactly n-1 pairs, all anchored at id 0
    assert len(pairs) == n - 1
    assert (pairs["id_a"] == 0).all()
    assert set(pairs["id_b"]) == set(range(1, n))


def test_bucket_cap_no_effect_below_threshold(spark):
    """Sub-cap buckets keep exact all-pairs semantics: results with a
    huge cap equal results with the default cap on planted data."""
    df, _, _ = _vecs(spark, n=60, parts=4)
    a = lsh_candidate_pairs(df).toPandas()
    b = lsh_candidate_pairs(df, bucket_cap=10**9).toPandas()
    key = lambda p: set(map(tuple, p[["id_a", "id_b"]].to_numpy()))
    assert key(a) == key(b)

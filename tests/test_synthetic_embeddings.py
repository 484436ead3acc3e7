"""synthetic_embeddings generator: determinism, partition invariance,
planted near-duplicate structure (the scale-up bench's known positive
class — bench.py _bench_scaleup)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyfusedb_spark.operators import dedup
from pyfusedb_spark.sources.corpus import synthetic_embeddings


@pytest.fixture(scope="module")
def emb200(spark):
    return synthetic_embeddings(spark, 200, dim=64).toPandas().set_index("vec_id")


def test_unit_norm_and_deterministic(spark, emb200):
    v = np.stack(emb200.sort_index()["embedding"].to_numpy())
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)
    again = (
        synthetic_embeddings(spark, 200, dim=64).toPandas().set_index("vec_id")
    )
    v2 = np.stack(again.sort_index()["embedding"].to_numpy())
    np.testing.assert_array_equal(v, v2)


def test_partition_invariance(spark, emb200):
    """component (i, j) is a pure function of i — any partitioning and
    any subrange must reproduce identical rows."""
    other = (
        synthetic_embeddings(spark, 200, dim=64, n_partitions=7)
        .toPandas().set_index("vec_id")
    )
    v = np.stack(emb200.sort_index()["embedding"].to_numpy())
    w = np.stack(other.sort_index()["embedding"].to_numpy())
    np.testing.assert_array_equal(v, w)


def test_planted_near_duplicates(spark, emb200):
    v = np.stack(emb200.sort_index()["embedding"].to_numpy())
    sims = (v[1:] * v[:-1]).sum(axis=1)  # cos(i, i-1), unit vectors
    ids = np.arange(1, 200)
    planted = ids % 50 == 1
    # planted pairs are tight near-dups; everything else near-orthogonal
    assert sims[planted].min() > 0.98
    assert np.abs(sims[~planted]).max() < 0.8


def test_dedup_finds_planted_pairs(spark):
    emb = synthetic_embeddings(spark, 300, dim=64)
    got = {
        tuple(sorted((r["a"], r["b"])))
        for r in dedup.embedding_near_duplicates_bucketed(emb, threshold=0.9).collect()
    }
    expect = {(i - 1, i) for i in range(1, 300) if i % 50 == 1}
    assert expect <= got

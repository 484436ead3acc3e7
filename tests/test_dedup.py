"""Dedup operator tests: exact, MinHash-LSH, SimHash, embedding-cosine."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyfusedb_spark.operators import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 0
    (3, "completely different content about spark inverted index construction pipelines"),
    (4, "another unrelated document mentioning varint compression and block max metadata"),
    (5, ""),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(docs_df):
    rows = {(r["doc_id"], r["keeper_id"]) for r in
            dedup.exact_duplicates(docs_df, "text", "doc_id").collect()}
    assert rows == {(1, 0), (6, 5)}


def test_minhash_lsh_near_duplicates(docs_df):
    out = dedup.minhash_near_duplicates(
        docs_df.where(F.col("doc_id") < 5), "text", "doc_id",
        num_perm=64, bands=16, threshold=0.5,
    ).collect()
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in out}
    assert (0, 1) in pairs and pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_signature_deterministic(docs_df):
    s1 = dedup.minhash_signatures(docs_df, "text", "doc_id").orderBy("doc_id").collect()
    s2 = dedup.minhash_signatures(docs_df.repartition(5), "text", "doc_id").orderBy("doc_id").collect()
    assert [r["sig"] for r in s1] == [r["sig"] for r in s2]
    # identical docs -> identical signatures
    assert s1[0]["sig"] == s1[1]["sig"]


def test_simhash_near_duplicates(docs_df):
    out = dedup.simhash_near_duplicates(docs_df, "text", "doc_id", max_hamming=3)
    pairs = {(r["a"], r["b"]): r["hamming"] for r in out.collect()}
    assert pairs.get((0, 1)) == 0  # identical docs -> hamming 0
    assert pairs.get((5, 6)) == 0  # empty docs hash to 0
    assert (0, 3) not in pairs


def test_embedding_near_duplicates(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0]),   # ~same direction as 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.98, 0.2]),     # ~same direction as 2
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = dedup.embedding_near_duplicates(emb, threshold=0.97)
    pairs = {(r["a"], r["b"]) for r in out.collect()}
    assert pairs == {(0, 1), (2, 3)}


def test_lsh_candidates_cover_true_jaccard_pairs(docs_df):
    """LSH with these band settings must surface the known >=0.5 pairs."""
    sigs = dedup.minhash_signatures(docs_df.where(F.col("doc_id") < 5), "text", "doc_id")
    cand = {(r["a"], r["b"]) for r in dedup.lsh_candidate_pairs(sigs, bands=16).collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= cand


def test_embedding_near_duplicates_bucketed_equals_brute(spark):
    """The IVF-cell-bucketed scale path must return the identical pair
    set to the O(n^2) brute force (lossless spherical-cap prune)."""
    rng = __import__("numpy").random.default_rng(11)
    vecs = [(i, [float(v) for v in rng.standard_normal(16)]) for i in range(120)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    brute = sorted(
        (r["a"], r["b"], round(r["cosine"], 9))
        for r in dedup.embedding_near_duplicates(emb, threshold=0.4).collect()
    )
    bucketed = sorted(
        (r["a"], r["b"], round(r["cosine"], 9))
        for r in dedup.embedding_near_duplicates_bucketed(
            emb, threshold=0.4, n_cells=6, sample_n=120
        ).collect()
    )
    assert brute == bucketed and len(brute) > 0


def test_embedding_bucketed_group_bound_subsplit(spark):
    """max_group_rows far below cell size forces the sub-split path
    (nsl/nsr > 1); the pair set must stay identical and deduplicated
    (advice r3: the input group is now bounded, not just the score
    matrix)."""
    rng = __import__("numpy").random.default_rng(23)
    vecs = [(i, [float(v) for v in rng.standard_normal(16)]) for i in range(120)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    base = sorted(
        (r["a"], r["b"], round(r["cosine"], 9))
        for r in dedup.embedding_near_duplicates_bucketed(
            emb, threshold=0.4, n_cells=4, sample_n=120
        ).collect()
    )
    split = sorted(
        (r["a"], r["b"], round(r["cosine"], 9))
        for r in dedup.embedding_near_duplicates_bucketed(
            emb, threshold=0.4, n_cells=4, sample_n=120, max_group_rows=8
        ).collect()
    )
    assert base == split and len(base) > 0


def test_ngram_decontaminate_known_answer(spark):
    """Constructed contamination: doc 10 embeds a full benchmark
    sentence (two distinct leaked 5-grams... actually all 5-grams of an
    8-token span = 4 n-grams), doc 11 shares a 4-token overlap only
    (below n=5), doc 12 is clean. Case/punctuation must not matter
    (lower + [a-z0-9_]+ tokenizer)."""
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (10, "intro words; THE QUICK, brown Fox jumps over... then more"),
            (11, "quick brown fox jumps elsewhere entirely different tail"),
            (12, "completely unrelated content with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = dedup.ngram_decontaminate(docs, bench, text_col="text",
                                    id_col="doc_id", n=5).collect()
    assert [r["doc_id"] for r in out] == [10]
    # doc 10's leaked 5-grams: "the quick brown fox jumps" and
    # "quick brown fox jumps over" (the "...over then" tail breaks the
    # third) -> n_hits == 2, first_hit is the lexicographically first
    assert out[0]["n_hits"] == 2
    assert out[0]["first_hit"] == "quick brown fox jumps over"


def test_ngram_decontaminate_short_docs_and_empty(spark):
    """Docs/benchmarks shorter than n produce no n-grams (no crash, no
    false hits); an empty benchmark flags nothing."""
    bench = spark.createDataFrame([(0, "a b c")], "bench_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    assert dedup.ngram_decontaminate(docs, bench, n=5).count() == 0
    empty_bench = bench.where(F.lit(False))
    docs2 = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string"
    )
    assert dedup.ngram_decontaminate(docs2, empty_bench, n=5).count() == 0

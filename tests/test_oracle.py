"""Oracle semantics tests: golden df replay + reference-behaviour checks.

Golden corpus and df expectations come from the reference's own test
(``app/tests/final_ii.py:13-34`` corpus, ``:73-84`` expected df) — the
analyzer-level goldens reproducible without nltk Punkt (SURVEY.md §7.5).
"""

import math

import pytest

from pyfusedb_spark.analysis import Analyzer
from pyfusedb_spark.oracle import OracleIndex, bm25_idf, bm25_partial, tfidf_weight

# FIXTURES.md §2 — pangram corpus (reference app/tests/final_ii.py:13-34)
PANGRAMS = [
    "The quick brown foxes jump over the lazy dogs",
    "Pack my boxes with five dozen liquor jugs",
    "How vexingly quick daft zebras jumping",
    "The five boxing wizards jumped quickly",
    "Sphinx of black quartz judge my vows",
    "Two driven jocks help fax my big quizzes",
    "Five quacking zephyrs jolt my wax bed",
    "The jay pigs foxes zebras and my wolves quack",
    "Quick zephyrs blow vexing daft jim",
    "Pack my red boxes with five dozen quality jugs",
    "Jinxed wizards plucking ivy from my quilt box",
    "How quickly daft jumping zebras vex",
    "Waltz nymph for quick jigs vex bud",
    "Quick foxes jumping nightly above wizard",
    "Five jumping wizards hex bolty quick",
    "The flowers are blooming in the gardens",
    "Many flowers bloomed last spring season",
    "Running dogs chase playing cats daily",
    "Cats running and dogs playing together",
    "Birds flying over blooming flower fields",
]

GOLDEN_DF = {
    "quick": 8,
    "jump": 6,
    "wizard": 4,
    "fox": 3,
    "box": 4,
    "flower": 3,
    "bloom": 3,
    "run": 2,
    "dog": 3,
    "cat": 2,
}

# FIXTURES.md §3 — flowers corpus (reference app/tests/inverted_index_test_1.py)
FLOWERS = [
    "The beautiful flower garden was full of roses and tulips",
    "She loves to plant flowers in her spring garden",
    "The flower shop sells fresh roses daily",
    "Spring flowers bloom in the warm sunshine",
    "A garden full of colorful flowers attracts butterflies",
    "The florist arranged a bouquet of exotic flowers",
    "Wild flowers grow freely in the meadow",
    "The flower festival celebrates spring blossoms",
    "Gardening with flowers brings joy and peace",
    "Fresh flowers brighten up any room instantly",
]


@pytest.fixture(scope="module")
def pangram_index():
    return OracleIndex(Analyzer("english")).build(PANGRAMS)


def test_golden_df_counts(pangram_index):
    for stemmed, df in GOLDEN_DF.items():
        assert pangram_index.df(stemmed) == df, (stemmed, pangram_index.df(stemmed), df)


def test_doc_count_includes_empty():
    idx = OracleIndex(Analyzer("english")).build(["hello world", "", "the of"])
    assert idx.n_docs == 3  # app/InvertedIndex.py:34 semantics
    assert idx.doc_len[1] == 0 and idx.doc_len[2] == 0


def test_tfidf_weight_reference_math():
    # w(tf, df) = (1 + log10 tf) * log10(N/df), 0 on tf<=0 or df<=0
    assert tfidf_weight(1, 1, 10) == pytest.approx(math.log10(10))
    assert tfidf_weight(10, 2, 10) == pytest.approx(2 * math.log10(5))
    assert tfidf_weight(0, 5, 10) == 0.0
    assert tfidf_weight(3, 0, 10) == 0.0


def test_bm25_math_hand_computed():
    # hand check: df=2, N=10 -> idf = ln(1 + 8.5/2.5)
    assert bm25_idf(2, 10) == pytest.approx(math.log(1 + 8.5 / 2.5))
    # tf=3, dl=20, avgdl=10, k1=1.2, b=0.75:
    # denom = 3 + 1.2*(0.25 + 0.75*2) = 3 + 1.2*1.75 = 5.1
    assert bm25_partial(3, 20, 10.0) == pytest.approx(3 * 2.2 / 5.1)


def test_search_relevance_flowers():
    idx = OracleIndex(Analyzer("english")).build(FLOWERS)
    assert idx.df("flower") >= 8
    for q in ["flower", "flowers", "spring flower", "beautiful flowers", "flower garden"]:
        for mode in ("tfidf", "bm25"):
            res = idx.search_tfidf(q, 5) if mode == "tfidf" else idx.search_bm25(q, 5)
            assert res, (q, mode)
            scores = [s for _, s in res]
            assert scores == sorted(scores, reverse=True)


def test_search_semantics_corners(pangram_index):
    idx = pangram_index
    # absent term -> empty (app/InvertedIndex.py:357-359 skip semantics)
    assert idx.search_tfidf("nonexistentterm") == []
    assert idx.search_bm25("nonexistentterm") == []
    # stopword-only query -> empty
    assert idx.search_bm25("the of and") == []
    # conjunctive: 'quick fox' both present
    both = idx.search_bm25("quick fox", conjunctive=True)
    assert all(
        any(d == doc and True for d, _ in both) for doc, _ in both
    )
    docs_and = {d for d, _ in both}
    assert docs_and == {0, 13}  # docs containing both quick&fox stems
    # OR includes more docs than AND
    docs_or = {d for d, _ in idx.search_bm25("quick fox", top_k=100)}
    assert docs_and < docs_or
    # tie-break is (-score, doc_id): scores strictly non-increasing
    res = idx.search_bm25("quick", top_k=10)
    for (d1, s1), (d2, s2) in zip(res, res[1:]):
        assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_duplicate_docid_tf_folding():
    # v2 merge semantics: same doc_id appearing twice folds by summing tf
    idx = OracleIndex(Analyzer("english"))
    idx.build([(0, "cat cat"), (0, "cat"), (1, "cat dog")])
    assert idx.postings["cat"] == [(0, 3), (1, 1)]

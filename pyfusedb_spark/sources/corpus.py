"""Deterministic synthetic source-code corpus (FIXTURES.md §1) + loaders.

The north-rule input is an Iceberg-style table
``(repo, path, commit, lang, content)`` (BASELINE.json:input_hint). No such
table ships with the sandbox, so we synthesize it deterministically:
``content`` for row i is a pure function of i (seeded per-row RNG), making
generation distributed, partitioning-invariant and reproducible.

The mix (Zipfian keywords → hot terms for skew tests, camel/snake
identifiers, English words from the reference test sentences, empty rows,
duplicate-content rows) follows FIXTURES.md §1.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

_EXTS = [("py", "python"), ("java", "java"), ("scala", "scala"), ("go", "go"), ("md", "markdown")]

# Zipf-head code keywords -> deliberately hot terms (skew exercise).
_KEYWORDS = (
    "def return self import class public static void func var val if else "
    "for while try except finally new int string bool none null true false"
).split()

_IDENT_HEADS = "parse build merge sort scan read write load store index query fetch emit".split()
_IDENT_TAILS = "Buffer Index Table Request Response Handler Writer Reader Block Segment Cursor".split()

_ENGLISH = (
    "the quick brown foxes jump over lazy dogs pack boxes with five dozen "
    "liquor jugs wizards jumped quickly flowers are blooming gardens running "
    "cats playing spring season fields binary search tree inverted posting "
    "list term frequency document ranking relevance score"
).split()

_SEED0 = 42

# Long-tail vocabulary. A real source-code corpus has a Zipf tail of
# project-specific symbols, not just a head of keywords: ~500 shared
# "library" names (mid-frequency, df ~ n_rows/500) plus per-doc unique
# 8-char symbols (df ~ 1). Alphabetic only — the code analyzer splits
# digit runs out of identifiers ([0-9]+ alternative in _CAMEL_RE), so
# digit-suffixed names would all collapse onto their stems.
_MID_POOL: list[str] = [
    "".join(chr(97 + c) for c in row)
    for row in np.random.default_rng(7).integers(0, 26, size=(500, 5))
]


def mid_vocab_sample(k: int = 0) -> str:
    """Deterministic mid-frequency term (bench queries target real df)."""
    return _MID_POOL[k % len(_MID_POOL)]


# Project-tier symbols: 20k shared names, ~3 per doc -> df ~ n_rows/6666.
# Real code corpora are Zipfian ACROSS the middle too (a helper used by a
# hundred files), not bimodal keyword-vs-singleton; this tier is also what
# gives selective multi-term queries their block-skipping habitat.
_PROJ_POOL: list[str] = [
    "".join(chr(97 + c) for c in row)
    for row in np.random.default_rng(11).integers(0, 26, size=(20000, 6))
]


def project_vocab_sample(k: int = 0) -> str:
    """Deterministic selective term (df ~ n_rows/6666 — rare but > top_k)."""
    return _PROJ_POOL[k % len(_PROJ_POOL)]


def _row_content(i: int) -> str:
    if i % 997 == 0:
        return ""  # empty docs exercise N-counting (app/InvertedIndex.py:34)
    if i % 500 == 499:
        return _row_content(i - 1)  # duplicate-content rows (sha256 dedup visibility)
    rng = np.random.default_rng(_SEED0 + i)
    n_tokens = int(rng.integers(50, 400)) if i % 17 else int(rng.integers(400, 2000))
    # Zipfian keyword choice — rank ~ zipf
    kw_idx = np.minimum(rng.zipf(1.3, size=n_tokens // 2) - 1, len(_KEYWORDS) - 1)
    kws = [_KEYWORDS[k] for k in kw_idx]
    n_id = n_tokens // 4
    heads = rng.integers(0, len(_IDENT_HEADS), n_id)
    tails = rng.integers(0, len(_IDENT_TAILS), n_id)
    snake = rng.random(n_id) < 0.5
    idents = [
        f"{_IDENT_HEADS[h]}_{_IDENT_TAILS[t].lower()}" if s else f"{_IDENT_HEADS[h]}{_IDENT_TAILS[t]}"
        for h, t, s in zip(heads, tails, snake)
    ]
    eng_idx = rng.integers(0, len(_ENGLISH), n_tokens - len(kws) - n_id)
    eng = [_ENGLISH[e] for e in eng_idx]
    mids = [_MID_POOL[m] for m in rng.integers(0, len(_MID_POOL), max(2, n_tokens // 40))]
    projs = [_PROJ_POOL[p] for p in rng.integers(0, len(_PROJ_POOL), 3)]
    rares = [
        "".join(chr(97 + c) for c in row) for row in rng.integers(0, 26, size=(3, 8))
    ]
    toks = kws + idents + eng + mids + projs + rares
    order = rng.permutation(len(toks))
    return " ".join(toks[j] for j in order)


def _gen_rows(lo: int, hi: int) -> pd.DataFrame:
    idx = np.arange(lo, hi)
    ext = [_EXTS[int(i) % len(_EXTS)] for i in idx]
    return pd.DataFrame(
        {
            "repo": [f"org{i % 7}/repo{i % 23}" for i in idx],
            "path": [f"src/mod{i % 13}/file{i}.{e[0]}" for i, e in zip(idx, ext)],
            "commit": [f"{(i * 2654435761) % (1 << 60):015x}a" for i in idx],
            "lang": [e[1] for e in ext],
            "content": [_row_content(int(i)) for i in idx],
        }
    )


def synthetic_code_corpus(
    spark: SparkSession, n_rows: int = 2000, n_partitions: int = 32,
    with_doc_id: bool = False,
) -> DataFrame:
    """Distributed deterministic corpus: content(i) is a pure function of i.

    ``with_doc_id=True`` emits the row index as ``doc_id`` — the
    ingest-time id assignment a production pipeline would persist in the
    Iceberg table (row order == (repo,path,commit) order is NOT implied;
    ids are simply stable)."""

    from pyfusedb_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    schema = CORPUS_SCHEMA
    if with_doc_id:
        schema = T.StructType(
            list(CORPUS_SCHEMA.fields) + [T.StructField("doc_id", T.LongType(), False)]
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            if len(ids):
                # spark.range partitions are contiguous ascending slices
                out = _gen_rows(int(ids[0]), int(ids[-1]) + 1)
                if with_doc_id:
                    out["doc_id"] = np.arange(int(ids[0]), int(ids[-1]) + 1, dtype=np.int64)
                yield out

    rng = spark.range(0, n_rows, 1, n_partitions)
    return rng.mapInPandas(gen, schema=schema)


_M64 = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix):
    component (i, j) of a synthetic embedding is a pure function of
    i * dim + j, so generation is distributed and partition-invariant
    exactly like the code corpus above."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & _M64
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & _M64
    return x ^ (x >> 31)


def synthetic_embeddings(
    spark: SparkSession, n_vecs: int, dim: int = 64, n_partitions: int = 32,
    dup_every: int = 50, dup_noise: float = 0.1,
) -> DataFrame:
    """Deterministic unit-vector table ``(vec_id, embedding)`` matching the
    testdata embeddings schema, at any scale.

    Every ``dup_every``-th id (i % dup_every == 1) is a planted near-
    duplicate of its predecessor — ``normalize((1-eps)*e(i-1) + eps*r(i))``
    with eps = ``dup_noise`` — so embedding-dedup and ANN recall keep a
    known positive class at every scale (random 64-d unit vectors are
    otherwise near-orthogonal and dedup would trivially return zero)."""
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.DoubleType(), False), False),
        ]
    )

    def _raw(ids: np.ndarray) -> np.ndarray:
        # (len(ids), dim) uniform [-1, 1) from splitmix64(i * dim + j)
        keys = ids[:, None].astype(np.uint64) * np.uint64(dim) + np.arange(
            dim, dtype=np.uint64
        )
        return (_splitmix64(keys).astype(np.float64) / 2.0**64) * 2.0 - 1.0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            if not len(ids):
                continue
            v = _raw(ids)
            if dup_every:
                is_dup = (ids % dup_every == 1) & (ids > 0)
                if is_dup.any():
                    prev = _raw(ids[is_dup] - 1)
                    v[is_dup] = (1.0 - dup_noise) * prev + dup_noise * v[is_dup]
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(v)})

    return spark.range(0, n_vecs, 1, n_partitions).mapInPandas(gen, schema=schema)


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver testdata documents table (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

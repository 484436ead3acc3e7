"""pyfusedb_spark — a PySpark-native inverted-index + BM25 full-text engine.

A from-scratch rebuild of the *capabilities* of kaloslazo/PyFuseDB
(reference, read-only at /root/reference) on idiomatic Spark:

- tokenization / term-frequency extraction / sha256 hashing as vectorized
  pandas (Arrow) UDFs — no per-row Python in the hot path,
- posting-list construction with ``groupBy(...).applyInPandas`` partitioned
  by deterministic doc-id-range buckets (the skew "salt"),
- delta-encoded docID gaps + varint payload blocks with block-max metadata,
- BM25 / TF-IDF-cosine top-k with block-max WAND pruning,
- Iceberg-style segment manifests with atomic snapshot commits (resume),
- a toy SQL front-end mirroring the reference grammar
  (``SELECT f1,f2 FROM t LIKE free text LIMIT n``).

Reference lifecycle being re-expressed (citations into /root/reference):
build: ``app/InvertedIndexFinal.py:254-346`` (SPIMI build + k-way merge);
query: ``app/InvertedIndexFinal.py:348-425`` (TF-IDF cosine top-k);
SQL:   ``app/SqlParser.py:8-54`` + ``app/DataLoader.py:128-179``.
"""

__version__ = "0.1.0"

from pyfusedb_spark.analysis import Analyzer  # noqa: F401

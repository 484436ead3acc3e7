"""Single-process correctness oracle: reference-semantics inverted index.

Implements the surveyed semantics of /root/reference (SURVEY.md §2.8,
canonical choices):

- in-memory inverted index {term: [(doc_id, tf), ...]} as built by
  ``app/InvertedIndex.py:31-66`` / ``app/InvertedIndexFinal.py:152-170``;
- duplicate-doc tf folding on merge (v2 semantics,
  ``app/InvertedIndexFinal.py:240-244``);
- EXACT document norms computed from the final merged index (v1 semantics,
  ``app/InvertedIndex.py:408-419``; the v2 build-time approximation at
  ``app/InvertedIndexFinal.py:160-167`` is order-dependent and NOT
  reproduced);
- TF-IDF log weighting w(tf, df) = (1 + log10 tf) * log10(N / df)
  (``app/InvertedIndex.py:400-404``) and cosine scoring with doc & query
  norms (``app/InvertedIndex.py:334-386``);
- BM25 (absent in the reference; north-rule spec, SURVEY.md §R4):
  idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
  score += idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl));
- doc_count N counts ALL input docs including empty ones
  (``app/InvertedIndex.py:34``);
- total tie order (-score, doc_id) (reference leaves ties to dict
  insertion order — unspecified; we pin the oracle order).

Pure Python + math. No Spark, no numpy. The Spark engine must be
rank-identical to this oracle (pytest gate, SURVEY.md §7.5).
"""

from __future__ import annotations

import math
from collections import defaultdict
from collections.abc import Iterable

from pyfusedb_spark.analysis import Analyzer

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def tfidf_weight(tf: float, df: int, n_docs: int) -> float:
    """lnc-style log weight, ``app/InvertedIndex.py:400-404``."""
    if tf <= 0 or df <= 0 or n_docs <= 0:
        return 0.0
    return (1.0 + math.log10(tf)) * math.log10(n_docs / df)


def bm25_idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_partial(tf: float, dl: float, avgdl: float, k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> float:
    """The doc-dependent factor of the BM25 term score (idf excluded)."""
    denom = tf + k1 * (1.0 - b + b * (dl / avgdl if avgdl > 0 else 0.0))
    return tf * (k1 + 1.0) / denom if denom > 0 else 0.0


class OracleIndex:
    """Reference-semantics in-memory index + scorers."""

    def __init__(self, analyzer: Analyzer | None = None, k1: float = K1_DEFAULT, b: float = B_DEFAULT):
        self.analyzer = analyzer or Analyzer("english")
        self.k1 = k1
        self.b = b
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doc_len: dict[int, int] = {}
        self.n_docs = 0
        self.avgdl = 0.0
        self.norms: dict[int, float] = {}

    # -- build ------------------------------------------------------------
    def build(self, docs: Iterable[str] | Iterable[tuple[int, str]]) -> "OracleIndex":
        """Build from an iterable of contents (doc_id = position) or
        (doc_id, content) pairs. Mirrors build_index
        (``app/InvertedIndexFinal.py:254-285``) + merge
        (``:287-346``) semantics, collapsed into one pass."""
        acc: dict[str, dict[int, int]] = defaultdict(dict)
        n = 0
        total_len = 0
        for item in docs:
            if isinstance(item, tuple):
                doc_id, content = item
            else:
                doc_id, content = n, item
            n += 1
            tfs = self.analyzer.term_freqs(content if content is not None else "")
            dl = sum(tfs.values())
            self.doc_len[doc_id] = dl
            total_len += dl
            for term, tf in tfs.items():
                # duplicate doc_ids fold by summing (v2 merge semantics)
                acc[term][doc_id] = acc[term].get(doc_id, 0) + tf
        self.n_docs = n
        self.avgdl = (total_len / n) if n else 0.0
        self.postings = {
            term: sorted(docmap.items()) for term, docmap in sorted(acc.items())
        }
        # exact norms from the FINAL merged index (v1 semantics)
        sq = defaultdict(float)
        for term, plist in self.postings.items():
            df = len(plist)
            for doc_id, tf in plist:
                w = tfidf_weight(tf, df, self.n_docs)
                sq[doc_id] += w * w
        self.norms = {d: math.sqrt(v) for d, v in sq.items()}
        return self

    # -- stats ------------------------------------------------------------
    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def vocabulary(self) -> list[str]:
        return list(self.postings.keys())

    # -- scoring ----------------------------------------------------------
    def search_tfidf(self, query: str, top_k: int = 10) -> list[tuple[int, float]]:
        """Cosine-normalized TF-IDF ranked retrieval, v1 exact semantics
        (``app/InvertedIndex.py:334-386``). OR semantics across terms."""
        q_tfs = self.analyzer.preprocess_query(query)
        if not q_tfs:
            return []
        scores: dict[int, float] = defaultdict(float)
        q_sq = 0.0
        for term, q_tf in sorted(q_tfs.items()):
            plist = self.postings.get(term)
            if not plist:
                continue  # skip absent terms (app/InvertedIndex.py:357-359)
            df = len(plist)
            w_tq = tfidf_weight(q_tf, df, self.n_docs)
            q_sq += w_tq * w_tq
            for doc_id, tf in plist:
                scores[doc_id] += tfidf_weight(tf, df, self.n_docs) * w_tq
        if not scores:
            return []
        q_norm = math.sqrt(q_sq)
        out = []
        for doc_id, s in scores.items():
            d_norm = self.norms.get(doc_id, 0.0) or 1.0  # zero-norm -> 1
            denom = d_norm * q_norm
            out.append((doc_id, s / denom if denom > 0 else 0.0))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:top_k]

    def search_bm25(
        self, query: str, top_k: int = 10, conjunctive: bool = False
    ) -> list[tuple[int, float]]:
        """BM25 top-k per the north-rule spec (SURVEY.md §R4).

        OR semantics by default; ``conjunctive=True`` keeps only docs
        matching ALL query terms present in the index (J3 AND mode)."""
        q_tfs = self.analyzer.preprocess_query(query)
        if not q_tfs:
            return []
        scores: dict[int, float] = defaultdict(float)
        hits: dict[int, int] = defaultdict(int)
        n_terms_present = 0
        for term, q_tf in sorted(q_tfs.items()):
            plist = self.postings.get(term)
            if not plist:
                continue
            n_terms_present += 1
            idf = bm25_idf(len(plist), self.n_docs)
            for doc_id, tf in plist:
                dl = self.doc_len.get(doc_id, 0)
                # query tf weighting: repeated query terms scale linearly
                scores[doc_id] += q_tf * idf * bm25_partial(tf, dl, self.avgdl, self.k1, self.b)
                hits[doc_id] += 1
        if conjunctive:
            if n_terms_present < len(q_tfs):
                return []  # some term matches nothing -> AND fails everywhere
            scores = {d: s for d, s in scores.items() if hits[d] == n_terms_present}
        out = sorted(scores.items(), key=lambda x: (-x[1], x[0]))
        return out[:top_k]

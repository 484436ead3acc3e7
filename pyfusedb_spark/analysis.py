"""Shared text-analysis module: tokenizer, stopwords, stemming, query prep.

This module is imported by BOTH the Spark UDFs (executor side) and the
pure-Python correctness oracle (``pyfusedb_spark.oracle``), guaranteeing
byte-identical analyzer semantics on both sides (SURVEY.md §7.4/§7.5).

Reference semantics being re-expressed (/root/reference, citations):
- pipeline order lowercase → tokenize → stopword-filter → punct-strip →
  stem: ``app/TextPreProcess.py:41-51``;
- query preprocessing with per-term frequency and len>1 filter:
  ``app/TextPreProcess.py:53-68``.

Deviations (declared engine semantics, SURVEY.md §7.5): the tokenizer is a
deterministic regex (``[a-z0-9_]+`` on lowercased text) instead of nltk
Punkt (not available, not reproducible on executors); the len>1 filter is
applied on BOTH index and query sides so the index and query vocabularies
coincide; the stemmer is our vendored Porter2 (``pyfusedb_spark.porter2``).

NO Spark imports here — keep it importable everywhere.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from pyfusedb_spark import porter2

# Classic public English stopword list (NLTK corpus list, public knowledge).
# The reference ships a 430-word stoplist (app/data/stopList.txt); we pin our
# own frozen list so engine and oracle SQL share one source of truth.
STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
)
STOPWORD_SET = frozenset(STOPWORDS)

# The engine token pattern. Identical regex semantics in Python `re`,
# Java regex (Spark regexp_extract_all) and RE2 (DuckDB regexp_extract_all):
# plain character class + quantifier, no lookaround.
TOKEN_PATTERN = r"[a-z0-9_]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Code-mode: split identifiers on camelCase / snake_case boundaries too.
_CAMEL_RE = re.compile(r"[A-Z]+(?=[A-Z][a-z])|[A-Z]?[a-z]+|[A-Z]+|[0-9]+")


@dataclass(frozen=True)
class AnalyzerConfig:
    """Declarative analyzer configuration (presets below)."""

    lowercase: bool = True
    min_token_len: int = 2
    remove_stopwords: bool = True
    stem: bool = True
    split_identifiers: bool = False
    stopwords: frozenset[str] = field(default=STOPWORD_SET)


PRESETS: dict[str, AnalyzerConfig] = {
    # Reference-compatible English pipeline (stemmed) — used for golden-df
    # replay and the pytest rank-identity oracle.
    "english": AnalyzerConfig(stem=True),
    # SQL-oracle-expressible pipeline (no stemming — DuckDB 1.0.0 in this
    # sandbox has no stem()): lowercase → [a-z0-9_]+ → len>1 → stop-filter.
    "simple": AnalyzerConfig(stem=False),
    # Code corpus: keep stopword-like language keywords, split identifiers.
    "code": AnalyzerConfig(stem=False, remove_stopwords=False, split_identifiers=True),
}


class Analyzer:
    """content -> list of index terms. Deterministic, pure Python."""

    def __init__(self, preset: str = "english", config: AnalyzerConfig | None = None):
        self.preset = preset
        self.config = config or PRESETS[preset]
        # memo-cache for stemming: vocabulary is Zipfian, terms repeat heavily
        self._stem_cache: dict[str, str] = {}

    def tokenize(self, text: str) -> list[str]:
        cfg = self.config
        if cfg.split_identifiers:
            raw = _CAMEL_RE.findall(text)
            toks = [t.lower() for t in raw]
        else:
            toks = _TOKEN_RE.findall(text.lower() if cfg.lowercase else text)
        return toks

    def analyze(self, text: str) -> list[str]:
        """Full pipeline: tokenize → stop-filter → len-filter → stem."""
        cfg = self.config
        toks = self.tokenize(text)
        if cfg.remove_stopwords:
            sw = cfg.stopwords
            toks = [t for t in toks if t not in sw]
        if cfg.min_token_len > 1:
            m = cfg.min_token_len
            toks = [t for t in toks if len(t) >= m]
        if cfg.stem:
            cache = self._stem_cache
            out = []
            for t in toks:
                s = cache.get(t)
                if s is None:
                    s = porter2.stem(t)
                    cache[t] = s
                out.append(s)
            toks = out
        return toks

    def term_freqs(self, text: str) -> dict[str, int]:
        """Per-document term-frequency map (A1 in SURVEY.md §2.4)."""
        return dict(Counter(self.analyze(text)))

    def preprocess_query(self, text: str) -> dict[str, int]:
        """Query analysis — same pipeline, returns {term: query_tf}.

        Mirrors ``app/TextPreProcess.py:53-68`` (len>1 filter included).
        """
        return self.term_freqs(text)


def sql_token_expr(column: str) -> str:
    """DuckDB/Spark-SQL expression producing this module's 'simple' tokens.

    Both DuckDB 1.0.0 and Spark 4.x support
    ``regexp_extract_all(lower(col), '[a-z0-9_]+')`` with identical
    semantics for this pattern; length and stopword filtering are applied
    by callers via list/array functions.
    """
    return f"regexp_extract_all(lower({column}), '{TOKEN_PATTERN}')"


def sql_stopword_list() -> str:
    """SQL literal list of stopwords, for IN (...) filters in oracle SQL."""
    quoted = ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS)
    return f"({quoted})"

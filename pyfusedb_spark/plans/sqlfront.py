"""Toy SQL surface: ``SELECT f1,f2 FROM t LIKE|LIKETO <free text> [LIMIT n]``.

Re-expresses the reference's whitespace-split parser
(``SqlParser.parseQuery``, ``app/SqlParser.py:8-54``) and the
``executeQuery`` orchestration (``app/DataLoader.py:128-179``):

- everything lowercased; parse errors fall back to
  ``{fields: ['*'], table: <default>, like_term: None}`` (``SqlParser.py:46-54``);
- ``*`` expands to all corpus columns (``DataLoader.py:142-147``);
- friendly-name aliases map to physical columns (``DataLoader.py:133-139``);
- unknown fields project as the literal ``'N/A'`` (``DataLoader.py:170-171``);
- no-LIKE queries return the first ``min(topK, N)`` rows with score 1.0
  (``DataLoader.py:152-153``);
- ``LIMIT n`` caps top-k (``SqlParser.py:27-30``, UI cap ``GradioUI.py:208-214``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyfusedb_spark.operators.query import FuseIndex


@dataclass
class ParsedQuery:
    fields: list[str] = field(default_factory=lambda: ["*"])
    table: str = "files"
    like_term: str | None = None
    limit: int | None = None
    error: str | None = None


def parse_query(query: str, default_table: str = "files") -> ParsedQuery:
    """Whitespace-split toy grammar, reference semantics."""
    default = ParsedQuery(table=default_table)
    try:
        tokens = query.strip().lower().split()
        if not tokens or tokens[0] != "select":
            return default
        idx_from = tokens.index("from")
        fields_raw = " ".join(tokens[1:idx_from])
        fields = [f.strip() for f in fields_raw.split(",") if f.strip()]
        rest = tokens[idx_from + 1:]
        if not rest:
            return default
        table = rest[0]
        like_term = None
        limit = None
        if len(rest) > 1 and rest[1] in ("like", "liketo"):
            span = rest[2:]
            if "limit" in span:
                li = span.index("limit")
                if li + 1 < len(span):
                    try:
                        limit = int(span[li + 1])
                    except ValueError:
                        limit = None
                    if limit is not None and limit < 0:
                        limit = None  # negative LIMIT: ignore the clause
                span = span[:li]
            like_term = " ".join(span) if span else None
        elif "limit" in rest:
            # no-LIKE queries honor a trailing LIMIT too (the reference
            # parser only uses 'limit' as a like-term terminator and
            # drops the number, app/SqlParser.py:26-30 — we keep it)
            li = rest.index("limit")
            if li + 1 < len(rest):
                try:
                    limit = int(rest[li + 1])
                except ValueError:
                    limit = None
                if limit is not None and limit < 0:
                    limit = None  # negative LIMIT: ignore the clause
        return ParsedQuery(fields=fields or ["*"], table=table, like_term=like_term, limit=limit)
    except (ValueError, IndexError):
        return default


def dedup_max_score(df: DataFrame, keys: list[str]) -> DataFrame:
    """P4/P5 (SURVEY.md §2.2): keep the max-score row per key tuple
    (reference: insertion-ordered seen-set ``app/DataLoader.py:160-177``
    and UI-level max-score dedup ``app/GradioUI.py:82-95``)."""
    w = Window.partitionBy(*keys).orderBy(F.desc("score"), F.asc("doc_id"))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


class FuseSession:
    """Engine façade: ``Session.sql(query, top_k)`` → DataFrame.

    The flagship lifecycle (SURVEY.md §3 EP1): parse → alias-bind →
    BM25/TF-IDF top-k via the index → broadcast join back to the corpus →
    project fields (unknown → 'N/A')."""

    def __init__(
        self,
        corpus: DataFrame,
        index: FuseIndex,
        id_col: str = "doc_id",
        alias_map: dict[str, str] | None = None,
        default_table: str = "files",
    ):
        self.corpus = corpus
        self.index = index
        self.id_col = id_col
        self.alias_map = alias_map or {}
        self.default_table = default_table

    def sql(
        self,
        query: str,
        top_k: int = 10,
        mode: str = "bm25",
        conjunctive: bool = False,
        distributed: bool = False,
    ) -> DataFrame:
        spark = self.index.spark
        parsed = parse_query(query, self.default_table)
        fields = self._expand_fields(parsed.fields)
        # LIMIT 0 is honored as "zero rows" (explicit, not falsy-dropped);
        # negative limits were already discarded by the parser
        k = min(top_k, parsed.limit) if parsed.limit is not None else top_k

        if parsed.like_term is None:
            # Q4: no-search fallback — first min(k, N) rows, score 1.0
            base = self.corpus.orderBy(F.asc(self.id_col)).limit(min(k, self.index.n_docs))
            return self._project(base.withColumn("score", F.lit(1.0)), fields)

        if k <= 0:  # LIMIT 0: empty result, skip the search entirely
            empty = spark.createDataFrame([], schema="doc_id long, score double")
            return self._project(
                self.corpus.join(
                    empty.withColumnRenamed("doc_id", self.id_col), self.id_col
                ),
                fields,
            )

        if distributed:
            results = self.index.search_distributed(parsed.like_term, k, mode, conjunctive)
        else:
            hits = self.index.search(parsed.like_term, k, mode, conjunctive)
            results = spark.createDataFrame(
                [(int(d), float(s)) for d, s in hits], schema="doc_id long, score double"
            )
        joined = self.corpus.join(
            F.broadcast(results.withColumnRenamed("doc_id", self.id_col)), self.id_col
        )
        return self._project(joined, fields)

    def _expand_fields(self, fields: list[str]) -> list[str]:
        if any(f == "*" for f in fields):
            return [c for c in self.corpus.columns]
        return [self.alias_map.get(f, f) for f in fields]

    def _project(self, df: DataFrame, fields: list[str]) -> DataFrame:
        cols = [F.col(self.id_col)]
        for f in fields:
            if f == self.id_col:
                continue
            if f in df.columns:
                cols.append(F.col(f))
            else:
                cols.append(F.lit("N/A").alias(f))  # DataLoader.py:170-171
        cols.append(F.col("score"))
        return df.select(*cols).orderBy(F.desc("score"), F.asc(self.id_col))

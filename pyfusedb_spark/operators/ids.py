"""Deterministic dense doc-id assignment (SURVEY.md §7.2.3).

The reference's docID is the positional ``enumerate`` index over its
in-memory list (``app/InvertedIndexFinal.py:262``). Distributed equivalent:
total-order the corpus by a unique key, then ``zipWithIndex`` — ids are
invariant to input partitioning because the sort order is total. A global
``row_number()`` window would funnel everything through one task; this way
the id assignment stays fully parallel (zipWithIndex = per-partition count
job + offset cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ids(df: DataFrame, sort_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Return df + dense int64 ``id_col`` following the total order of
    ``sort_cols`` (which must be a unique key)."""
    ordered = df.orderBy(*[F.col(c) for c in sort_cols])
    schema = T.StructType(list(ordered.schema.fields) + [T.StructField(id_col, T.LongType(), False)])
    indexed = ordered.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    return ordered.sparkSession.createDataFrame(indexed, schema)

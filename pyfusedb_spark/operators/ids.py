"""Deterministic dense doc-id assignment (SURVEY.md §7.2.3).

The reference's docID is the positional ``enumerate`` index over its
in-memory list (``app/InvertedIndexFinal.py:262``). Distributed
equivalent: doc_id = global rank in the total order of a unique sort
key. Implementation is Arrow-native (a Python-pickle ``zipWithIndex``
round-trip measured ~2x slower on the tokenize stage):

1. ``repartitionByRange(sort_cols) + sortWithinPartitions`` — one range
   shuffle, totally ordered across partitions;
2. one light count job for per-partition sizes -> offset cumsum on the
   driver (tiny);
3. ``mapInPandas`` stamps ``offset[pid] + local position`` (narrow,
   order-preserving, zero Python-per-row).

Ids equal the global rank, so they are invariant to the input
partitioning and to the range-sampler's boundary choices — as long as
the sort key is unique (enforced by callers: (repo, path, commit)).

A global ``row_number()`` window would funnel everything through one
task; this stays fully parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ids(
    df: DataFrame,
    sort_cols: list[str],
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Return df + dense int64 ``id_col`` = rank in the total order of
    ``sort_cols`` (must be a unique key).

    If df ALREADY has an ``id_col`` column (a corpus with its own doc_id
    that the caller chose not to trust via doc_id_col), the fresh ranks
    REPLACE it in place — appending used to produce two ``doc_id``
    attributes and an AMBIGUOUS_REFERENCE at the very next select. The
    stale column still participates in ``sort_cols`` if listed there.

    The returned DataFrame is backed by a persisted sorted intermediate
    (exposed as ``._pyfusedb_cache`` for the caller to unpersist)."""
    from pyfusedb_spark.shipping import ensure_shipped

    spark = df.sparkSession
    ensure_shipped(spark)
    p = num_partitions or spark.sparkContext.defaultParallelism
    sorted_df = (
        df.repartitionByRange(p, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*[F.col(c) for c in sort_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {int(r["_pid"]): int(r["n"]) for r in
              sorted_df.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)
    id_field = T.StructField(id_col, T.LongType(), False)
    if id_col in df.columns:
        out_schema = T.StructType(
            [id_field if f.name == id_col else f for f in df.schema.fields]
        )
    else:
        out_schema = T.StructType([*df.schema.fields, id_field])
    cols = [f.name for f in df.schema.fields]

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = bc.value[int(pdf["_pid"].iloc[0])]
            out = pdf[cols].copy()
            out[id_col] = np.arange(base + local, base + local + len(pdf), dtype=np.int64)
            local += len(pdf)
            yield out

    out = sorted_df.mapInPandas(stamp, out_schema)
    out._pyfusedb_cache = sorted_df  # caller may unpersist when done
    out._pyfusedb_n_rows = acc  # row count came free from the offset job
    return out

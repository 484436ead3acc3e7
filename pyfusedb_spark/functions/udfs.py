"""Vectorized pandas/Arrow UDFs for the index pipeline (SURVEY.md §2.10).

Everything here is Arrow-batched: tokenization + per-doc term-frequency
counting happen in ONE pass inside a scalar pandas UDF (map-side partial
aggregation before any shuffle — A1/A2 in SURVEY.md §2.4), and posting
encoding happens partition-wise inside ``mapInPandas`` with numpy-
vectorized codecs. No row-at-a-time Python UDFs anywhere
(BASELINE.json:input_hint "no per-row Python").
"""

from __future__ import annotations

import time
from collections import Counter
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from pyfusedb_spark.analysis import Analyzer
from pyfusedb_spark.functions import codec

# per-executor analyzer cache (stem memoization survives across batches)
_ANALYZERS: dict[str, Analyzer] = {}


def _get_analyzer(preset: str) -> Analyzer:
    az = _ANALYZERS.get(preset)
    if az is None:
        az = Analyzer(preset)
        _ANALYZERS[preset] = az
    return az


def term_freqs_udf(preset: str):
    """content -> map<term, tf>. One Arrow pass, counting in the UDF so the
    shuffle carries distinct-terms-per-doc, not raw token streams."""

    @pandas_udf(T.MapType(T.StringType(), T.IntegerType()))
    def term_freqs(contents: pd.Series) -> pd.Series:
        az = _get_analyzer(preset)
        analyze = az.analyze
        return pd.Series(
            [dict(Counter(analyze(c or ""))) for c in contents.tolist()],
            index=contents.index,
        )

    return term_freqs


TF_ROW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("doc_len", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)


def make_tf_exploder(preset: str, bucket_span: int, content_col: str = "content"):
    """mapInPandas fn: corpus rows -> long-format (doc_id, doc_len,
    bucket, term, tf) rows in ONE Arrow pass.

    This deliberately bypasses a map<term,tf> intermediate column: the
    MapType round-trip (Arrow -> JVM MapData -> explode, worse with a
    persist) measured ~2-3x slower than emitting the exploded frame
    straight from pandas; numpy `repeat` does the fan-out vectorized.
    Docs with zero terms emit no rows (doc_stats assembly left-joins
    them back with doc_len=0 — N counts empty docs,
    app/InvertedIndex.py:34)."""

    def explode_tf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        az = _get_analyzer(preset)
        analyze = az.analyze
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            counters = [Counter(analyze(c or "")) for c in pdf[content_col].tolist()]
            lens = np.fromiter((sum(c.values()) for c in counters), np.int64, len(counters))
            reps = np.fromiter((len(c) for c in counters), np.int64, len(counters))
            rep_ids = np.repeat(ids, reps)
            yield pd.DataFrame(
                {
                    "doc_id": rep_ids,
                    "doc_len": np.repeat(lens, reps),
                    "bucket": (rep_ids // bucket_span).astype(np.int32),
                    "term": [t for c in counters for t in c.keys()],
                    "tf": np.fromiter(
                        (v for c in counters for v in c.values()),
                        np.int32,
                        int(reps.sum()),
                    ),
                }
            )

    return explode_tf


def tokens_udf(preset: str):
    """content -> array<string> of analyzed terms (F5 in SURVEY.md §2.3)."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def tokens(contents: pd.Series) -> pd.Series:
        az = _get_analyzer(preset)
        analyze = az.analyze
        return pd.Series([analyze(c or "") for c in contents.tolist()], index=contents.index)

    return tokens


# --------------------------------------------------------------------------
# Posting-chunk encoder (mapInPandas over term-sorted partitions)
# --------------------------------------------------------------------------

CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df_chunk", T.LongType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("block_offsets", T.ArrayType(T.LongType()), False),
        T.StructField("block_first", T.ArrayType(T.LongType()), False),
        T.StructField("block_last", T.ArrayType(T.LongType()), False),
        T.StructField("block_max_partial", T.ArrayType(T.FloatType()), False),
        T.StructField("max_partial", T.FloatType(), False),
        T.StructField("enc_micros", T.LongType(), False),
    ]
)


def make_chunk_encoder(avgdl: float, k1: float, b: float, block_size: int):
    """Returns a mapInPandas function encoding (term, doc_id, tf, doc_len)
    rows — REQUIRED sorted by (term, doc_id) within the partition — into
    one encoded chunk row per term.

    Handles record-batch boundaries splitting a term by carrying the tail
    group over to the next batch (mapInPandas preserves in-partition order).
    """

    def encode_terms(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["doc_len"].to_numpy(dtype=np.int64)
        uniq, starts = np.unique(terms, return_index=True)
        order = np.argsort(starts)  # np.unique sorts terms; recover stream order
        starts = starts[order]
        uniq = uniq[order]
        bounds = np.append(starts, len(terms))
        rows = []
        for ti in range(len(uniq)):
            lo, hi = bounds[ti], bounds[ti + 1]
            d, t, l = doc_ids[lo:hi], tfs[lo:hi], dls[lo:hi]
            # fold duplicate doc_ids by summing tf (v2 merge semantics,
            # app/InvertedIndexFinal.py:240-244); doc_len is per-doc constant
            ud, first_idx = np.unique(d, return_index=True)
            if len(ud) != len(d):
                seg = np.searchsorted(d, ud)
                t = np.add.reduceat(t, seg)
                l = l[first_idx]
                d = ud
            chunk = codec.encode_postings(d, t, l, avgdl, k1, b, block_size)
            micros = int((time.perf_counter() - t0) * 1e6)
            rows.append(
                (
                    uniq[ti],
                    int(len(d)),
                    int(t.sum()),
                    chunk.payload,
                    chunk.block_offsets.tolist(),
                    chunk.block_first.tolist(),
                    chunk.block_last.tolist(),
                    chunk.block_max_partial.tolist(),
                    chunk.max_partial,
                    micros,
                )
            )
            t0 = time.perf_counter()
        return pd.DataFrame(
            rows,
            columns=[f.name for f in CHUNK_SCHEMA.fields],
        )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: pd.DataFrame | None = None
        for batch in batches:
            if leftover is not None and len(leftover):
                batch = pd.concat([leftover, batch], ignore_index=True)
                leftover = None
            if not len(batch):
                continue
            terms = batch["term"].to_numpy()
            last_term = terms[-1]
            cut = np.searchsorted(terms, last_term, side="left")
            # hold back the (possibly incomplete) last term group
            leftover = batch.iloc[cut:]
            complete = batch.iloc[:cut]
            if len(complete):
                yield encode_terms(complete)
        if leftover is not None and len(leftover):
            yield encode_terms(leftover)

    return mapper


CHUNK_SCHEMA_BUCKETED = T.StructType(
    [T.StructField("bucket", T.IntegerType(), False)] + list(CHUNK_SCHEMA.fields)
)

_GK_SEP = "\x1f"


def make_grouped_chunk_encoder(avgdl: float, k1: float, b: float, block_size: int):
    """Single-pass variant: input rows carry ``gkey = term\\x1fbucket``
    and are sorted by (gkey, doc_id) within the partition; output adds
    the bucket column so one job can write every bucket directory
    (write.partitionBy('bucket')). Carry-over across record batches works
    exactly as in make_chunk_encoder."""

    def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.perf_counter()
        gkeys = pdf["gkey"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["doc_len"].to_numpy(dtype=np.int64)
        uniq, starts = np.unique(gkeys, return_index=True)
        order = np.argsort(starts)
        starts = starts[order]
        uniq = uniq[order]
        bounds = np.append(starts, len(gkeys))
        rows = []
        for gi in range(len(uniq)):
            lo, hi = bounds[gi], bounds[gi + 1]
            term, bucket = uniq[gi].rsplit(_GK_SEP, 1)
            d, t, l = doc_ids[lo:hi], tfs[lo:hi], dls[lo:hi]
            ud, first_idx = np.unique(d, return_index=True)
            if len(ud) != len(d):
                seg = np.searchsorted(d, ud)
                t = np.add.reduceat(t, seg)
                l = l[first_idx]
                d = ud
            chunk = codec.encode_postings(d, t, l, avgdl, k1, b, block_size)
            micros = int((time.perf_counter() - t0) * 1e6)
            rows.append(
                (
                    int(bucket),
                    term,
                    int(len(d)),
                    int(t.sum()),
                    chunk.payload,
                    chunk.block_offsets.tolist(),
                    chunk.block_first.tolist(),
                    chunk.block_last.tolist(),
                    chunk.block_max_partial.tolist(),
                    chunk.max_partial,
                    micros,
                )
            )
            t0 = time.perf_counter()
        return pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA_BUCKETED.fields])

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: pd.DataFrame | None = None
        for batch in batches:
            if leftover is not None and len(leftover):
                batch = pd.concat([leftover, batch], ignore_index=True)
                leftover = None
            if not len(batch):
                continue
            gkeys = batch["gkey"].to_numpy()
            last = gkeys[-1]
            cut = np.searchsorted(gkeys, last, side="left")
            leftover = batch.iloc[cut:]
            complete = batch.iloc[:cut]
            if len(complete):
                yield encode_groups(complete)
        if leftover is not None and len(leftover):
            yield encode_groups(leftover)

    return mapper


def sha256_col(col: str = "content"):
    """F8 (SURVEY.md §2.3): per-row sha256 content hash — pure built-in
    (JVM-side, codegen), matching DuckDB's sha256() on UTF-8 bytes."""
    return F.sha2(F.col(col), 256)

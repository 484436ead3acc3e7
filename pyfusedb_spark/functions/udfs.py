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


_MAX_RUN = 1024  # max postings per packed run row (bounds reader memory)

PACKED_TF_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("docs", T.ArrayType(T.LongType()), False),
        T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
        T.StructField("dls", T.ArrayType(T.IntegerType()), False),
    ]
)


def make_packed_tf_exploder(preset: str, bucket_span: int, content_col: str = "content"):
    """mapInArrow fn: corpus rows -> PACKED per-(term,bucket) partial
    posting runs, one row per distinct (term, bucket) per Arrow batch.

    This is the SPIMI map-side partial posting list (north star: partial
    lists built BEFORE the repartition-by-term shuffle): the shuffle then
    carries ~|batch vocabulary| packed rows instead of one row per
    posting — long-tail terms cost the same, but every mid/hot term
    collapses its per-batch postings into three packed int arrays and
    ONE term string. Term grouping uses pd.factorize (hash, O(n)) + an
    integer lexsort — no string sort. Output is built as Arrow
    ListArrays from flat buffers (a pandas frame of per-cell numpy
    arrays measured ~2x slower to serialize).

    Runs are capped at _MAX_RUN postings: a hot term would otherwise
    pack a whole Arrow batch into ONE giant cell, blowing up the
    vectorized parquet reader's per-batch memory downstream (seen as
    JVM OOM at 65536-doc batches). The encoder merges multiple runs
    per group, so splitting is free."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("term", pa.string()),
            ("bucket", pa.int32()),
            ("docs", pa.list_(pa.int64())),
            ("tfs", pa.list_(pa.int32())),
            ("dls", pa.list_(pa.int32())),
        ]
    )

    def pack(batches):
        az = _get_analyzer(preset)
        analyze = az.analyze
        for batch in batches:
            if not batch.num_rows:
                continue
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            contents = batch.column(content_col).to_pylist()
            counters = [Counter(analyze(c or "")) for c in contents]
            lens = np.fromiter((sum(c.values()) for c in counters), np.int64, len(counters))
            reps = np.fromiter((len(c) for c in counters), np.int64, len(counters))
            ntot = int(reps.sum())
            if ntot == 0:
                continue
            rep_ids = np.repeat(ids, reps)
            rep_dls = np.repeat(lens, reps).astype(np.int32)
            rep_bkt = (rep_ids // bucket_span).astype(np.int64)
            terms = np.empty(ntot, dtype=object)
            i = 0
            for c in counters:
                k = len(c)
                terms[i : i + k] = list(c.keys())
                i += k
            tfs = np.fromiter((v for c in counters for v in c.values()), np.int32, ntot)
            codes, uniq = pd.factorize(terms, sort=False)
            uniq = np.asarray(uniq, dtype=object)
            order = np.lexsort((rep_bkt, codes))  # primary: term code, secondary: bucket
            c_s = codes[order]
            b_s = rep_bkt[order]
            newg = np.empty(ntot, dtype=bool)
            newg[0] = True
            newg[1:] = (c_s[1:] != c_s[:-1]) | (b_s[1:] != b_s[:-1])
            gs = np.flatnonzero(newg)
            glens = np.diff(np.append(gs, ntot))
            big = np.flatnonzero(glens > _MAX_RUN)
            if big.size:
                extra = np.concatenate(
                    [
                        np.arange(gs[i] + _MAX_RUN, gs[i] + glens[i], _MAX_RUN)
                        for i in big
                    ]
                )
                starts_all = np.sort(np.concatenate([gs, extra]))
            else:
                starts_all = gs
            row_of = np.searchsorted(gs, starts_all, side="right") - 1
            bounds = np.append(starts_all, ntot).astype(np.int32)
            off = pa.array(bounds, type=pa.int32())
            cols = [
                pa.array(uniq[c_s[gs[row_of]]], type=pa.string()),
                pa.array(b_s[gs[row_of]].astype(np.int32), type=pa.int32()),
                pa.ListArray.from_arrays(off, pa.array(rep_ids[order], type=pa.int64())),
                pa.ListArray.from_arrays(off, pa.array(tfs[order], type=pa.int32())),
                pa.ListArray.from_arrays(off, pa.array(rep_dls[order], type=pa.int32())),
            ]
            yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    return pack


def make_packed_encoder(avgdl: float, k1: float, b: float, block_size: int):
    """mapInArrow fn merging packed runs into encoded chunks.

    Input: PACKED_TF_SCHEMA batches in ARBITRARY row order within the
    partition (the build no longer pays a JVM sortWithinPartitions on
    rows carrying fat array payloads — round-2 scaling work: the posting
    shuffle's reduce-side sort was the stage's scaling bottleneck).
    Grouping happens here instead, at Arrow/numpy speed: the term column
    is dictionary-encoded (C-speed hash), only the UNIQUE terms are
    string-sorted (|vocab_partition| << |rows|), and postings get ONE
    integer lexsort by (group_rank, doc_id). Output rows remain sorted
    by (term, bucket) so parquet row-group min/max stats stay tight for
    query-side pruning — identical on-disk layout to the sorted-input
    encoder.

    Operates on Arrow buffers directly — flat value arrays via
    ``ListArray.flatten()`` / ``value_lengths()``, output payloads as ONE
    zero-copy binary buffer. A pandas round-trip here materialized ~12M
    per-cell numpy arrays per build and dominated the stage wall.

    Flat merge: the integer lexsort is the reference's k-way heap merge
    (app/InvertedIndexFinal.py:287-346), distributed — then
    codec.encode_postings_multi for every group at once.

    Memory: materializes one shuffle partition's packed runs (bounded by
    n_shuffle sizing — see operators/build.py scale notes)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_fields = [
        ("bucket", pa.int32()),
        ("pid", pa.int32()),
        ("term", pa.string()),
        ("df_chunk", pa.int64()),
        ("sum_tf", pa.int64()),
        ("payload", pa.binary()),
        ("block_offsets", pa.list_(pa.int64())),
        ("block_first", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_partial", pa.list_(pa.float32())),
        ("max_partial", pa.float32()),
        ("enc_micros", pa.int64()),
    ]
    out_schema = pa.schema(out_fields)

    def encode_batch(batch: "pa.RecordBatch") -> "pa.RecordBatch":
        t0 = time.perf_counter()
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        term_arr = batch.column("term")
        bucket_np = np.asarray(batch.column("bucket").to_numpy(zero_copy_only=False), dtype=np.int64)
        docs_la = batch.column("docs")
        tfs_la = batch.column("tfs")
        dls_la = batch.column("dls")
        # views where possible — .astype copies unconditionally, and at
        # 32 threads on one memory controller the encoder is bandwidth-
        # bound (measured: per-core CPU inflates 1.75x going 8->32)
        run_lens = np.asarray(pc.list_value_length(docs_la).to_numpy(zero_copy_only=False))
        flat_d = np.asarray(docs_la.flatten().to_numpy(zero_copy_only=False), dtype=np.int64)
        flat_t = np.asarray(tfs_la.flatten().to_numpy(zero_copy_only=False))
        flat_l = np.asarray(dls_la.flatten().to_numpy(zero_copy_only=False))
        # group rows by (term, bucket) WITHOUT requiring sorted input:
        # dictionary-encode terms (hash, C speed), sort only the unique
        # strings, rank rows, then one integer sort over group keys.
        dict_arr = pc.dictionary_encode(
            term_arr.combine_chunks() if hasattr(term_arr, "combine_chunks") else term_arr
        )
        codes = np.asarray(dict_arr.indices.to_numpy(zero_copy_only=False))
        uniq_terms = np.asarray(dict_arr.dictionary.to_pandas(), dtype=object)
        order_u = np.argsort(uniq_terms, kind="stable")
        rank_u = np.empty(len(uniq_terms), dtype=np.int64)
        rank_u[order_u] = np.arange(len(uniq_terms))
        uniq_sorted = uniq_terms[order_u]
        kb = int(bucket_np.max()) + 1 if len(bucket_np) else 1
        g_key = rank_u[codes] * kb + bucket_np  # ascending == (term, bucket) asc
        g_sorted, g_first_row = np.unique(g_key, return_index=True)
        gidx_row = np.searchsorted(g_sorted, g_key)
        grow = g_first_row  # one representative row per group (for bucket col)
        gid_post = np.repeat(gidx_row, run_lens)
        maxd = int(flat_d.max()) if flat_d.size else 0
        if len(g_sorted) * (maxd + 1) < (1 << 62):
            # one combined integer key -> single sort pass (duplicate
            # (group, doc) keys are interchangeable: tf of dups is summed
            # below and dl is per-doc constant, so unstable sort is fine)
            order = np.argsort(gid_post * (maxd + 1) + flat_d)
        else:
            order = np.lexsort((flat_d, gid_post))
        d2, t2, l2, g2 = flat_d[order], flat_t[order], flat_l[order], gid_post[order]
        group_terms = uniq_sorted[g_sorted // kb]
        npost = len(d2)
        newp = np.empty(npost, dtype=bool)
        newp[0] = True
        newp[1:] = g2[1:] != g2[:-1]
        keep = newp.copy()
        keep[1:] |= d2[1:] != d2[:-1]
        if not keep.all():
            seg = np.cumsum(keep) - 1
            t2 = np.bincount(seg, weights=t2).astype(np.int64)
            d2, l2, newp = d2[keep], l2[keep], newp[keep]
        starts = np.flatnonzero(newp)
        enc = codec.encode_postings_multi(starts, d2, t2, l2, avgdl, k1, b, block_size, flat_only=True)
        g = enc["n_groups"]
        payload_all, byte_bounds = enc["payload_all"], enc["payload_bounds"]
        nblk = enc["n_blocks"]
        blk_bounds = np.concatenate(([0], np.cumsum(nblk))).astype(np.int32)
        micros = int((time.perf_counter() - t0) * 1e6)
        per = np.full(g, micros // g if g else 0, dtype=np.int64)
        if g:
            per[0] += micros - int(per.sum())
        # pa.binary() offsets are int32: a partition whose concatenated
        # payload exceeded 2 GiB would wrap silently into a corrupt index.
        # Cannot happen with default maxRecordsPerBatch/_MAX_RUN sizing,
        # so fail loudly instead of switching to large_binary.
        if len(byte_bounds) and int(byte_bounds[-1]) >= (1 << 31):
            raise ValueError(
                f"posting payload batch of {int(byte_bounds[-1])} bytes exceeds "
                "the 2 GiB Arrow binary offset range; lower "
                "spark.sql.execution.arrow.maxRecordsPerBatch or raise n_buckets"
            )
        payload_arr = pa.Array.from_buffers(
            pa.binary(), g,
            [None, pa.py_buffer(byte_bounds.astype(np.int32).tobytes()),
             pa.py_buffer(payload_all)],
        )

        def lst(flat_vals: np.ndarray, typ) -> pa.Array:
            return pa.ListArray.from_arrays(
                pa.array(blk_bounds, type=pa.int32()), pa.array(flat_vals, type=typ)
            )

        cols = [
            pa.array(bucket_np[grow].astype(np.int32), type=pa.int32()),
            pa.array(np.full(g, pid, dtype=np.int32), type=pa.int32()),
            pa.array(group_terms, type=pa.string()),
            pa.array(enc["df_chunk"], type=pa.int64()),
            pa.array(enc["sum_tf"], type=pa.int64()),
            payload_arr,
            lst(enc["blk_off_flat"], pa.int64()),
            lst(enc["blk_first_flat"], pa.int64()),
            lst(enc["blk_last_flat"], pa.int64()),
            lst(enc["blk_max_flat"], pa.float32()),
            pa.array(enc["max_partial"], type=pa.float32()),
            pa.array(per, type=pa.int64()),
        ]
        return pa.RecordBatch.from_arrays(cols, schema=out_schema)

    def mapper(batches):
        # materialize the partition's packed runs and encode in ONE pass:
        # grouping no longer needs runs of a term adjacent (see encode_
        # batch), so there is no carry-over bookkeeping and no upstream
        # JVM row sort. Partition size is bounded by n_shuffle sizing.
        collected = [b for b in batches if b.num_rows]
        if not collected:
            return
        if len(collected) == 1:
            yield encode_batch(collected[0])
            return
        tbl = pa.Table.from_batches(collected).combine_chunks()
        yield encode_batch(tbl.to_batches()[0])

    return mapper


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
        T.StructField("pid", T.IntegerType(), False),
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


def _encode_partition_flat(
    term: np.ndarray,
    bucket: np.ndarray | None,
    d: np.ndarray,
    t: np.ndarray,
    l: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
) -> pd.DataFrame:
    """Encode one partition's (term[,bucket],doc)-sorted rows into chunk
    rows via codec.encode_postings_multi — ONE vectorized pass for ALL
    groups (per-group numpy-call overhead dominated the stage before).

    Duplicate doc rows within a group are folded by summing tf (v2 merge
    semantics, app/InvertedIndexFinal.py:240-244) — vectorized flat.
    ``enc_micros`` is the partition's encode time spread over its groups
    (manifests only ever sum it)."""
    t0 = time.perf_counter()
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    n = len(d)
    new = np.empty(n, dtype=bool)
    new[0] = True
    if bucket is not None:
        new[1:] = (term[1:] != term[:-1]) | (bucket[1:] != bucket[:-1])
    else:
        new[1:] = term[1:] != term[:-1]
    dup = np.zeros(n, dtype=bool)
    dup[1:] = d[1:] == d[:-1]
    keep = new | ~dup
    if not keep.all():
        seg = np.cumsum(keep) - 1
        t = np.bincount(seg, weights=t).astype(np.int64)
        d, l, term, new = d[keep], l[keep], term[keep], new[keep]
        if bucket is not None:
            bucket = bucket[keep]
        n = len(d)
    starts = np.flatnonzero(new)
    enc = codec.encode_postings_multi(starts, d, t, l, avgdl, k1, b, block_size)
    g = enc["n_groups"]
    micros = int((time.perf_counter() - t0) * 1e6)
    per = np.full(g, micros // g if g else 0, dtype=np.int64)
    if g:
        per[0] += micros - int(per.sum())
    data = {
        "pid": np.full(g, pid, dtype=np.int32),
        "term": term[starts],
        "df_chunk": enc["df_chunk"],
        "sum_tf": enc["sum_tf"],
        "payload": enc["payloads"],
        "block_offsets": enc["block_offsets"],
        "block_first": enc["block_first"],
        "block_last": enc["block_last"],
        "block_max_partial": enc["block_max_partial"],
        "max_partial": enc["max_partial"],
        "enc_micros": per,
    }
    if bucket is not None:
        data["bucket"] = bucket[starts].astype(np.int32)
        return pd.DataFrame(data)[[f.name for f in CHUNK_SCHEMA_BUCKETED.fields]]
    return pd.DataFrame(data)[[f.name for f in CHUNK_SCHEMA.fields]]


def make_chunk_encoder(avgdl: float, k1: float, b: float, block_size: int):
    """Returns a mapInPandas function encoding (term, doc_id, tf, doc_len)
    rows — REQUIRED sorted by (term, doc_id) within the partition — into
    one encoded chunk row per term.

    Handles record-batch boundaries splitting a term by carrying the tail
    group over to the next batch (mapInPandas preserves in-partition order).
    """

    def encode_terms(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_partition_flat(
            pdf["term"].to_numpy(),
            None,
            pdf["doc_id"].to_numpy(dtype=np.int64),
            pdf["tf"].to_numpy(dtype=np.int64),
            pdf["doc_len"].to_numpy(dtype=np.int64),
            avgdl, k1, b, block_size,
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


def sha256_col(col: str = "content"):
    """F8 (SURVEY.md §2.3): per-row sha256 content hash — pure built-in
    (JVM-side, codegen), matching DuckDB's sha256() on UTF-8 bytes."""
    return F.sha2(F.col(col), 256)

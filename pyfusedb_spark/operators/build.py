"""Index build pipeline (SURVEY.md §3 entry-point-2 replacement).

Reference lifecycle being re-expressed: SPIMI block build
(``app/InvertedIndexFinal.py:254-285``) + k-way merge (``:287-346``),
re-architected for Spark's execution model. Default ("file-shuffle")
pipeline:

Stage "tf"      ONE fused corpus scan (udfs.make_tf_fused_task):
                tokenize + per-doc tf counting + sha256 lineage in a
                single mapInArrow pass; each task writes its packed
                partial posting runs straight into hive
                ``tf/tpart=P`` dirs (P = bucket-salted crc32 of the
                term) plus its (doc_id, sha256) file — the MAP side of
                a shuffle, expressed as parquet files, with no JVM
                row materialization and no second scan.
Stage "stats"   N (counts empty docs too — app/InvertedIndex.py:34),
                avgdl, exact sha256 lineage sum.
Stage postings  spark.range(n_tparts) -> one encoder task per tpart
                (udfs.make_tpart_build_task): reads ITS OWN tpart's
                files via pyarrow (the REDUCE side — no live
                exchange), merges runs into one chunk per
                (term, bucket) with delta+varint+block-max encoding,
                writes ``index/bucket=K/tpart=P`` chunk files AND its
                final lexicon slice (a term lives in its probe set of
                tparts only), yields tiny stats rows for manifests.
                The doc-range bucket IS the skew salt (north rule):
                it spreads a hot term over `n_buckets` tparts at
                route time AND keeps chunks doc-disjoint so
                query-side concatenation needs no re-merge (unlike
                the reference's k-way heap merge).
Stage "lexicon" folded into the posting pass (df(term) = Σ df_chunk
                summed read-side across slices; A3/A4 in §2.4).
Stage "norms"   optional exact TF-IDF document norms (v1 semantics,
                app/InvertedIndex.py:408-419) for the cosine mode.

Legacy modes "per-bucket" / "single-pass" keep the round-2 live
repartitionByRange exchange (finest per-bucket resume granularity /
one-job builds on term-range file layout).

Every stage/tpart/bucket commits a manifest (term range, doc count,
postings, bytes, sha256 lineage, tokens/sec, postings/sec, per-task
metrics) through ManifestCatalog; a killed build resumes from the last
committed unit (file-shuffle unit = one tpart, validated against its
data dirs).

Scale notes (100 TB / 1000 executors): stage "tf" is scan→write with
zero live shuffles; the posting stage moves data only through the
tpart files. n_tparts bounds per-encoder-task memory (≈ |postings| *
12B / n_tparts) — the default is corpus-derived (~DOCS_PER_TPART docs
per tpart, capped at 4x parallelism) so it grows with the corpus
exactly like n_buckets bounds chunk size, and a toy build doesn't pay
cluster-sized file fan-out; tf file fan-out is n_scan_tasks x n_tparts, so at
10^5 map tasks consolidate with a coarser n_tparts per wave or an
intermediate combine. Executors read/write storage directly (local FS
here; HDFS/S3 via pyarrow.fs on a cluster).
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyfusedb_spark import fsio

from pyfusedb_spark.functions.udfs import (
    CHUNK_SCHEMA_BUCKETED,
    PACKED_TF_SCHEMA,
    TF_TASK_SCHEMA,
    TPART_STATS_SCHEMA,
    TF_COMBINE_SCHEMA,
    make_packed_encoder,
    make_packed_tf_exploder,
    make_tf_combine_task,
    make_tf_fused_task,
    make_tpart_build_task,
    sha256_col,
)
from pyfusedb_spark.operators.ids import assign_doc_ids
from pyfusedb_spark.sources.catalog import ManifestCatalog, write_json_atomic


@dataclass(frozen=True)
class IndexConfig:
    preset: str = "english"
    k1: float = 1.2
    b: float = 0.75
    block_size: int = 128
    n_buckets: int = 8
    compute_norms: bool = True
    shuffle_partitions: int | None = None  # posting-shuffle partitions
    # "file-shuffle" (default): tf written hive-partitioned by
    #   tpart = crc32(term) % n_tparts; the posting stage is
    #   spark.range(n_tparts) -> mapInArrow tasks that read their own
    #   tpart's files via pyarrow, encode, and write chunk + lexicon
    #   files directly (no live exchange, no UnsafeRow<->Arrow pair —
    #   the round-2 scaling residual). Lexicon folds into the same pass.
    # "per-bucket": legacy live repartitionByRange exchange, one Spark
    #   job per doc-range bucket -> finest resume granularity.
    # "single-pass": legacy live exchange, ONE job for all buckets.
    posting_mode: str = "file-shuffle"
    # file-shuffle fan-out; None -> corpus-derived (~DOCS_PER_TPART docs
    # per tpart, capped at 4x parallelism). Bounds per-task memory (one
    # tpart of packed runs) — set explicitly when docs are far fatter
    # than the testdata mix; keep CONSTANT across cluster sizes when
    # measuring scaling (same work decomposition at N and 4N).
    n_tparts: int | None = None
    # tf fan-out bound: when the corpus scan ran on more tasks than
    # this, an extra per-tpart combine pass (udfs.make_tf_combine_task)
    # rewrites each tpart's scan_tasks small files into O(bytes/512MB)
    # large ones BEFORE the tf promote — tf files stay
    # min(scan_tasks, bound) x n_tparts + combined output instead of
    # 10^5 x n_tparts at cluster scale. None disables.
    max_tf_files_per_tpart: int | None = 64
    # Minimum task waves for the corpus scan when the small-file guard
    # repartitions (toy/bench scale only — a real corpus has plenty of
    # splits): one wave puts straggler variance on the critical path,
    # while ~4 waves amortize it (same reasoning as the tpart count).
    scan_waves: int = 4
    # Explicit scan task count override (None -> scan_waves x cores).
    # Set it ROWS-derived (like n_tparts) when measuring N->4N scaling
    # so both levels run the identical work decomposition — a cores-
    # derived target gives the high level fewer waves per task and
    # different tf file counts, which is a protocol artifact, not a
    # scaling property.
    scan_tasks: int | None = None


# Measured A/B sweet spot (BENCH/BASELINE.md tpart sweep): 1M docs -> 64
# tparts (4 task waves at local[16], halved per-task state), 150k -> ~10-16
# (64 there is pure tf-file fan-out: tf files = scan_tasks x n_tparts),
# 5k -> 1. Default derives from corpus size so toy builds don't pay
# cluster-sized fan-out; the 4x-parallelism cap keeps the skew-amortizing
# "4 waves" shape at cluster scale (raise n_tparts explicitly when a
# tpart's packed postings would outgrow executor memory).
DOCS_PER_TPART = 15_625


def _default_n_tparts(n_docs: int, parallelism: int) -> int:
    return max(1, min(math.ceil(n_docs / DOCS_PER_TPART), 4 * parallelism))


def _local_agg(sql: str) -> dict:
    """Driver-local parquet aggregation via DuckDB — replaces read-back
    Spark jobs for manifest stats (each saved job is ~0.5-1.5s of serial
    scheduling latency at toy scale; at cluster scale use the Spark
    path). Falls back to None when duckdb is unavailable."""
    if "://" in sql:
        return None  # URI root (object store / file://): take the Spark path
    try:
        import duckdb  # noqa: PLC0415
    except ImportError:
        return None
    pdf = duckdb.sql(sql).df()
    return {c: pdf[c].iloc[0] for c in pdf.columns}


def _tf_globs(tf_dir: str) -> str:
    """Quoted DuckDB glob for whichever tf layout exists (flat vs
    hive bucket dirs) — DuckDB errors on a glob matching no files."""
    import glob as _g

    if _g.glob(os.path.join(tf_dir, "*.parquet")):
        return f"'{tf_dir}/*.parquet'"
    return f"'{tf_dir}/*/*.parquet'"


def _tf_long(spark: SparkSession, tf_dir: str) -> DataFrame:
    """Long-format (term, doc_id, tf, dl) view over the packed tf runs."""
    return (
        spark.read.parquet(tf_dir)
        .select("term", F.explode(F.arrays_zip("docs", "tfs", "dls")).alias("z"))
        .select(
            "term",
            F.col("z.docs").alias("doc_id"),
            F.col("z.tfs").alias("tf"),
            F.col("z.dls").alias("dl"),
        )
    )


def _assemble_doc_stats(spark: SparkSession, ds_sha_dir: str, tf_dir: str, ds_dir: str) -> None:
    """doc_stats(doc_id, doc_len, sha256) = sha ⟕ max(doc_len) per doc.

    Driver-local DuckDB at toy scale (saves two Spark jobs of scheduling
    latency); Spark left-join fallback — the path a real cluster takes."""
    try:
        if fsio.is_uri(ds_dir):
            raise OSError("URI root: use the Spark path")
        import duckdb  # noqa: PLC0415

        os.makedirs(ds_dir, exist_ok=True)
        for old in os.listdir(ds_dir):
            if old.endswith(".parquet"):
                os.remove(os.path.join(ds_dir, old))
        duckdb.sql(
            f"COPY (SELECT s.doc_id, coalesce(l.doc_len, 0)::BIGINT AS doc_len, s.sha256 "
            f"FROM '{ds_sha_dir}/*.parquet' s LEFT JOIN ("
            f"  SELECT doc_id, max(dl)::BIGINT AS doc_len FROM ("
            f"    SELECT unnest(docs) AS doc_id, unnest(dls) AS dl FROM parquet_scan({_tf_globs(tf_dir)})"
            f"  ) GROUP BY doc_id"
            f") l USING (doc_id)) TO '{ds_dir}/part-00000.parquet' (FORMAT PARQUET)"
        )
        return
    except Exception:
        pass
    sha = spark.read.parquet(ds_sha_dir)
    lens = (
        _tf_long(spark, tf_dir)
        .groupBy("doc_id")
        .agg(F.max("dl").cast("long").alias("doc_len"))
    )
    (
        sha.join(lens, "doc_id", "left")
        .na.fill({"doc_len": 0})
        .select("doc_id", "doc_len", "sha256")
        .write.mode("overwrite")
        .parquet(ds_dir)
    )



def _lexicon_local(idx_dir: str, lex_dir: str, cat) -> bool:
    """Driver-local lexicon aggregation (term-sorted parquet) when the
    chunk metadata fits comfortably on the driver — saves a whole Spark
    job of scheduling latency per build. Returns False (caller uses the
    Spark path) for big indexes or when DuckDB is unavailable."""
    try:
        if fsio.is_uri(idx_dir):
            return False
        import duckdb  # noqa: PLC0415

        meta_cols_bytes = _dir_bytes(idx_dir)
        if meta_cols_bytes > 4 << 30:
            return False
        staging = cat.staging_dir(lex_dir)
        os.makedirs(staging, exist_ok=True)
        duckdb.sql(
            f"COPY (SELECT term, sum(df_chunk)::BIGINT AS df, "
            f"sum(sum_tf)::BIGINT AS total_tf, max(max_partial)::FLOAT AS max_partial, "
            f"count(*)::BIGINT AS n_chunks "
            f"FROM parquet_scan('{idx_dir}/*/*.parquet') GROUP BY term ORDER BY term) "
            f"TO '{staging}/part-00000.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 16384)"
        )
        cat.promote_dir(staging, lex_dir)
        return True
    except Exception:
        return False


def _partition_metrics(final_dir: str) -> list | None:
    """Per-shuffle-partition posting metrics (north rule: per-partition
    logging): [pid, n_terms, n_postings, encode_cpu_s, postings_per_cpu_s]."""
    try:
        if fsio.is_uri(final_dir):
            return None
        import duckdb  # noqa: PLC0415

        rows = duckdb.sql(
            f"SELECT pid, count(*)::BIGINT, coalesce(sum(df_chunk),0)::BIGINT, "
            f"coalesce(sum(enc_micros),0)::BIGINT FROM '{final_dir}/*.parquet' "
            f"GROUP BY pid ORDER BY pid"
        ).fetchall()
        return [
            [int(p), int(nt), int(np_), round(em / 1e6, 3),
             round(np_ / (em / 1e6), 1) if em else None]
            for p, nt, np_, em in rows
        ]
    except Exception:
        return None


def _tpart_committed(cat: ManifestCatalog, tp: int) -> bool:
    """A tpart unit is committed iff its manifest exists AND every data
    dir it wrote still exists (a deleted slice forces a re-run — the
    stage-level manifest must never mask missing data)."""
    m = cat.read_manifest(f"tpart={tp}")
    if m is None:
        return False
    return all(fsio.isdir(d) for d in m.get("data_dirs", []))


def _lexicon_vocab_exact(spark: SparkSession, lex_dir: str) -> int:
    """Distinct-term count over the lexicon slices. With bucket-salted
    routing (tpart_spread > 1) a term's lexicon rows span up to `spread`
    slices, so per-slice row counts over-count; one narrow distinct over
    the (small) lexicon fixes it. DuckDB locally, Spark fallback."""
    if fsio.is_uri(lex_dir):
        return (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(lex_dir).select("term").distinct().count()
        )
    import glob as _g

    files = sorted(
        _g.glob(os.path.join(lex_dir, "*.parquet"))
        + _g.glob(os.path.join(lex_dir, "*", "*.parquet"))
    )
    if not files:
        return 0
    flist = ", ".join(f"'{f}'" for f in files)
    row = _local_agg(
        f"SELECT count(DISTINCT term)::BIGINT AS v FROM read_parquet([{flist}])"
    )
    if row is not None:
        return int(row["v"])
    return spark.read.parquet(*files).select("term").distinct().count()


def _file_shuffle_postings(
    spark: SparkSession,
    cat: ManifestCatalog,
    tf_dir: str,
    idx_dir: str,
    lex_dir: str,
    n_tparts: int,
    n_docs: int,
    bucket_span: int,
    avgdl: float,
    config: IndexConfig,
    resume: bool,
    tpart_spread: int = 1,
) -> None:
    """File-shuffle posting + lexicon stage (see IndexConfig docstring
    and udfs.make_tpart_build_task). Resume granularity is ONE TPART:
    each tpart commits a `tpart=P` manifest listing its data dirs + per-
    bucket stats; a killed build reruns only invalid/missing tparts.
    Aggregate bucket manifests + stage manifests are derived from the
    tpart manifests (cheap, idempotent, no read-back jobs)."""
    missing = [
        tp for tp in range(n_tparts)
        if not (resume and _tpart_committed(cat, tp))
    ]
    # Driver-side pre-wave cleanup (FuseIndex reads index/ by directory
    # listing, so unmanifested dirs ARE query-visible):
    #  - tpart dirs OUTSIDE the configured range — a rebuild with a
    #    smaller n_tparts would otherwise leave stale tpart=P (P >=
    #    n_tparts) that no task's _clean_own_slices ever touches,
    #    double-counting postings;
    #  - uncommitted (missing) tparts' dirs — a crashed task's partial
    #    output stays visible until its re-run otherwise. The task still
    #    re-cleans its own slices first (belt-and-braces vs speculative
    #    or retried attempts).
    stale_tps = set(missing)
    for name in fsio.listdir(idx_dir):
        if not name.startswith("bucket="):
            continue
        bdir = fsio.join(idx_dir, name)
        for sub in fsio.listdir(bdir):
            if not sub.startswith("tpart="):
                continue
            try:
                p = int(sub.split("=", 1)[1])
            except ValueError:
                continue
            if p >= n_tparts or p in stale_tps:
                fsio.rmtree(fsio.join(bdir, sub))
    for sub in fsio.listdir(lex_dir):
        if sub.startswith("tpart="):
            try:
                p = int(sub.split("=", 1)[1])
            except ValueError:
                continue
            if p >= n_tparts or p in stale_tps:
                fsio.rmtree(fsio.join(lex_dir, sub))
    secs = 0.0
    if missing:
        t0 = time.perf_counter()
        fsio.makedirs(idx_dir)
        fsio.makedirs(lex_dir)
        task = make_tpart_build_task(
            tf_dir, idx_dir, lex_dir,
            avgdl, config.k1, config.b, config.block_size,
        )
        # one row per partition -> one task per missing tpart, no
        # exchange anywhere in this job. Tasks finalize their own
        # bucket=K/tpart=P + lexicon/tpart=P dirs (clean + direct atomic
        # writes) — the old driver-serial staging→live promote loop
        # (O(n_buckets x n_tparts) renames of driver metadata work on
        # the critical path, ~10^4+ dirs at cluster scale) is gone;
        # visibility is the per-tpart manifest commit below.
        if len(missing) < n_tparts:
            ids = spark.createDataFrame(
                [(tp,) for tp in missing], "id long"
            ).repartition(len(missing))
        else:
            ids = spark.range(0, n_tparts, 1, n_tparts)
        stats_rows = ids.mapInArrow(task, TPART_STATS_SCHEMA).collect()
        secs = time.perf_counter() - t0
        # per-tpart manifests (north rule: per-partition segment lineage
        # + metrics; a killed build resumes from the last committed one)
        by_tp: dict[int, dict] = {tp: {"rows": [], "lex": None} for tp in missing}
        for r in stats_rows:
            ent = by_tp[int(r["tpart"])]
            if r["bucket"] == -1:
                ent["lex"] = {
                    "n_terms": int(r["n_terms"]),
                    "n_postings": int(r["n_postings"]),
                    "bytes": int(r["bytes"]),
                    "enc_micros": int(r["enc_micros"]),
                }
            else:
                ent["rows"].append(
                    [int(r["bucket"]), int(r["n_terms"]), int(r["n_postings"]),
                     int(r["bytes"]), int(r["enc_micros"]),
                     str(r["term_lo"]), str(r["term_hi"])]
                )
        per_secs = secs / max(1, len(missing))
        for tp in missing:
            ent = by_tp[tp]
            dirs = [
                fsio.join(idx_dir, f"bucket={row[0]}", f"tpart={tp}")
                for row in ent["rows"]
            ]
            if ent["lex"] is not None:
                dirs.append(fsio.join(lex_dir, f"tpart={tp}"))
            cat.commit(
                f"tpart={tp}",
                {
                    "data_dir": None,
                    "data_dirs": dirs,
                    "tpart": tp,
                    "rows": ent["rows"],
                    "lex": ent["lex"],
                    "seconds": round(per_secs, 3),
                },
            )
    # ---- aggregate manifests from the committed tpart units ----
    if not (resume and cat.is_committed("stage_postings") and not missing):
        by_bucket: dict[int, dict] = {}
        lex_terms = 0
        lex_postings = 0
        for tp in range(n_tparts):
            m = cat.read_manifest(f"tpart={tp}")
            if m is None:
                continue
            if m.get("lex"):
                lex_terms += m["lex"]["n_terms"]
                lex_postings += m["lex"]["n_postings"]
            for k, n_terms, n_post, nbytes, micros, lo, hi in m.get("rows", []):
                agg = by_bucket.setdefault(
                    int(k),
                    {"n_terms": 0, "n_postings": 0, "bytes": 0, "enc_micros": 0,
                     "term_lo": None, "term_hi": None, "partitions": []},
                )
                agg["n_terms"] += int(n_terms)
                agg["n_postings"] += int(n_post)
                agg["bytes"] += int(nbytes)
                agg["enc_micros"] += int(micros)
                if agg["term_lo"] is None or lo < agg["term_lo"]:
                    agg["term_lo"] = lo
                if agg["term_hi"] is None or hi > agg["term_hi"]:
                    agg["term_hi"] = hi
                es = int(micros) / 1e6
                agg["partitions"].append(
                    [tp, int(n_terms), int(n_post), round(es, 3),
                     round(int(n_post) / es, 1) if es > 0 else None]
                )
        if not by_bucket and not any(
            n.endswith(".parquet") or n.startswith("tpart=")
            for n in fsio.listdir(lex_dir)
        ):
            _write_empty_lexicon(lex_dir)
        if tpart_spread > 1 and lex_terms:
            lex_terms = _lexicon_vocab_exact(spark, lex_dir)
        for k in sorted(by_bucket):
            agg = by_bucket[k]
            cat.commit(
                f"bucket={k}",
                {
                    "data_dir": fsio.join(idx_dir, f"bucket={k}"),
                    "bucket": k,
                    "doc_id_range": [k * bucket_span, (k + 1) * bucket_span - 1],
                    "term_range": [agg["term_lo"], agg["term_hi"]],
                    "n_terms": agg["n_terms"],
                    "n_postings": agg["n_postings"],
                    "bytes": agg["bytes"],
                    "seconds": round(secs, 3),
                    "postings_per_sec": (
                        round(agg["n_postings"] / secs, 1) if secs > 0 else None
                    ),
                    "encode_cpu_seconds": round(agg["enc_micros"] / 1e6, 3),
                    "partitions": sorted(agg["partitions"]),
                },
            )
        cat.commit(
            "stage_postings",
            {"data_dir": idx_dir, "seconds": round(secs, 3),
             "mode": "file-shuffle", "n_tparts": n_tparts},
        )
        # lexicon was folded into the same pass (a term lives in exactly
        # ONE tpart, so each task writes its final lexicon slice)
        cat.commit(
            "stage_lexicon",
            {"data_dir": lex_dir, "vocabulary": lex_terms,
             "n_postings": lex_postings, "seconds": 0.0,
             "folded_into": "stage_postings"},
        )


def _write_empty_lexicon(lex_dir: str) -> None:
    """Empty-corpus edge: downstream readers need at least one parquet
    file with the lexicon schema."""
    import pyarrow as pa

    fsio.makedirs(lex_dir)
    empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "total_tf": pa.array([], pa.int64()),
            "max_partial": pa.array([], pa.float32()),
            "n_chunks": pa.array([], pa.int64()),
        }
    )
    fsio.write_parquet_atomic(empty, fsio.join(lex_dir, "part-0.parquet"))


def _dir_bytes(path: str) -> int:
    return fsio.dir_bytes(path)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    content_col: str = "content",
    doc_id_col: str | None = None,
    sort_cols: list[str] | None = None,
    config: IndexConfig = IndexConfig(),
    resume: bool = True,
) -> dict:
    """Build (or resume) an index at out_dir. Returns the stats dict."""
    from pyfusedb_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    cat = ManifestCatalog(out_dir)
    # drop staging dirs a killed run left behind: they'd match the
    # `dir/*/*.parquet` lexicon/stats globs and double-count chunks
    cat.clean_orphan_staging(out_dir)
    if not resume:
        for key in list(cat.snapshot().get("manifests", {})):
            cat.uncommit(key)

    tf_dir = fsio.join(out_dir, "tf")
    ds_dir = fsio.join(out_dir, "doc_stats")
    idx_dir = fsio.join(out_dir, "index")
    lex_dir = fsio.join(out_dir, "lexicon")
    stats_path = fsio.join(out_dir, "stats.json")

    # ---------------- stage tf ----------------
    # Three narrow jobs, zero shuffles, no caching of wide intermediates
    # (a persisted map<term,tf> column measured 2-3x slower end-to-end
    # and its fixed JVM-side costs wrecked N->4N scaling):
    #   A. (doc_id, sha256) — pure JVM codegen, written once;
    #   B. exploded (doc_id, doc_len, bucket, term, tf) rows straight
    #      out of ONE mapInPandas Arrow pass, written partitioned by
    #      bucket (tokenize happens exactly once, here);
    #   C. doc_stats = sha ⟕ per-doc doc_len — tiny driver-local DuckDB
    #      agg over the two parquet dirs (Spark fallback for real
    #      clusters / non-local filesystems).
    m_tf = cat.read_manifest("stage_tf") if resume else None
    ds_sha_dir = fsio.join(out_dir, "doc_sha")
    # resolved inside the file-shuffle branch once n_docs is known —
    # the default is corpus-derived (see _default_n_tparts), and tf
    # file fan-out is scan_tasks x n_tparts so oversizing it at toy
    # scale is pure file-commit overhead.
    n_tparts_cfg = None
    if m_tf is None:
        t0 = time.perf_counter()
        _dbg = os.environ.get("PYFUSEDB_TIMING") == "1"
        sha_src = None
        if doc_id_col is None:
            # assign_doc_ids persists its sorted intermediate; ids are
            # dense 0..N-1 so count/max come free — no extra action
            docs = assign_doc_ids(corpus, sort_cols or corpus.columns)
            n_docs = docs._pyfusedb_n_rows
            max_id = n_docs - 1
        else:
            docs = corpus.withColumnRenamed(doc_id_col, "doc_id") if doc_id_col != "doc_id" else corpus
            sha_src = docs  # sha job reads the un-repartitioned scan
            # Small-file guard: a corpus materialized as a few small
            # parquet files bin-packs into fewer scan splits than cores
            # (spark.sql.files.maxPartitionBytes), which would serialize
            # the tokenize stage. Target scan_waves x parallelism tasks,
            # not just parallelism: a single task wave puts per-task
            # variance straight on the stage's critical path (at 32
            # cores the slowest of 32 tasks gates the stage — the r4
            # 8->32 stage_tf plateau was partly THIS: the cached bench
            # corpus bin-packed to exactly 32 splits, giving local[8]
            # four straggler-amortizing waves and local[32] one). At
            # 100 TB the scan has orders of magnitude more splits than
            # executors and this no-ops; at toy scale the round-robin
            # shuffle is cheap and buys wave-balanced parallelism for
            # the dominant stage.
            par = spark.sparkContext.defaultParallelism
            target = config.scan_tasks or par * max(1, int(config.scan_waves))
            if docs.rdd.getNumPartitions() < target:
                docs = docs.repartition(target)
        if config.posting_mode == "file-shuffle":
            # FUSED single corpus scan (udfs.make_tf_fused_task): the
            # task tokenizes, packs runs into tpart files AND computes
            # sha256 lineage itself — the legacy path's separate JVM
            # sha256 job re-scanned the whole corpus, and Spark's
            # dynamic-partition writer paid a per-row fan-out on fat
            # array rows. bucket_span needs max_id up front: a column-
            # pruned agg over doc_id alone (no content read).
            if doc_id_col is not None:
                r = docs.agg(
                    F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("m")
                ).collect()[0]
                n_docs, max_id = int(r["n"]), int(r["m"] or 0)
            bucket_span = max(1, math.ceil((max_id + 1) / config.n_buckets))
            n_tparts_cfg = config.n_tparts or _default_n_tparts(
                n_docs,
                config.shuffle_partitions
                or spark.sparkContext.defaultParallelism,
            )
            staging_tf = cat.staging_dir(tf_dir)
            staging_sha = cat.staging_dir(ds_sha_dir)
            fsio.makedirs(staging_tf)
            fsio.makedirs(staging_sha)
            scan_rows = docs.select(
                F.col("doc_id").cast("long").alias("doc_id"), content_col
            ).mapInArrow(
                make_tf_fused_task(
                    config.preset, bucket_span, content_col,
                    n_tparts_cfg, staging_tf, staging_sha,
                    tpart_spread=config.n_buckets,
                ),
                TF_TASK_SCHEMA,
            ).collect()
            n_scan_tasks = len(scan_rows)
            bound = config.max_tf_files_per_tpart
            if bound is not None and n_scan_tasks > bound:
                # fan-out bound: scan_tasks files per tpart -> a handful
                # (one per-tpart task wave; see make_tf_combine_task)
                combined = cat.staging_dir(tf_dir)
                fsio.makedirs(combined)
                spark.range(0, n_tparts_cfg, 1, n_tparts_cfg).mapInArrow(
                    make_tf_combine_task(staging_tf, combined),
                    TF_COMBINE_SCHEMA,
                ).collect()
                fsio.rmtree(staging_tf)
                staging_tf = combined
            cat.promote_dir(staging_tf, tf_dir)
            cat.promote_dir(staging_sha, ds_sha_dir)
            if _dbg:
                import sys

                print(f"[tf] fused scan done at +{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        else:
            # -- job A: sha256 lineage (JVM-only) --
            (sha_src if sha_src is not None else docs).select(
                F.col("doc_id").cast("long").alias("doc_id"),
                sha256_col(content_col).alias("sha256"),
            ).write.mode("overwrite").parquet(ds_sha_dir)
            if doc_id_col is not None:
                row = _local_agg(
                    f"SELECT count(*)::BIGINT AS n, coalesce(max(doc_id), 0)::BIGINT AS m "
                    f"FROM '{ds_sha_dir}/*.parquet'"
                )
                if row is None:
                    r = spark.read.parquet(ds_sha_dir).agg(
                        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("m")
                    ).collect()[0]
                    row = {"n": r["n"], "m": r["m"] or 0}
                n_docs, max_id = int(row["n"]), int(row["m"])
            bucket_span = max(1, math.ceil((max_id + 1) / config.n_buckets))
            if _dbg:
                import sys

                print(f"[tf] sha/ids done at +{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            # -- job B: tokenize + explode in one Arrow pass --
            # per-bucket mode needs hive bucket dirs (its jobs filter
            # bucket == k -> directory pruning); single-pass groups on
            # the bucket COLUMN and reads everything once, so skip
            # partitionBy — fewer output files, much lighter job commit
            tf_writer = (
                docs.select(F.col("doc_id").cast("long").alias("doc_id"), content_col)
                .mapInArrow(
                    make_packed_tf_exploder(
                        config.preset, bucket_span, content_col, n_tparts=1
                    ),
                    PACKED_TF_SCHEMA,
                )
                .write.mode("overwrite")
            )
            if config.posting_mode != "single-pass":
                tf_writer = tf_writer.partitionBy("bucket")
            tf_writer.parquet(tf_dir)
            if _dbg:
                print(f"[tf] tf rows written at +{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        cache = getattr(docs, "_pyfusedb_cache", None)
        if cache is not None:
            cache.unpersist()
        # -- job C: assemble doc_stats (empty docs get doc_len=0) --
        _assemble_doc_stats(spark, ds_sha_dir, tf_dir, ds_dir)
        if _dbg:
            print(f"[tf] doc_stats written at +{time.perf_counter()-t0:.1f}s", file=sys.stderr)
        secs = time.perf_counter() - t0
        m_tf = {
            "data_dir": tf_dir,
            "n_docs": n_docs,
            "max_doc_id": max_id,
            "bucket_span": bucket_span,
            "n_tparts": n_tparts_cfg,
            "tpart_spread": config.n_buckets if n_tparts_cfg else None,
            "seconds": round(secs, 3),
            "docs_per_sec": round(n_docs / secs, 1) if secs > 0 else None,
        }
        cat.commit("stage_tf", m_tf)

    n_docs = m_tf["n_docs"]
    bucket_span = m_tf["bucket_span"]
    # tf layout is fixed at tf-write time: resuming a legacy (pre-tpart)
    # index with a file-shuffle config falls back to the single-pass
    # live exchange, which reads either legacy layout correctly
    n_tparts = m_tf.get("n_tparts")
    tpart_spread = m_tf.get("tpart_spread") or 1
    posting_mode = config.posting_mode
    if posting_mode == "file-shuffle" and not n_tparts:
        posting_mode = "single-pass"

    # ---------------- stage stats ----------------
    m_stats = cat.read_manifest("stage_stats") if resume else None
    if m_stats is None:
        # order-independent sha256 lineage fingerprint: sum of 60-bit hex
        # prefixes (input_hint per-row invariant, recomputable). Local
        # DuckDB read — no Spark job; Spark fallback below.
        row = _local_agg(
            f"SELECT count(*)::BIGINT AS n, avg(doc_len)::DOUBLE AS avgdl, "
            f"coalesce(sum(doc_len), 0)::BIGINT AS total_len, "
            # ::VARCHAR keeps the HUGEINT exact through pandas (a bare
            # HUGEINT converts to float64 and silently rounds low digits)
            f"coalesce(sum(('0x' || substring(sha256, 1, 15))::BIGINT), 0)::HUGEINT::VARCHAR AS lineage "
            f"FROM '{ds_dir}/*.parquet'"
        )
        if row is None:
            r = spark.read.parquet(ds_dir).agg(
                F.count(F.lit(1)).alias("n"),
                F.avg("doc_len").alias("avgdl"),
                F.sum("doc_len").alias("total_len"),
                F.sum(F.conv(F.substring("sha256", 1, 15), 16, 10).cast("decimal(38,0)")).alias("lineage"),
            ).collect()[0]
            row = {"n": r["n"], "avgdl": r["avgdl"], "total_len": r["total_len"], "lineage": r["lineage"]}
        m_stats = {
            "data_dir": ds_dir,
            "n_docs": int(row["n"]),
            "avgdl": float(row["avgdl"] or 0.0),
            "total_len": int(row["total_len"] or 0),
            "sha256_lineage_sum": str(int(row["lineage"])),
        }
        cat.commit("stage_stats", m_stats)
    avgdl = m_stats["avgdl"]

    # ---------------- per-bucket posting build ----------------
    n_shuffle = config.shuffle_partitions or spark.sparkContext.defaultParallelism
    encoder = make_packed_encoder(avgdl, config.k1, config.b, config.block_size)

    def _build_bucket(k: int) -> None:
        key = f"bucket={k}"
        t0 = time.perf_counter()
        final_dir = fsio.join(idx_dir, f"bucket={k}")
        tf_k = spark.read.parquet(tf_dir).where(F.col("bucket") == k)
        # repartitionByRange on term: each output file covers a narrow
        # term range, so query fetches prune to ~1-2 FILES via file-level
        # min/max stats (hash placement made every term touch every file,
        # ~32MB read amp per hot lookup at 1M docs). The range sampler
        # scans packed runs (~20x fewer rows than raw postings), so its
        # extra pass is cheap now
        # no sortWithinPartitions: the encoder groups by dictionary-
        # encode + integer sort (Arrow/numpy) — the JVM row sort over fat
        # array payloads was the posting stage's scaling bottleneck
        chunks = (
            tf_k.select("term", F.col("bucket").cast("int").alias("bucket"),
                        "docs", "tfs", "dls")
            .repartitionByRange(n_shuffle, "term")
            .mapInArrow(encoder, CHUNK_SCHEMA_BUCKETED)
            .drop("bucket")  # bucket is the hive dir here
        )
        staging = cat.staging_dir(final_dir)
        # small row groups -> parquet min/max stats on `term` give real
        # row-group pruning for per-query chunk fetches (a single default
        # 128M row group would force every query to read whole files)
        chunks.write.option("parquet.block.size", str(256 << 10)).mode("overwrite").parquet(staging)
        cat.promote_dir(staging, final_dir)
        secs = time.perf_counter() - t0
        cat.commit(key, _bucket_manifest_stats(final_dir, k, secs))

    def _bucket_manifest_stats(final_dir: str, k: int, secs: float) -> dict:
        stat = _local_agg(
            f"SELECT count(*)::BIGINT AS n_terms, coalesce(sum(df_chunk),0)::BIGINT AS n_postings, "
            f"min(term) AS term_lo, max(term) AS term_hi, "
            f"coalesce(sum(enc_micros),0)::BIGINT AS enc_micros FROM '{final_dir}/*.parquet'"
        )
        if stat is None:  # no duckdb -> Spark read-back (real-cluster path)
            stat = (
                spark.read.parquet(final_dir)
                .agg(
                    F.count(F.lit(1)).alias("n_terms"),
                    F.sum("df_chunk").alias("n_postings"),
                    F.min("term").alias("term_lo"),
                    F.max("term").alias("term_hi"),
                    F.sum("enc_micros").alias("enc_micros"),
                )
                .collect()[0]
            )
        n_postings = int(stat["n_postings"] or 0)
        return {
            "data_dir": final_dir,
            "bucket": k,
            "doc_id_range": [k * bucket_span, (k + 1) * bucket_span - 1],
            "term_range": [stat["term_lo"], stat["term_hi"]],
            "n_terms": int(stat["n_terms"]),
            "n_postings": n_postings,
            "bytes": _dir_bytes(final_dir),
            "seconds": round(secs, 3),
            "postings_per_sec": round(n_postings / secs, 1) if secs > 0 else None,
            "encode_cpu_seconds": round(int(stat["enc_micros"] or 0) / 1e6, 3),
            "partitions": _partition_metrics(final_dir),
        }

    if posting_mode == "file-shuffle":
        _file_shuffle_postings(
            spark, cat, tf_dir, idx_dir, lex_dir, n_tparts, n_docs,
            bucket_span, avgdl, config, resume, tpart_spread=tpart_spread,
        )
    elif posting_mode == "single-pass":
        if not (resume and cat.is_committed("stage_postings")):
            t0 = time.perf_counter()
            tf_all = spark.read.parquet(tf_dir)
            chunks = (
                tf_all.select(
                    "term", F.col("bucket").cast("int").alias("bucket"),
                    "docs", "tfs", "dls",
                )
                .repartitionByRange(n_shuffle, "term", "bucket")
                .mapInArrow(encoder, CHUNK_SCHEMA_BUCKETED)
            )
            staging = cat.staging_dir(idx_dir)
            chunks.write.option("parquet.block.size", str(256 << 10)).mode(
                "overwrite"
            ).partitionBy("bucket").parquet(staging)
            cat.promote_dir(staging, idx_dir)
            secs = time.perf_counter() - t0
            for k in range(config.n_buckets):
                final_dir = fsio.join(idx_dir, f"bucket={k}")
                if fsio.exists(final_dir):
                    cat.commit(f"bucket={k}", _bucket_manifest_stats(final_dir, k, secs))
            cat.commit("stage_postings", {"data_dir": idx_dir, "seconds": round(secs, 3),
                                          "mode": "single-pass"})
    else:
        # NOTE: buckets run SERIALLY on purpose. Thread-pooled concurrent
        # jobs were measured 2.7x SLOWER in local mode (concurrent
        # mapInPandas jobs can't share the Python worker pool -> worker
        # spawn storms: 4 threaded buckets 16.5s vs 3.6s serial at 12k
        # docs). On a real multi-executor cluster with dynamic allocation,
        # revisiting concurrency per bucket is a scheduler-level decision.
        for k in range(config.n_buckets):
            if resume and cat.is_committed(f"bucket={k}"):
                continue
            _build_bucket(k)

    # ---------------- lexicon ----------------
    # read unconditionally: with resume=False every manifest was
    # uncommitted at function start, so a present manifest was committed
    # THIS run (file-shuffle folds the lexicon into the posting pass)
    m_lex = cat.read_manifest("stage_lexicon")
    if m_lex is None:
        t0 = time.perf_counter()
        if not _lexicon_local(idx_dir, lex_dir, cat):
            lex = (
                spark.read.parquet(idx_dir)
                .groupBy("term")
                .agg(
                    F.sum("df_chunk").alias("df"),
                    F.sum("sum_tf").alias("total_tf"),
                    F.max("max_partial").alias("max_partial"),
                    F.count(F.lit(1)).alias("n_chunks"),
                )
            )
            staging = cat.staging_dir(lex_dir)
            lex.repartitionByRange(max(1, n_shuffle // 4), "term").sortWithinPartitions(
                "term"
            ).write.option("parquet.block.size", str(256 << 10)).mode("overwrite").parquet(staging)
            cat.promote_dir(staging, lex_dir)
        row = _local_agg(
            f"SELECT count(*)::BIGINT AS vocab, coalesce(sum(df),0)::BIGINT AS postings "
            f"FROM '{lex_dir}/*.parquet'"
        )
        if row is None:
            r = spark.read.parquet(lex_dir).agg(
                F.count(F.lit(1)).alias("vocab"), F.sum("df").alias("postings")
            ).collect()[0]
            row = {"vocab": r["vocab"], "postings": r["postings"]}
        m_lex = {
            "data_dir": lex_dir,
            "vocabulary": int(row["vocab"]),
            "n_postings": int(row["postings"] or 0),
            "seconds": round(time.perf_counter() - t0, 3),
        }
        cat.commit("stage_lexicon", m_lex)

    # ---------------- norms (exact, v1 semantics) ----------------
    if config.compute_norms and (not resume or cat.read_manifest("stage_norms") is None):
        t0 = time.perf_counter()
        tf_long = _tf_long(spark, tf_dir)
        # one row per term: bucket-salted tpart routing stores a term's
        # lexicon rows in up to `spread` slices — sum before the join or
        # the broadcast would multiply tf_long rows and corrupt norms
        lex = (
            spark.read.parquet(lex_dir)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        # vocabulary is usually small enough to broadcast; at larger vocab
        # Catalyst/AQE picks a shuffle join automatically
        joined = tf_long.join(F.broadcast(lex), "term")
        w = (F.lit(1.0) + F.log10(F.col("tf"))) * F.log10(F.lit(float(n_docs)) / F.col("df"))
        norms = joined.groupBy("doc_id").agg(F.sqrt(F.sum(w * w)).alias("norm"))
        ds = spark.read.parquet(ds_dir)
        ds_full = ds.join(norms, "doc_id", "left").na.fill({"norm": 0.0})
        final_dir = fsio.join(out_dir, "doc_stats_full")
        staging = cat.staging_dir(final_dir)
        ds_full.write.mode("overwrite").parquet(staging)
        cat.promote_dir(staging, final_dir)
        cat.commit(
            "stage_norms",
            {"data_dir": final_dir, "seconds": round(time.perf_counter() - t0, 3)},
        )

    tok_secs = m_tf.get("seconds")
    # resume of an index whose stage_stats manifest predates the
    # total_len key: reconstruct from avgdl (mirrors streaming's
    # _resolve_base_stats legacy handling)
    total_len = m_stats.get("total_len")
    if total_len is None:
        total_len = int(round(avgdl * n_docs))
    stats = {
        "format_version": 1,
        "config": asdict(config),
        "max_doc_id": m_tf.get("max_doc_id"),
        # query side keys tpart directory addressing off these (None ->
        # legacy term-range file layout, no tpart filter applied);
        # tpart_spread = bucket-salt width of the routing hash
        "n_tparts": n_tparts,
        "tpart_spread": tpart_spread if n_tparts else None,
        "tokens_per_sec": (
            round(total_len / tok_secs, 1) if tok_secs else None
        ),
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_len": total_len,
        "bucket_span": bucket_span,
        "vocabulary": m_lex["vocabulary"],
        "n_postings": m_lex["n_postings"],
        "sha256_lineage_sum": m_stats["sha256_lineage_sum"],
    }
    write_json_atomic(stats_path, stats)
    return stats

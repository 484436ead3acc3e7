"""Bucket-id layout shared by the build, streaming, and query sides.

The ``index/bucket=K`` hive value encodes which tier a posting segment
belongs to, and sorting chunk rows by ``bucket`` must equal sorting by
doc range (query-side concatenation relies on it — operators/query.py
``_fetch_chunks``):

    0 .. n_buckets-1                   base batch-build doc-range buckets
    STREAM_GEN_BUCKET_BASE + g         the ONE live compacted stream
                                       segment (generation g) — folds
                                       every already-compacted streamed
                                       batch; at most one generation is
                                       visible at a time
    STREAM_BATCH_BUCKET_BASE + b       live (not yet compacted) streamed
                                       micro-batch b

Base docs precede streamed docs, and compacted stream docs precede the
still-live batches (compaction always folds the oldest prefix), so the
numeric order base < gen < batch is also doc order.

Visibility contract: a compacted generation dir becomes visible ONLY via
the atomic ``stats.json`` flip (``stream_gen`` + ``folded_batches``)
written after the dir is promoted — readers filter with
:func:`visible_bucket_components`, so a crash between promote and flip
leaves an invisible orphan (GC'd on the next writer start), never a
double count.
"""

from __future__ import annotations

STREAM_GEN_BUCKET_BASE = 500_000
STREAM_BATCH_BUCKET_BASE = 1_000_000


def visible_bucket_components(stats: dict) -> tuple[int | None, list[int]] | None:
    """(current_gen_bucket, dead_batch_buckets) for a stats dict, or
    None when no streaming compaction state exists (no filtering needed).

    A bucket is visible iff it is outside the stream ranges, OR equals
    the current generation bucket, OR is a batch bucket not in the dead
    list."""
    gen = stats.get("stream_gen")
    folded = stats.get("folded_batches") or []
    if gen is None and not folded:
        return None
    cur = STREAM_GEN_BUCKET_BASE + int(gen) if gen is not None else None
    dead = [STREAM_BATCH_BUCKET_BASE + int(b) for b in folded]
    return cur, dead

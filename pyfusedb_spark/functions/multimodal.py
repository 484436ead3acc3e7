"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns processed by Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batching, partition
behavior) is real and tested; the actual media decode is STUBBED because
no image/audio libraries ship in this container:

- ``decode_image_meta`` extracts real byte-level metadata (length, magic
  bytes, sha256) plus a deterministic fake width/height derived from the
  payload, standing in for a PIL/libvips decode;
- ``extract_features`` raises ``NotImplementedError`` unless a decoder
  is importable, mirroring where a ResNet-style batch-inference pandas
  UDF (reference ``app/MultiDim.py:53-61,173-187``) would run.

At scale: binary payloads stay columnar (Parquet/Iceberg binary), Arrow
moves them zero-copy-ish into pandas; repartition by size before heavy
decode so batches stay under the 2 GiB Arrow record limit.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("magic", T.StringType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def attach_fake_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic binary payload column (utf-8 of text) standing in
    for real media bytes — schema/plumbing identical to the real thing."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def decode_image_meta(binary_df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas 'decode': real byte metadata + deterministic fake
    dimensions (payload-derived). Swap `_fake_decode` for PIL when
    available."""

    def _fake_decode(payload: bytes) -> tuple[int, int]:
        # REAL decode for PNG headers (stdlib-only: IHDR width/height are
        # big-endian uint32 at bytes 16..24 — no PIL needed); every other
        # format gets the deterministic STUB stand-in. A full build would
        # route non-PNG through PIL/libvips here.
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            return (
                int.from_bytes(payload[16:20], "big"),
                int.from_bytes(payload[20:24], "big"),
            )
        h = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
        return 320 + h % 1600, 240 + (h >> 8) % 900

    from pyfusedb_spark.shipping import ensure_shipped

    ensure_shipped(binary_df.sparkSession)

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"].tolist(), pdf[payload_col].tolist()):
                b = bytes(payload) if payload is not None else b""
                w, h = _fake_decode(b)
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        b[:4].hex(),
                        hashlib.sha256(b).hexdigest(),
                        w,
                        h,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return binary_df.mapInPandas(mapper, IMAGE_META_SCHEMA)


_HIST_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"

FEATURE_HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ch", T.StringType(), False),
        T.StructField("freq", T.DoubleType(), False),
    ]
)


def extract_char_histogram(binary_df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL (non-stub) deterministic feature extraction over binary
    payloads: normalized [a-z0-9] character histogram of the payload
    bytes — the cheap content-signature tier of a media featurizer
    (model-based embeddings stay gated in :func:`extract_features`).
    Long format (doc_id, ch, freq) so the driver's DuckDB oracle can
    recompute it in SQL; zero-frequency bins are omitted.

    Same Arrow/mapInPandas shape a ResNet batch-inference UDF would use
    (reference ``app/MultiDim.py:53-61``): payload bytes in, per-doc
    feature rows out, vectorized per batch."""
    import numpy as np

    from pyfusedb_spark.shipping import ensure_shipped

    ensure_shipped(binary_df.sparkSession)
    lut = np.full(256, -1, dtype=np.int64)
    for i, c in enumerate(_HIST_CHARS):
        lut[ord(c)] = i

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chs, freqs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"].tolist(), pdf[payload_col].tolist()):
                b = np.frombuffer(bytes(payload) if payload is not None else b"", dtype=np.uint8)
                bins = lut[b]
                bins = bins[bins >= 0]
                if bins.size == 0:
                    continue
                counts = np.bincount(bins, minlength=len(_HIST_CHARS))
                nz = np.flatnonzero(counts)
                total = float(counts.sum())
                ids.extend([int(doc_id)] * len(nz))
                chs.extend(_HIST_CHARS[i] for i in nz)
                freqs.extend((counts[nz] / total).tolist())
            yield pd.DataFrame({"doc_id": ids, "ch": chs, "freq": freqs})

    return binary_df.mapInPandas(mapper, FEATURE_HIST_SCHEMA)


def extract_features(binary_df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Batch feature extraction (ResNet-style). Gated on a real decoder."""
    try:
        import PIL  # noqa: F401
        import torch  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media feature extraction requires PIL/torch (not in this "
            "container); the Arrow/mapInPandas plumbing is exercised by "
            "decode_image_meta instead"
        ) from e
    raise NotImplementedError("wire the real model here")

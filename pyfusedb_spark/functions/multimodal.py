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
        # STUB: deterministic stand-in for an image decode. A real build
        # would do: from PIL import Image; Image.open(io.BytesIO(payload)).size
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

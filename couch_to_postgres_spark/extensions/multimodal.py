"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBS (the image/audio libraries are not
in this container): ``decode_image_stub`` raises ``NotImplementedError``
and ``fake_decode_features`` is the deterministic stand-in used by tests.
Everything Spark-side — schema, partition sizing, UDF signatures, Arrow
batch shapes — is real and tested; swapping a real decoder in changes only
the inner Python function.

Scale notes: binary payloads dominate row size, so the pipeline
(a) repartitions by byte budget, not row count, before the decode pass, and
(b) keeps metadata columns separate from payloads so metadata-only queries
never read the blobs (parquet column pruning does the rest).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_mean", LongType()),
        StructField("feat_first", LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text table as a multimodal asset table: payload = utf-8 bytes
    (the deterministic fake for an image/audio blob), metadata computed
    JVM-side (``octet_length``/``md5`` — never a Python crossing)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit("application/fake").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def decode_image_stub(payload: bytes) -> object:
    """Placeholder for a real image decode (PIL/libvips not installed).
    STUB — intentionally unimplemented."""
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; use fake_decode_features for the pipeline shape"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode → feature-extract: (mean byte,
    first byte). Replaces decode_image_stub in tests."""
    if not payload:
        return (0, 0)
    return (sum(payload) // len(payload), payload[0])


def extract_features(assets: DataFrame, batch_budget_bytes: int = 64 << 20) -> DataFrame:
    """Decode/feature-extract pass over asset payloads via ``mapInPandas``.

    Arrow streams batches of rows into Python; the kernel is per-batch
    vectorizable. ``batch_budget_bytes`` drives a repartition so each task
    holds a bounded payload volume — the knob that keeps 100 TB of blobs
    from OOMing fixed-size executors (row-count partitioning would not).
    """
    total = assets.agg(F.sum("n_bytes")).first()[0] or 0
    n_parts = max(1, int(total // batch_budget_bytes) + 1)

    def _kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": [f[0] for f in feats],
                    "feat_first": [f[1] for f in feats],
                }
            )

    return assets.repartition(n_parts).mapInPandas(_kernel, FEATURE_SCHEMA)

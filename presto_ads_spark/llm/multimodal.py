"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store bytes as a ``binary``
column next to a metadata struct; decode/feature-extract runs as an
Arrow-batched ``mapInPandas`` so Python touches each batch once and the
schema stays declared for Catalyst. The actual codec is STUBBED here (no
image/audio libs in this container — ``decode_image`` raises), but the
plumbing — schema, batch iteration, deterministic feature math — is real and
oracle-checked (md5-based fake feature).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature0", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real codec goes here (PIL/libvips); not available in this container."""
    raise NotImplementedError("image decoding requires PIL — stubbed")


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + metadata struct.

    (In production this column comes from the lakehouse; everything
    downstream only sees binary + struct, which is the contract.)"""
    return df.select(
        F.col(id_col),
        F.col(text_col).cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.col(text_col).cast(BinaryType())).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake 'decoder': md5-derived feature + pseudo dimensions —
    stands in for decode→resize→embed while keeping the mapInPandas batch
    shape, schema declaration, and partitioning identical to the real thing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            digests = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "feature0": [int(d[:4], 16) / 65535.0 for d in digests],
                    "width": [(int(d[4:6], 16) % 64) + 1 for d in digests],
                    "height": [(int(d[6:8], 16) % 64) + 1 for d in digests],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)

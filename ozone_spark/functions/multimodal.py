"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque `binary` payloads with typed metadata.
The Spark-side plumbing — schema, batching, partitioning, Pandas-UDF
signatures over mapInPandas — is real and tested; the actual media
decode is STUBBED (the container ships no image/audio libs): decode
raises NotImplementedError unless the deterministic fake decoder is
requested.

At scale, payloads stay in executor-side Arrow batches end-to-end;
feature extraction is an Arrow-vectorized mapInPandas, never a
row-at-a-time UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("payload_len", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload_len", LongType()),
    StructField("byte_histogram", ArrayType(DoubleType())),
    StructField("byte_mean", DoubleType()),
])

N_HIST_BINS = 16


def as_media_table(docs: DataFrame) -> DataFrame:
    """Wrap documents as a multimodal table: payload = utf-8 bytes of the
    text (stand-in for image/audio bytes), typed metadata columns."""
    payload = F.encode(F.col("text"), "utf-8")
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        "doc_id",
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("payload_len"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False):
    """STUB: real decode requires image/audio libs not present in this
    container.  `fake=True` returns a deterministic pseudo-decode (the
    byte values themselves) so downstream plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not available here; "
            "pass fake=True for the deterministic test decoder")
    return list(payload)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: per-payload
    byte histogram (N_HIST_BINS) + mean byte value.  The UDF signature,
    batch shape and output schema are the real production plumbing; only
    the decoder inside is the deterministic fake."""

    # NOTE: the closure must be self-contained (locals + builtins only) so
    # cloudpickle ships it by value — Python workers on a real cluster do
    # not have ozone_spark importable.
    n_bins = N_HIST_BINS
    out_cols = [f.name for f in FEATURE_SCHEMA]
    fake = fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not available "
                    "here; use fake_decode=True")
            lens, hists, means = [], [], []
            for payload in pdf["payload"]:
                # vectorized per payload: the bytes never become Python
                # ints (frombuffer is zero-copy; bincount is C)
                arr = _np.frombuffer(bytes(payload), dtype=_np.uint8)
                n = max(arr.size, 1)
                bins = (arr.astype(_np.int32) * n_bins) >> 8  # b*n_bins//256
                hist = _np.bincount(bins, minlength=n_bins).astype(_np.float64)
                lens.append(arr.size)
                hists.append((hist / n).tolist())
                means.append(float(arr.sum()) / n)
            yield _pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "media_type": pdf["media_type"].to_numpy(),
                "payload_len": _np.asarray(lens, dtype=_np.int64),
                "byte_histogram": hists,
                "byte_mean": _np.asarray(means, dtype=_np.float64),
            }, columns=out_cols)

    # fan a single-file input out across cores before the CPU-bound UDF
    target = media.sparkSession.sparkContext.defaultParallelism
    if media.rdd.getNumPartitions() < target:
        media = media.repartition(target)
    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def media_summary(media: DataFrame) -> DataFrame:
    """Typed-metadata rollup — runs entirely JVM-side (no decode)."""
    return (
        media.groupBy("media_type")
        .agg(F.count("*").alias("n"),
             F.sum("payload_len").alias("total_bytes"),
             F.min("payload_len").alias("min_bytes"),
             F.max("payload_len").alias("max_bytes"))
        .orderBy("media_type")
    )

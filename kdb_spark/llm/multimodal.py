"""Multimodal columns (SURVEY.md §2.K): image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched Pandas functions.

The container has no image/audio codecs, so the *decode* step is stubbed
(clearly marked NotImplementedError / deterministic fake) — but the
Spark-side plumbing that matters at 100 TB is real and tested: BinaryType
columns, StructType metadata, `mapInPandas` batch iteration with a declared
output schema, and per-batch (never per-row) Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def multimodal_table(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Mixed-modal table: text + embedding + opaque binary payload + typed
    metadata struct, one row per document.

    The binary column stands in for image/audio bytes (here: the utf-8
    encoded text — deterministic and size-faithful); `meta` is the typed
    sidecar a real pipeline carries (dims, codec, language...).
    """
    emb = embeddings.select(
        F.col("vec_id").alias("doc_id"), "embedding", "label"
    )
    return (
        documents.join(emb, "doc_id")
        .select(
            "doc_id",
            "text",
            "embedding",
            F.encode("text", "utf-8").alias("payload"),
            F.struct(
                F.col("lang").alias("lang"),
                F.col("source").alias("source"),
                F.col("n_chars").alias("n_chars"),
                F.col("label").cast("long").alias("label"),
            ).alias("meta"),
        )
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real decode needs an image codec (PIL/libjpeg), absent from this
    container — STUB. The distributed plumbing around it (mm_features)
    is real; swap this function body when codecs are available."""
    raise NotImplementedError("image decode requires an image codec library")


def _fake_features(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for feature extraction: (byte length, first
    byte). Keeps the mapInPandas contract testable without codecs."""
    return (len(payload), payload[0] if payload else -1)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("off_bytes", T.LongType()),
        T.StructField("frame_len", T.LongType()),
    ]
)


def decode_video(payload: bytes) -> object:
    """Real frame decode needs a video codec (ffmpeg/pyav), absent from this
    container — STUB. mm_frame_sample exercises the distributed shape
    (binary column → per-batch frame explosion) with deterministic
    fixed-size frame geometry instead."""
    raise NotImplementedError("video decode requires a codec library")


def mm_frame_sample(mm: DataFrame, frame_bytes: int = 64, every: int = 4) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from each binary payload.

    The 100 TB shape for video/audio frame extraction: one input row fans
    out to O(payload/frame) rows *inside* the Arrow batch (never a driver
    loop, never per-row Python calls into Spark). Frame geometry is
    deterministic arithmetic over byte length, so the op is fully
    oracle-checkable; a real decoder would replace the chunk rule only.
    """

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            lens = pdf["payload"].map(len).to_numpy()
            n_frames = -(-lens // frame_bytes)  # ceil
            n_keep = -(-n_frames // every)
            doc = np.repeat(pdf["doc_id"].to_numpy(), n_keep)
            # frame indices 0, every, 2*every, ... per doc
            idx = (
                np.arange(n_keep.sum()) - np.repeat(np.cumsum(n_keep) - n_keep, n_keep)
            ) * every
            off = idx * frame_bytes
            total = np.repeat(lens, n_keep)
            yield pd.DataFrame(
                {
                    "doc_id": doc,
                    "frame_idx": idx,
                    "off_bytes": off,
                    "frame_len": np.minimum(frame_bytes, total - off),
                }
            )

    return mm.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def mm_features(mm: DataFrame) -> DataFrame:
    """Feature-extract over the binary column via mapInPandas.

    Arrow-batched: Python sees whole column batches (10k rows each), never
    one row at a time — the only acceptable Python shape in a 100 TB path.
    Output schema is declared up front so Catalyst plans around it.
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": feats.map(lambda t: t[0]).astype("int64"),
                    "first_byte": feats.map(lambda t: t[1]).astype("int64"),
                    "lang": pdf["meta"].map(lambda m: m["lang"]),
                }
            )

    return mm.select("doc_id", "payload", "meta").mapInPandas(
        extract, FEATURE_SCHEMA
    )

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

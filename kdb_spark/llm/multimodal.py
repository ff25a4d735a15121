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


PHASH_BLOCKS = 32
PHASH_BANDS = 4  # 4 × 8-bit bands: any pair with hamming ≤ 3 shares one


def mm_phash(mm: DataFrame) -> DataFrame:
    """Perceptual-hash signature over the binary payload — the image-dedup
    primitive, computed on raw bytes (a real pipeline would pHash decoded
    pixels; the byte-block form here exercises the identical distributed
    shape and is exactly reproducible from the payload alone).

    Signature: split each payload into 32 positional blocks, bit b = 1 iff
    block b's byte mean exceeds the whole payload's mean. The compare is
    cross-multiplied to stay in exact integer arithmetic
    (block_sum·n > total·block_len) — no float means, so the signature is
    bit-identical in any engine. One Arrow-batched numpy pass (bincount
    per block), map-only, no shuffle.
    """

    def sig(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out_id, out_sig = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(buf)
                if n == 0:
                    continue
                block = (np.arange(n) * PHASH_BLOCKS) // n
                bsum = np.bincount(block, weights=buf, minlength=PHASH_BLOCKS).astype(
                    np.int64
                )
                cnt = np.bincount(block, minlength=PHASH_BLOCKS).astype(np.int64)
                total = int(buf.sum())
                bits = (bsum * n) > (total * cnt)
                out_id.append(int(doc_id))
                out_sig.append(int((bits << np.arange(PHASH_BLOCKS)).sum()))
            if out_id:
                yield pd.DataFrame({"doc_id": out_id, "phash": out_sig})

    return mm.select("doc_id", "payload").mapInPandas(
        sig, "doc_id long, phash long"
    )


def mm_phash_dedup(mm: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate binary payloads by perceptual-hash band blocking —
    the multimodal twin of `dedup_simhash`: 4 × 8-bit bands (pigeonhole:
    hamming ≤ 3 ⇒ at least one exact shared band — guaranteed recall up to
    3; the default threshold 6 trades band-limited recall for a wider
    near-dup net, the standard SimHash-blocking trade), band equi-join,
    exact popcount verify. The join runs on 4 rows of a few bytes per asset — never on
    payloads — which is what makes this viable when payloads are megabyte
    images: signatures travel, pixels don't.
    """
    sigs = mm_phash(mm)
    bands = sigs.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), i * 8)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("bits"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "phash", F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )

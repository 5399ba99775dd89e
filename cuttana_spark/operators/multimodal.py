"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata. The Spark-side
pipeline — schema, partitioning, Arrow batch shape, mapInPandas UDF
signatures — is real and tested; the codec step is STUBBED because no
image/audio libraries exist in this container: decode raises
NotImplementedError unless `fake=True`, which substitutes a deterministic
byte-statistics extractor so the distributed plumbing can be exercised
end-to-end.

Scale notes: mapInPandas streams Arrow batches (bounded memory per task even
with large blobs); `spark.sql.files.maxPartitionBytes` + the repartition on
media_id keep blob skew off single tasks; feature output is a fixed-width
array<float> column ready for the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = "media_id long, kind string, feature array<float>"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = [("image", "image/png"), ("audio", "audio/wav"), ("video", "video/mp4")]
    for i in range(n):
        kind, mime = kinds[i % 3]
        payload = rng.bytes(256 + (i % 5) * 128)
        rows.append(
            (
                i,
                kind,
                mime,
                64 + i % 32 if kind != "audio" else None,
                64 + i % 16 if kind != "audio" else None,
                1000 + i * 10 if kind != "image" else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: payload = the UTF-8 bytes
    of `text` (a real binary column through real Arrow plumbing), typed
    metadata derived deterministically from doc_id. This gives the media
    pipeline an input whose fake-codec features are reproducible by an
    external oracle (the byte stream is pure UTF-8 — DuckDB's
    hex(encode(text)) sees the identical bytes)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(kind == "image", F.lit("image/png"))
        .when(kind == "audio", F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.when(kind != "audio", (64 + F.col("doc_id") % 32).cast("int")).alias("width"),
        F.when(kind != "audio", (64 + F.col("doc_id") % 16).cast("int")).alias("height"),
        F.when(kind != "image", (1000 + F.col("doc_id") * 10).cast("int")).alias("duration_ms"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _decode(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic byte-statistics stub"
        )
    # deterministic stand-in: 16-bin byte histogram, L1-normalized
    arr = np.frombuffer(payload, np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media table → (media_id, kind, feature: array<float>) via mapInPandas
    (Arrow-batched; the per-blob loop is inside the batch, not per-row
    Python UDF calls)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode(p, k, fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.repartition("media_id").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 500, fake: bool = False) -> DataFrame:
    """video rows → (media_id, frame_ts_ms, frame: binary). Frame decode is
    stubbed; the fake path emits deterministic payload slices."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_ts_ms": [], "frame": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if not fake:
                    raise NotImplementedError("video codecs unavailable; fake=True")
                if dur is None or pd.isna(dur):
                    continue
                for ts in range(0, int(dur), every_ms):
                    off = ts % max(len(payload) - 16, 1)
                    out["media_id"].append(mid)
                    out["frame_ts_ms"].append(ts)
                    out["frame"].append(bytes(payload[off : off + 16]))
            yield pd.DataFrame(out)

    return (
        df.filter(F.col("kind") == "video")
        .repartition("media_id")
        .mapInPandas(run, "media_id long, frame_ts_ms int, frame binary")
    )

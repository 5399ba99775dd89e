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


# --------------------------------------------------------------------------
# real codecs (round 5): WAV + BMP are header-parseable in pure numpy — no
# external libs — which retires the env-blocked stub for two of three media
# kinds. The FEATURE stays the L1-normalized 16-bin high-nibble histogram of
# the decoded sample/pixel bytes: that choice is deliberate, because an
# external SQL oracle can recompute it from the same source bytes; what the
# real path adds (and tests) is the container work — RIFF chunk walking,
# PCM format validation, BMP pixel-offset/stride/padding handling.
# PNG/JPEG/MP4 remain honestly env-stubbed (zlib/DCT/H.264 are not
# "header parsing").
# --------------------------------------------------------------------------


def wrap_wav(data: bytes, sample_rate: int = 8000, bits: int = 8) -> bytes:
    """Wrap raw PCM sample bytes in a VALID RIFF/WAVE container (mono).
    A LIST/INFO chunk is inserted before `data` so a decoder cannot cheat
    with fixed offsets — it must walk chunks."""
    if bits not in (8, 16):
        raise ValueError("PCM bits must be 8 or 16")
    if bits == 16 and len(data) % 2:
        raise ValueError("16-bit PCM needs an even byte count")
    block_align = bits // 8
    fmt = (
        np.array([1, 1], "<u2").tobytes()  # PCM, mono
        + np.array([sample_rate, sample_rate * block_align], "<u4").tobytes()
        + np.array([block_align, bits], "<u2").tobytes()
    )
    info = b"INFOISFT" + np.array([6], "<u4").tobytes() + b"numpy\x00"
    chunks = (
        b"fmt " + np.array([len(fmt)], "<u4").tobytes() + fmt
        + b"LIST" + np.array([len(info)], "<u4").tobytes() + info
        + b"data" + np.array([len(data)], "<u4").tobytes() + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + np.array([4 + len(chunks)], "<u4").tobytes() + b"WAVE" + chunks


def wrap_bmp(data: bytes) -> bytes:
    """Wrap raw bytes as a VALID 8-bpp uncompressed BMP (one row of
    width=len(data), 256-entry grayscale palette, row zero-padded to the
     4-byte stride) — the decoder must honor the pixel-data offset and strip
    the stride padding to recover the bytes."""
    width = len(data)
    stride = (width + 3) // 4 * 4
    palette = np.repeat(np.arange(256, dtype=np.uint8), 4).tobytes()  # B,G,R,0
    off = 14 + 40 + len(palette)
    header = (
        b"BM"
        + np.array([off + stride, 0], "<u4").tobytes()[:8]  # file size, reserved
        + np.array([off], "<u4").tobytes()
        + np.array([40], "<u4").tobytes()  # BITMAPINFOHEADER
        + np.array([width, 1], "<i4").tobytes()  # width, height (1 row)
        + np.array([1, 8], "<u2").tobytes()  # planes, bpp
        + np.array([0, stride, 2835, 2835, 256, 0], "<u4").tobytes()
    )
    return header + palette + data + b"\x00" * (stride - width)


def _parse_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAVE → raw PCM data-chunk bytes (validated, chunk-walked)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, 8 + int(np.frombuffer(payload, "<u4", 1, 4)[0])
    fmt_seen, data = None, None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = int(np.frombuffer(payload, "<u4", 1, pos + 4)[0])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels = np.frombuffer(body, "<u2", 2, 0)
            bits = int(np.frombuffer(body, "<u2", 1, 14)[0])
            if audio_format != 1:
                raise NotImplementedError(f"non-PCM WAV (format {audio_format})")
            if bits not in (8, 16):
                raise NotImplementedError(f"{bits}-bit PCM")
            fmt_seen = (int(channels), bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # word alignment
    if fmt_seen is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(data, np.uint8)


def _parse_bmp(payload: bytes) -> np.ndarray:
    """BMP (8 bpp, uncompressed) → pixel bytes with stride padding stripped,
    rows in bottom-up storage order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP file")
    off = int(np.frombuffer(payload, "<u4", 1, 10)[0])
    width, height = (int(x) for x in np.frombuffer(payload, "<i4", 2, 18))
    bpp = int(np.frombuffer(payload, "<u2", 1, 28)[0])
    compression = int(np.frombuffer(payload, "<u4", 1, 30)[0])
    if bpp != 8 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    rows = abs(height)
    stride = (width + 3) // 4 * 4
    px = np.frombuffer(payload, np.uint8, rows * stride, off).reshape(rows, stride)
    return px[:, :width].reshape(-1)


def _decode(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    if not fake:
        data = None
        if payload[:4] == b"RIFF":
            data = _parse_wav(bytes(payload))
        elif payload[:2] == b"BM":
            data = _parse_bmp(bytes(payload))
        if data is None:
            raise NotImplementedError(
                "no codec for this payload in this environment (WAV/BMP are "
                "decoded natively; PNG/JPEG/MP4 need external libs) — pass "
                "fake=True for the deterministic byte-statistics stub"
            )
        return _nibble_hist(data)
    # deterministic stand-in: 16-bin byte histogram, L1-normalized
    return _nibble_hist(np.frombuffer(payload, np.uint8))


def _nibble_hist(arr: np.ndarray) -> np.ndarray:
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
    total = hist.sum()
    return hist / total if total else hist


def media_containers_from_documents(docs: DataFrame) -> DataFrame:
    """documents → media table whose payloads are REAL containers: even
    doc_ids become 8-bit PCM WAV files, odd doc_ids become 8-bpp BMP files,
    in both cases wrapping the UTF-8 bytes of `text` as the sample/pixel
    data. Decoding with the native parsers (fake=False) recovers exactly
    those bytes, so the nibble-histogram feature stays SQL-oracle-checkable
    while the decode step is a genuine container parse. Container synthesis
    runs Arrow-batched in mapInPandas (byte assembly is not expressible in
    JVM expressions)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(np.int64)
            texts = pdf["text"].to_numpy(dtype=object)
            payloads, kinds, mimes, widths, durs = [], [], [], [], []
            for i, t in zip(ids, texts):
                raw = str(t).encode("utf-8")
                if i % 2 == 0:
                    payloads.append(wrap_wav(raw))
                    kinds.append("audio")
                    mimes.append("audio/wav")
                    widths.append(None)
                    durs.append(len(raw) * 1000 // 8000)
                else:
                    payloads.append(wrap_bmp(raw))
                    kinds.append("image")
                    mimes.append("image/bmp")
                    widths.append(len(raw))
                    durs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "mime": mimes,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(
                        [None if w is None else 1 for w in widths], dtype="Int32"
                    ),
                    "duration_ms": pd.array(durs, dtype="Int32"),
                    "payload": payloads,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(build, MEDIA_SCHEMA)


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

"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
the schema, partitioning, Arrow batch shape, and UDF signatures are
real and tested; the *codec* step is stubbed because no image/audio
libraries exist in this container:

- :func:`decode_image` / :func:`decode_audio` / :func:`decode_video`
  raise ``NotImplementedError`` — the seam where Pillow / soundfile /
  pyav would plug in on a real cluster.
- :func:`media_features` runs the real ``mapInPandas`` pass but uses a
  clearly-marked DETERMINISTIC FAKE decode (dimensions derived from
  payload length) so the distributed plumbing is testable end-to-end
  and oracle-comparable.

Scale notes (100 TB): payloads never leave the executor — features
are computed per Arrow batch and only small typed rows shuffle.
``ARROW_BATCH_ROWS`` in session.py bounds batch memory for multi-MB
payloads; frame sampling is a native ``posexplode(sequence(...))`` so
the fan-out happens JVM-side without duplicating payload bytes per
frame row (frames project only ``media_id`` + indices).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta map<string,string>"
)

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("checksum", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("sample_rate", IntegerType()),
])


# ------------------------------------------------------------- codecs


def decode_image(payload: bytes):
    """Real image decode seam (Pillow on a real cluster)."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes):
    """Real audio decode seam (soundfile/librosa on a real cluster)."""
    raise NotImplementedError("audio codec not available in this environment")


def decode_video(payload: bytes):
    """Real video decode seam (pyav/ffmpeg on a real cluster)."""
    raise NotImplementedError("video codec not available in this environment")


def _fake_decode(kind: str, payload: bytes) -> dict:
    """DETERMINISTIC FAKE decode: stands in for the real codecs so the
    Spark-side plumbing is testable. Dimensions derive only from the
    payload byte length (engine-portable arithmetic, see the DuckDB
    twin in __spark_entry__)."""
    n = len(payload)
    out = {"width": 0, "height": 0, "n_frames": 0, "sample_rate": 0}
    if kind in ("image", "video"):
        out["width"] = 16 + n % 240
        out["height"] = 16 + (n * 7) % 240
        out["n_frames"] = 1 if kind == "image" else 1 + n % 32
    if kind == "audio":
        out["sample_rate"] = 8000 + (n % 8) * 1000
    return out


# ----------------------------------------------------------- operators


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table from `documents` (no external data):
    payload = utf-8 bytes of the text, kind round-robins by doc_id."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Per-media typed features via Arrow-batched ``mapInPandas``.

    The decode inside is :func:`_fake_decode` (see module doc); the
    batch loop, schema, and shuffle behavior are exactly what the real
    codec path would use.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, kind, payload in zip(b["media_id"], b["kind"], b["payload"]):
                payload = bytes(payload) if payload is not None else b""
                r = {"media_id": int(mid), "kind": kind,
                     "n_bytes": len(payload),
                     "checksum": hashlib.md5(payload).hexdigest()}
                r.update(_fake_decode(kind, payload))
                rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Sampled frame index rows for video media — native fan-out:
    sequence(0, n_frames-1, every) + posexplode, JVM-side, payload
    bytes are NOT duplicated per frame row."""
    feats = media_features(media).where(F.col("kind") == "video")
    return feats.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("sample_idx", "frame_idx"),
    )

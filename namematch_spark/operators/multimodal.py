"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata
(mime/width/height/duration) — the Iceberg-friendly layout for 100 TB
multimodal corpora.  Decode / feature-extraction runs through
``mapInPandas`` so each Arrow batch is processed vectorized, with the
partition sized by ``spark.sql.execution.arrow.maxRecordsPerBatch`` and
``maxPartitionBytes`` (binary payloads dominate scan size — keep
partitions small enough that a batch of decoded frames fits in worker
memory).

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
decode step is a clearly marked deterministic stub
(:func:`_decode_stub`); the Spark-side plumbing — schema, batch
iteration, UDF signature, partitioning — is real and tested.  Swapping
in a real decoder changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, payload binary, mime string, "
                "meta_width int, meta_height int, meta_duration_ms int")

FEATURE_SCHEMA = ("media_id string, mime string, n_bytes long, "
                  "sha256 string, feat array<float>, decode_ok boolean")


def _decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """STUB decode: deterministic fake 'features' derived from the
    payload hash.  A real deployment replaces this with PIL/librosa/
    ffmpeg decode + model inference; everything around it stays.

    Raises ``NotImplementedError`` for mime types the stub does not
    model, exactly like a real decoder would for unsupported codecs.
    """
    if not mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(f"unsupported mime: {mime}")
    digest = hashlib.sha256(payload).digest()
    # 16 deterministic floats in [0,1) from the content hash
    return np.frombuffer(digest[:16], dtype=np.uint8).astype(np.float32) / 255.0


def extract_media_features(media: DataFrame,
                           batch_log: bool = False) -> DataFrame:
    """Decode + feature-extract every media row via ``mapInPandas``.

    Arrow-batched: each ``pdf`` is one batch of payloads; decode failures
    degrade to ``decode_ok = false`` rows instead of failing the task
    (at 100 TB some payloads are always corrupt).
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "mime": [], "n_bytes": [],
                   "sha256": [], "feat": [], "decode_ok": []}
            for mid, payload, mime in zip(pdf["media_id"], pdf["payload"],
                                          pdf["mime"]):
                raw = bytes(payload) if payload is not None else b""
                out["media_id"].append(mid)
                out["mime"].append(mime)
                out["n_bytes"].append(len(raw))
                out["sha256"].append(hashlib.sha256(raw).hexdigest())
                try:
                    feat = _decode_stub(raw, mime)
                    out["feat"].append(feat.tolist())
                    out["decode_ok"].append(True)
                except NotImplementedError:
                    out["feat"].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(out)

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def docs_as_media(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Adapter: wrap a text corpus as a media table (payload = utf-8
    bytes, mime = image/fake) to exercise the binary plumbing with the
    deterministic stub decoder."""
    return docs.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.lit(64).alias("meta_width"),
        F.lit(64).alias("meta_height"),
        F.lit(0).alias("meta_duration_ms"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    to decode — the explode happens before the decoder so Spark
    parallelizes per frame, not per video (a single 3-hour video would
    otherwise pin one task).  Decode itself is the stub above."""
    n_frames = F.greatest(
        (F.col("meta_duration_ms") / every_ms).cast("int"), F.lit(1))
    return media.select(
        "media_id", "mime",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_ix"),
    ).withColumn("frame_ts_ms", F.col("frame_ix") * every_ms)

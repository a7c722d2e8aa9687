"""Multimodal column pipeline (SURVEY §2 Q96 family, driver-mandated).

Media assets are opaque ``BinaryType`` payloads with a typed metadata
struct — the engine never interprets bytes outside explicitly-marked
decode steps. All per-asset compute is Arrow-batched ``mapInPandas``:
batches of (id, payload, meta) rows stream through Python with columnar
transfer, and partitioning is preserved (decode never shuffles).

Layers:
- ``as_media_table``      wrap any (id, bytes) source in the media schema
- ``byte_histogram_features`` REAL feature extraction (16-bin byte
                          histogram, L1-normalized) — no media libs needed,
                          deterministic, useful for corpus fingerprinting
- ``sample_frames``       REAL frame sampling over the raw byte stream
                          (fixed-size frames, stride-k selection) — the
                          codec-free part of video sampling
- ``decode_media``        the decode boundary: uses PIL if importable,
                          otherwise a clearly-marked deterministic stub
                          (this container has no media libs). The Spark
                          plumbing — schema, batch iteration, output
                          contract — is identical either way.

Scale notes: payloads ride in parquet binary columns (page-compressed);
feature extraction is a map-only stage (no shuffle, no driver transfer);
at 100 TB the only knobs are input split size and Python worker count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary,"
    " meta struct<mime:string, n_bytes:int, width:int, height:int>"
)
FEATURE_DIM = 16
FRAME_BYTES = 64


def as_media_table(df: DataFrame, id_col: str, bytes_col: str, mime: str) -> DataFrame:
    """Wrap an (id, binary) source in the canonical media schema."""
    payload = F.col(bytes_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("int").alias("n_bytes"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
        ).alias("meta"),
    )


def byte_histogram_features(media: DataFrame) -> DataFrame:
    """16-bin byte histogram per asset, L1-normalized → array<double>.

    Real computation (not a stub): a cheap content fingerprint usable for
    clustering/near-dup blocking of binary corpora before any decode.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                hist = np.bincount(arr >> 4, minlength=FEATURE_DIM)
                feats.append((hist / arr.size).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(
        extract, schema=f"media_id long, features array<double>"
    )


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Split each payload into fixed FRAME_BYTES frames and keep every
    k-th — the codec-free shape of video frame sampling (a real decoder
    slots into the same loop). Output: one row per sampled frame."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(buf)
                n = (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n, every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(
        sample, schema="media_id long, frame_idx int, frame binary"
    )


def decode_media(media: DataFrame) -> DataFrame:
    """The decode boundary. With PIL present this opens real images; in
    this container (no media libs) it falls back to a DETERMINISTIC STUB
    that derives fake dimensions from the payload — the schema, Arrow
    batch shape, and partition behavior are exactly the production ones.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - media libs absent in this container
            import io

            from PIL import Image  # type: ignore

            def one(buf: bytes) -> tuple[int, int, str]:
                img = Image.open(io.BytesIO(buf))
                return img.width, img.height, "ok"

        except ImportError:

            def one(buf: bytes) -> tuple[int, int, str]:
                # STUB: deterministic fake decode (no codec available).
                n = len(buf)
                return (n % 640) + 1, (n % 480) + 1, "stubbed"

        for pdf in batches:
            w, h, status = [], [], []
            for buf in pdf["payload"]:
                dw, dh, st = one(bytes(buf))
                w.append(dw)
                h.append(dh)
                status.append(st)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "decode_status": status,
                }
            )

    return media.mapInPandas(
        decode,
        schema="media_id long, width int, height int, decode_status string",
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images use the real in-house codec (ukis_pysat_spark.codec); audio and
video decoders are STUBBED behind NotImplementedError (the decode libs
are not in this environment) — but the Spark-side plumbing (schema,
Arrow batch shape, partitioning) is real and tested, so dropping in a
real decoder is a one-function change.

- decode_stats      per-image band statistics (mean/std/min/max) —
                    a feature-extraction pass that never ships pixels.
- resize_images     nearest-neighbor resize to (out_h, out_w), real
                    numpy, re-encoded payloads.
- frame_sample      'video' payloads: treats the band axis as time and
                    samples every nth frame (deterministic fake for the
                    video path; the slicing/batching is the real code).
- decode_audio      stub: raises NotImplementedError inside the UDF
                    wrapper at call time with a clear message.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ukis_pysat_spark import codec

STATS_SCHEMA = (
    "image_id string, band int, mean double, std double, "
    "min double, max double, n_valid long"
)


def decode_stats(images: DataFrame, nodata: float | None = 0.0) -> DataFrame:
    """Per-band pixel statistics over valid (!= nodata) pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(r.bytes).astype(np.float64)
                for b in range(arr.shape[0]):
                    plane = arr[b]
                    if nodata is not None:
                        plane = plane[plane != nodata]
                    n = plane.size
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "band": b,
                            "mean": float(plane.mean()) if n else 0.0,
                            "std": float(plane.std()) if n else 0.0,
                            "min": float(plane.min()) if n else 0.0,
                            "max": float(plane.max()) if n else 0.0,
                            "n_valid": int(n),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(run, schema=STATS_SCHEMA)


def resize_images(images: DataFrame, out_h: int, out_w: int, out_fmt: str = "raw") -> DataFrame:
    """Nearest-neighbor resize; emits (image_id, bytes, w, h, caption)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(r.bytes)
                ri = (np.arange(out_h) * arr.shape[1] // out_h).astype(np.int64)
                ci = (np.arange(out_w) * arr.shape[2] // out_w).astype(np.int64)
                small = arr[:, ri[:, None], ci[None, :]]
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": codec.encode(np.ascontiguousarray(small), out_fmt),
                        "w": out_w,
                        "h": out_h,
                        "caption": r.caption,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return images.select("image_id", "bytes", "caption").mapInPandas(
        run, schema="image_id string, bytes binary, w int, h int, caption string"
    )


def frame_sample(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every nth frame of a (frames, rows, cols) payload; the
    deterministic fake video decode is the codec itself (band axis =
    time axis)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = codec.decode(r.bytes)
                for fi in range(0, arr.shape[0], every_n):
                    rows.append(
                        {
                            "image_id": r.image_id,
                            "frame": fi,
                            "bytes": codec.encode(arr[fi]),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return videos.select("image_id", "bytes").mapInPandas(
        run, schema="image_id string, frame int, bytes binary"
    )


def decode_audio(audio: DataFrame) -> DataFrame:
    """STUB — no audio codec in this environment.  The UDF wrapper and
    schema are the real plumbing; the decoder raises with a clear
    message the moment a task touches a payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                raise NotImplementedError(
                    "audio decode requires an audio codec library not present "
                    "in this environment; plug a decoder into decode_audio.run"
                )
            yield pd.DataFrame({"image_id": [], "n_samples": []})

    return audio.select("image_id", "bytes").mapInPandas(
        run, schema="image_id string, n_samples long"
    )

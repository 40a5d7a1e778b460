"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images use the real in-house codec (ukis_pysat_spark.codec); audio and
video decoders are STUBBED behind NotImplementedError (the decode libs
are not in this environment) — but the Spark-side plumbing (schema,
Arrow batch shape, partitioning) is real and tested, so dropping in a
real decoder is a one-function change.

All three payload-touching operators run as a SINGLE ``mapInArrow``
stage (round 4): decode_stats assembles columnar output lists directly
into RecordBatches (no pandas, no per-row dicts), and the two
payload-EMITTING operators (resize_images, frame_sample) go through the
Arrow-native PayloadBuf of operators/arrowio.py — one contiguous values
buffer + offsets per flush, zero per-row Python bytes objects, the same
discipline as the tiling/dn2toa emitters.

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
import pyarrow as pa
from pyspark.sql import DataFrame

from ukis_pysat_spark import codec
from ukis_pysat_spark.operators import arrowio

STATS_SCHEMA = (
    "image_id string, band int, mean double, std double, "
    "min double, max double, n_valid long"
)

_STATS_PA_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("band", pa.int32()),
        ("mean", pa.float64()),
        ("std", pa.float64()),
        ("min", pa.float64()),
        ("max", pa.float64()),
        ("n_valid", pa.int64()),
    ]
)


def decode_stats(images: DataFrame, nodata: float | None = 0.0) -> DataFrame:
    """Per-band pixel statistics over valid (!= nodata) pixels.

    One mapInArrow stage; the payload column enters as zero-copy Arrow
    buffer views and the (tiny) output rows are assembled as columnar
    lists -> one RecordBatch per input batch — no pandas anywhere."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("image_id").to_pylist()
            payload = batch.column("bytes")
            cols: dict[str, list] = {n: [] for n in _STATS_PA_SCHEMA.names}
            for ri in range(batch.num_rows):
                arr = codec.decode(payload[ri].as_buffer()).astype(np.float64)
                nb = arr.shape[0]
                # all bands in one vectorized pass (S2 scenes have 13):
                # masked moments via sums, extremes via +-inf sentinels
                if nodata is None:
                    valid = np.ones(arr.shape, dtype=bool)
                else:
                    valid = arr != nodata
                n = valid.sum(axis=(1, 2))
                safe_n = np.maximum(n, 1)
                masked = np.where(valid, arr, 0.0)
                s1 = masked.sum(axis=(1, 2))
                mean = s1 / safe_n
                # two-pass variance: E[x^2]-E[x]^2 cancels catastrophically
                # for high-mean/low-variance bands (6.8% rel. error observed
                # at mean 1e7, sigma 0.5); sum of squared deviations doesn't
                dev = np.where(valid, arr - mean[:, None, None], 0.0)
                var = (dev * dev).sum(axis=(1, 2)) / safe_n
                mn = np.where(valid, arr, np.inf).min(axis=(1, 2))
                mx = np.where(valid, arr, -np.inf).max(axis=(1, 2))
                empty = n == 0
                cols["image_id"].extend([ids[ri]] * nb)
                cols["band"].extend(range(nb))
                cols["mean"].extend(np.where(empty, 0.0, mean).tolist())
                cols["std"].extend(np.where(empty, 0.0, np.sqrt(var)).tolist())
                cols["min"].extend(np.where(empty, 0.0, mn).tolist())
                cols["max"].extend(np.where(empty, 0.0, mx).tolist())
                cols["n_valid"].extend(n.tolist())
            if cols["image_id"]:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cols[f.name], type=f.type)
                        for f in _STATS_PA_SCHEMA
                    ],
                    schema=_STATS_PA_SCHEMA,
                )

    return images.select("image_id", "bytes").mapInArrow(run, schema=STATS_SCHEMA)


def resize_images(
    images: DataFrame,
    out_h: int,
    out_w: int,
    out_fmt: str = "raw",
    method: str = "nearest",
) -> DataFrame:
    """Resize; emits (image_id, bytes, w, h, caption) through the
    Arrow-native payload buffer (1 -> 1 rows_fn).

    method='nearest' index-samples; method='area' block-averages
    (integer-bucket mean via two reduceat passes — the right filter
    for DOWNscaling training thumbnails; falls back to nearest on any
    axis that is upscaled, where area buckets would be empty).
    Integer dtypes round on the way back."""
    if method not in ("nearest", "area"):
        raise ValueError(f"unsupported resize method {method!r} (nearest | area)")

    def rows_fn(row: dict):
        arr = codec.decode(row["bytes"])
        if method == "area" and out_h <= arr.shape[1] and out_w <= arr.shape[2]:
            re = np.arange(out_h + 1) * arr.shape[1] // out_h
            ce = np.arange(out_w + 1) * arr.shape[2] // out_w
            sums = np.add.reduceat(
                np.add.reduceat(arr.astype(np.float64), re[:-1], axis=1),
                ce[:-1], axis=2,
            )
            counts = np.outer(np.diff(re), np.diff(ce)).astype(np.float64)
            mean = sums / counts[None, :, :]
            if np.issubdtype(arr.dtype, np.integer):
                mean = np.rint(mean)
            small = np.ascontiguousarray(mean.astype(arr.dtype))
        else:
            ri = (np.arange(out_h) * arr.shape[1] // out_h).astype(np.int64)
            ci = (np.arange(out_w) * arr.shape[2] // out_w).astype(np.int64)
            small = np.ascontiguousarray(arr[:, ri[:, None], ci[None, :]])
        meta = {
            "image_id": row["image_id"],
            "w": out_w,
            "h": out_h,
            "caption": row["caption"],
        }
        yield meta, small, out_fmt

    return arrowio.flat_map_payload_rows(
        images,
        ["image_id", "bytes", "caption"],
        rows_fn,
        fields=[
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("caption", pa.string()),
        ],
    )


def frame_sample(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every nth frame of a (frames, rows, cols) payload; the
    deterministic fake video decode is the codec itself (band axis =
    time axis).  1 -> N emission through the Arrow-native buffer."""

    def rows_fn(row: dict):
        arr = codec.decode(row["bytes"])
        for fi in range(0, arr.shape[0], every_n):
            yield {"image_id": row["image_id"], "frame": fi}, arr[fi], "raw"

    return arrowio.flat_map_payload_rows(
        videos,
        ["image_id", "bytes"],
        rows_fn,
        fields=[
            ("image_id", pa.string()),
            ("frame", pa.int32()),
            ("bytes", pa.binary()),
        ],
    )


def decode_audio(audio: DataFrame) -> DataFrame:
    """STUB — no audio codec in this environment.  The UDF wrapper and
    schema are the real plumbing; the decoder raises with a clear
    message the moment a task touches a payload."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows:
                raise NotImplementedError(
                    "audio decode requires an audio codec library not present "
                    "in this environment; plug a decoder into decode_audio.run"
                )
        yield pa.RecordBatch.from_arrays(
            [pa.array([], type=pa.string()), pa.array([], type=pa.int64())],
            names=["image_id", "n_samples"],
        )

    return audio.select("image_id", "bytes").mapInArrow(
        run, schema="image_id string, n_samples long"
    )

"""Multimodal column toolkit: opaque binary payloads + typed metadata.

A training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata alongside.  This module makes
the Spark-side plumbing real — schemas, vectorized batch shape,
partition-friendly operators — while the heavy codecs this container
lacks (libjpeg/ffmpeg/librosa) are stubbed behind
``NotImplementedError`` or a clearly-marked deterministic fake:

- :func:`image_metadata` — REAL for the formats this engine owns
  (PNG/BMP/GIF/SIMG via ``formats.py``) plus header-only JPEG (SOF
  scan, valid for real libjpeg files) and TIFF (IFD scan): format,
  width, height, channels, n_bytes.
- :func:`resize_images` — REAL nearest-neighbor resize for owned
  formats (re-encoded as gray PNG).
- :func:`audio_metadata` / :func:`sample_video_frames` — plumbing-real
  stubs: correct schemas, Arrow-batched, deterministic fake outputs
  derived from payload bytes, with the decode call sites marked.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import formats
from ..operators.preprocess import dpi_normalize

IMAGE_META_SCHEMA = (
    "format string, width int, height int, channels int, n_bytes bigint"
)


def make_image_metadata_udf():
    @F.pandas_udf(IMAGE_META_SCHEMA)
    def image_meta_udf(payloads: pd.Series) -> pd.DataFrame:
        out = {"format": [], "width": [], "height": [], "channels": [], "n_bytes": []}
        for p in payloads:
            p = bytes(p) if p is not None else None
            fmt = formats.sniff_format(p)
            w = h = ch = None
            try:
                if fmt == "PNG":
                    ct, arr = formats.decode_png(p)
                    h, w = arr.shape[:2]
                    ch = 1 if ct == 0 else 3
                elif fmt == "BMP":
                    arr = formats.decode_bmp_gray(p)
                    h, w, ch = arr.shape[0], arr.shape[1], 1
                elif fmt == "GIF":
                    arr = formats.decode_gif_gray(p)
                    h, w, ch = arr.shape[0], arr.shape[1], 1
                elif fmt == "SIMG":
                    arr = formats.decode_simg(p)
                    h, w = arr.shape[:2]
                    ch = 1 if arr.ndim == 2 else arr.shape[2]
                elif fmt == "JPEG":
                    # header-only SOF scan: works on real libjpeg output,
                    # no pixel decode needed for metadata
                    w, h, ch = formats.jpeg_dimensions(p)
                elif fmt == "TIFF":
                    w, h, ch = formats.tiff_dimensions(p)
            except NotImplementedError:
                raise
            except Exception:
                fmt = "CORRUPT"
            out["format"].append(fmt)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(ch)
            out["n_bytes"].append(len(p) if p is not None else 0)
        return pd.DataFrame(out)

    return image_meta_udf


def image_metadata(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """Attach typed image metadata (struct column ``image_meta``)."""
    return df.withColumn("image_meta", make_image_metadata_udf()(F.col(payload_col)))


def make_resize_udf(target_width: int = 32):
    @F.pandas_udf("binary")
    def resize_udf(payloads: pd.Series) -> pd.Series:
        def one(p):
            if p is None:
                return None
            p = bytes(p)
            fmt = formats.sniff_format(p)
            if fmt == "PNG":
                ct, arr = formats.decode_png(p)
                gray = arr if ct == 0 else formats.rgb_to_gray(arr)
            elif fmt == "BMP":
                gray = formats.decode_bmp_gray(p)
            elif fmt == "GIF":
                gray = formats.decode_gif_gray(p)
            elif fmt == "TIFF":
                try:  # real for baseline uncompressed gray; else opaque
                    gray = formats.decode_tiff_gray(p)
                except ValueError:
                    return None
            elif fmt == "JPEG":
                try:  # stand-in only: real JPEG pixel decode needs libjpeg
                    gray = formats.decode_jpeg_gray(p)
                except Exception:
                    raise NotImplementedError(
                        "real JPEG pixel decode requires libjpeg (not in container)"
                    )
            else:
                return None
            return formats.encode_png(dpi_normalize(gray, target_width))

        return payloads.map(one)

    return resize_udf


def resize_images(df: DataFrame, payload_col: str = "html",
                  target_width: int = 32) -> DataFrame:
    return df.withColumn("resized", make_resize_udf(target_width)(F.col(payload_col)))


AUDIO_META_SCHEMA = "codec string, sample_rate int, n_samples bigint, duration_s double"


def make_audio_metadata_udf(fake: bool = True):
    """Audio decode is NOT available in this container (no soundfile/
    ffmpeg).  ``fake=True`` derives deterministic pseudo-metadata from
    the payload digest so downstream plumbing (schemas, joins,
    aggregations) is testable; ``fake=False`` raises at the decode call
    site, which is where a real codec plugs in."""

    @F.pandas_udf(AUDIO_META_SCHEMA)
    def audio_meta_udf(payloads: pd.Series) -> pd.DataFrame:
        out = {"codec": [], "sample_rate": [], "n_samples": [], "duration_s": []}
        for p in payloads:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires ffmpeg/soundfile (not in this container)"
                )
            d = hashlib.blake2b(bytes(p or b""), digest_size=8).digest()
            rate = 16000 if d[0] % 2 == 0 else 44100
            n = int.from_bytes(d[1:4], "big")
            out["codec"].append("fake-pcm")
            out["sample_rate"].append(rate)
            out["n_samples"].append(n)
            out["duration_s"].append(round(n / rate, 6))
        return pd.DataFrame(out)

    return audio_meta_udf


FRAME_SAMPLE_SCHEMA = "url string, frame_idx int, frame binary"


def sample_video_frames(df: DataFrame, payload_col: str = "html",
                        every_n: int = 2, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame
    (explode shape identical to PDF page explode, so the same
    partitioning/skew strategy applies).  Real video decode is stubbed;
    the fake emits deterministic frame payloads derived from
    (payload digest, frame index)."""

    def gen(batches):
        for pdf in batches:
            urls, idxs, frames_out = [], [], []
            for url, p in zip(pdf["url"], pdf[payload_col]):
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg (not in this container)"
                    )
                d = hashlib.blake2b(bytes(p or b""), digest_size=8).digest()
                n_frames = (d[0] % 8) + 2
                for i in range(0, n_frames, every_n):
                    urls.append(url)
                    idxs.append(i)
                    frames_out.append(
                        hashlib.blake2b(d + i.to_bytes(4, "big"), digest_size=16).digest()
                    )
            yield pd.DataFrame({"url": urls, "frame_idx": idxs, "frame": frames_out})

    return df.select("url", payload_col).mapInPandas(gen, FRAME_SAMPLE_SCHEMA)

"""Multimodal columns (driver mandate): image / audio / video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

Design for 100 TB: payloads never leave the executor — every operator
column-prunes to (id, meta, payload) before the Arrow boundary, decodes
per batch with numpy, and emits small typed feature rows. Partitioning
follows the parent table (media_id-hash); no operator shuffles payload
bytes except an explicit repartition the caller asks for.

Codecs: RAW formats decode for real (pure numpy — ``rgb8`` height×width×3
uint8, ``pcm16`` mono int16, ``rawvideo`` n_frames×h×w×3). COMPRESSED
codecs (jpeg/png/mp3/h264) require external libraries that are not in
this container; they are gated behind an import-try and raise
``NotImplementedError`` with a clear message when unavailable — the
Spark-side plumbing (schema, batch shape, UDF signatures) is identical
either way and is what the tests pin down.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, codec string, width int, height int, "
    "sample_rate int, n_frames int, payload binary"
)

_RAW_CODECS = {"rgb8", "pcm16", "rawvideo"}


# ---------------------------------------------------------------------------
# deterministic synthesis (counter-based, same discipline as sources/synth)
# ---------------------------------------------------------------------------


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _bytes_for(media_id: int, n: int) -> np.ndarray:
    words = _splitmix(np.arange((n + 7) // 8, dtype=np.uint64) + np.uint64(media_id * 1_000_003))
    return words.view(np.uint8)[:n]


def synth_media_pdf(n: int = 60) -> pd.DataFrame:
    """Deterministic media rows cycling image / audio / video kinds."""
    rows = []
    for i in range(n):
        k = i % 3
        if k == 0:
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
            rows.append((i, "image", "rgb8", w, h, 0, 0, _bytes_for(i, w * h * 3).tobytes()))
        elif k == 1:
            sr, samples = 8000, 2000 + (i % 5) * 500
            rows.append((i, "audio", "pcm16", 0, 0, sr, 0, _bytes_for(i, samples * 2).tobytes()))
        else:
            w, h, nf = 8, 6, 4 + (i % 3) * 2
            rows.append((i, "video", "rawvideo", w, h, 0, nf, _bytes_for(i, nf * w * h * 3).tobytes()))
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "codec", "width", "height", "sample_rate", "n_frames", "payload"],
    )


def synth_media(spark: SparkSession, n: int = 60, partitions: int = 4) -> DataFrame:
    return spark.createDataFrame(synth_media_pdf(n)).repartition(partitions)


# ---------------------------------------------------------------------------
# decode (the only codec-aware spot)
# ---------------------------------------------------------------------------


def decode_image(payload: bytes, codec: str, width: int, height: int) -> np.ndarray:
    """→ (height, width, 3) uint8. Raw RGB decodes with numpy; compressed
    codecs try PIL and raise NotImplementedError when absent."""
    if codec == "rgb8":
        return np.frombuffer(payload, dtype=np.uint8, count=width * height * 3).reshape(height, width, 3)
    try:
        import io

        from PIL import Image  # not in this container; real path elsewhere

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError as e:
        raise NotImplementedError(
            f"codec {codec!r} needs an image library (PIL) that is not installed; "
            "raw 'rgb8' payloads decode natively"
        ) from e


def decode_audio(payload: bytes, codec: str) -> np.ndarray:
    if codec == "pcm16":
        return np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
    raise NotImplementedError(f"codec {codec!r} needs an audio library; 'pcm16' decodes natively")


def decode_video(payload: bytes, codec: str, width: int, height: int, n_frames: int) -> np.ndarray:
    if codec == "rawvideo":
        return np.frombuffer(payload, dtype=np.uint8, count=n_frames * height * width * 3).reshape(
            n_frames, height, width, 3
        )
    raise NotImplementedError(f"codec {codec!r} needs a video library; 'rawvideo' decodes natively")


# ---------------------------------------------------------------------------
# operators (mapInPandas; payload-pruned inputs, typed feature outputs)
# ---------------------------------------------------------------------------


def image_features(media: DataFrame) -> DataFrame:
    """Images → (media_id, mean_r/g/b, std_gray, phash) — 64-bit average
    perceptual hash from an 8×8 nearest-neighbor downsample."""

    def gen(batches):
        for pdf in batches:
            out = {"media_id": [], "mean_r": [], "mean_g": [], "mean_b": [], "std_gray": [], "phash": []}
            for mid, codec, w, h, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                img = decode_image(bytes(payload), codec, int(w), int(h))
                gray = img.astype(np.float64).mean(axis=2)
                small = _resize_nn(gray[..., None], 8, 8)[..., 0]
                bits = (small > np.median(small)).flatten()
                phash = int(np.packbits(bits).view(">u8")[0].item() - (1 << 63))
                out["media_id"].append(int(mid))
                out["mean_r"].append(float(img[..., 0].mean()))
                out["mean_g"].append(float(img[..., 1].mean()))
                out["mean_b"].append(float(img[..., 2].mean()))
                out["std_gray"].append(float(gray.std()))
                out["phash"].append(phash)
            yield pd.DataFrame(out)

    pruned = media.where(F.col("kind") == "image").select("media_id", "codec", "width", "height", "payload")
    return pruned.mapInPandas(
        gen, "media_id long, mean_r double, mean_g double, mean_b double, std_gray double, phash long"
    )


def _resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Images → resized raw rgb8 payloads (nearest neighbor, numpy)."""

    def gen(batches):
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, codec, w, h, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                img = decode_image(bytes(payload), codec, int(w), int(h))
                rows["media_id"].append(int(mid))
                rows["width"].append(out_w)
                rows["height"].append(out_h)
                rows["payload"].append(_resize_nn(img, out_w, out_h).tobytes())
            yield pd.DataFrame(rows)

    pruned = media.where(F.col("kind") == "image").select("media_id", "codec", "width", "height", "payload")
    return pruned.mapInPandas(gen, "media_id long, width int, height int, payload binary")


def audio_features(media: DataFrame, frame: int = 400) -> DataFrame:
    """Audio → (media_id, n_samples, rms, zero_crossings, n_loud_frames)."""

    def gen(batches):
        for pdf in batches:
            rows = {"media_id": [], "n_samples": [], "rms": [], "zero_crossings": [], "n_loud_frames": []}
            for mid, codec, payload in zip(pdf["media_id"], pdf["codec"], pdf["payload"]):
                x = decode_audio(bytes(payload), codec)
                rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                zc = int(((x[:-1] * x[1:]) < 0).sum()) if len(x) > 1 else 0
                nf = len(x) // frame
                loud = 0
                if nf:
                    fr = x[: nf * frame].reshape(nf, frame)
                    loud = int((np.sqrt((fr * fr).mean(axis=1)) > rms).sum())
                rows["media_id"].append(int(mid))
                rows["n_samples"].append(len(x))
                rows["rms"].append(rms)
                rows["zero_crossings"].append(zc)
                rows["n_loud_frames"].append(loud)
            yield pd.DataFrame(rows)

    pruned = media.where(F.col("kind") == "audio").select("media_id", "codec", "payload")
    return pruned.mapInPandas(
        gen, "media_id long, n_samples long, rms double, zero_crossings long, n_loud_frames long"
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video → one row per sampled frame (media_id, frame_idx, frame as
    raw rgb8) — the frame-sampling fan-out stage of a video pipeline."""

    def gen(batches):
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "width": [], "height": [], "frame": []}
            for mid, codec, w, h, nf, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["width"], pdf["height"], pdf["n_frames"], pdf["payload"]
            ):
                vid = decode_video(bytes(payload), codec, int(w), int(h), int(nf))
                for idx in range(0, int(nf), every_n):
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(idx)
                    rows["width"].append(int(w))
                    rows["height"].append(int(h))
                    rows["frame"].append(vid[idx].tobytes())
            yield pd.DataFrame(rows)

    pruned = media.where(F.col("kind") == "video").select(
        "media_id", "codec", "width", "height", "n_frames", "payload"
    )
    return pruned.mapInPandas(gen, "media_id long, frame_idx long, width int, height int, frame binary")

"""Multimodal binary-column operators (training-data-pipeline mandate).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batching, partition behavior,
UDF signatures — is real and tested; the actual media DECODE is stubbed:
no image/audio libraries exist in this container, so the decode step
either raises NotImplementedError (real-engine injection point) or runs
the clearly-marked deterministic fake (byte-histogram features), exactly
as the task brief prescribes.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


MEDIA_FEATURES = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("media_kind", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("sha256", T.StringType(), True),
    T.StructField("entropy", T.DoubleType(), True),
    T.StructField("byte_histogram", T.ArrayType(T.FloatType()), True),
    T.StructField("decoded", T.BooleanType(), True),
    T.StructField("decode_error", T.StringType(), True),
])

_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff_av"),      # wav/avi/webp container
    (b"\x00\x00\x00", "mp4_maybe"),
    (b"%PDF-", "pdf"),
    (b"ID3", "mp3"),
    (b"OggS", "ogg"),
]


def sniff_media_kind(data: bytes | None) -> str:
    if not data:
        return "empty"
    for magic, kind in _MAGIC:
        if data.startswith(magic):
            return kind
    head = data[:256].lower()
    if b"<html" in head or b"<!doctype" in head:
        return "html"
    return "unknown"


def decode_media(data: bytes, kind: str):
    """Decode one media payload to typed metadata.

    Guarded optional import (VERDICT r3 item 3): with ``PIL`` on the
    cluster image, image kinds decode for real — returns
    ``{"width", "height", "mode"}``. Audio/video kinds need
    ffmpeg/torchaudio (still injection points). Without the libraries
    (this sandbox) raises NotImplementedError; the deterministic
    byte-histogram fake below is the test/bench stand-in — same
    mapInPandas plumbing, swapped engine."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - sandbox has no PIL
        raise NotImplementedError(
            "media decoding requires image libraries not present in "
            "this environment; the deterministic byte-histogram fake "
            "below is used for tests/benchmarks instead") from exc
    if kind not in ("jpeg", "png", "gif"):  # pragma: no cover
        raise NotImplementedError(
            f"no decoder wired for media kind {kind!r} (ffmpeg/"
            "torchaudio injection point)")
    img = Image.open(io.BytesIO(data))  # pragma: no cover
    img.load()                          # pragma: no cover
    return {"width": img.width, "height": img.height,  # pragma: no cover
            "mode": img.mode}


def fake_features(data: bytes, bins: int = 16) -> tuple[float, list[float]]:
    """DETERMINISTIC FAKE feature extractor: coarse byte histogram
    (normalized) + Shannon entropy over it. Stands in for image
    embeddings so the distributed plumbing is fully exercised."""
    if not data:
        return 0.0, [0.0] * bins
    counts = [0] * bins
    step = 256 // bins
    for b in data:
        counts[b // step] += 1
    n = len(data)
    hist = [c / n for c in counts]
    entropy = -sum(p * math.log2(p) for p in hist if p > 0)
    return round(entropy, 6), [round(h, 6) for h in hist]


def make_media_fn(run_id: str, metrics_dir=None, use_fake: bool = True):
    def media_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MEDIA_FEATURES.fields}
            for url, data in zip(pdf["url"], pdf["html"]):
                data = bytes(data) if data is not None else None
                n = len(data) if data else 0
                kind = sniff_media_kind(data)
                decoded = False
                err = None
                entropy = None
                hist = None
                if data:
                    try:
                        if use_fake:
                            entropy, hist = fake_features(data)
                            decoded = True
                        else:
                            decode_media(data, kind)
                    except NotImplementedError as exc:
                        err = str(exc)[:120]
                out["url"].append(url)
                out["media_kind"].append(kind)
                out["n_bytes"].append(n)
                out["sha256"].append(
                    hashlib.sha256(data).hexdigest() if data else None)
                out["entropy"].append(entropy)
                out["byte_histogram"].append(hist)
                out["decoded"].append(decoded)
                out["decode_error"].append(err)
            df = pd.DataFrame(out)
            df["n_bytes"] = df["n_bytes"].astype("int64")
            yield df
    return media_fn


def extract_media_features(df: DataFrame, run_id: str = "media",
                           metrics_dir: str | None = None,
                           use_fake: bool = True) -> DataFrame:
    """web_pages(url, html, …) → MEDIA_FEATURES rows (one per doc)."""
    return df.select("url", "html").mapInPandas(
        make_media_fn(run_id, metrics_dir, use_fake), schema=MEDIA_FEATURES)


# ---------------------------------------------------------------------------
# derivative operators: resize (thumbnail) + frame sampling
# (task brief: "decode / feature-extract / resize / frame-sample as
# Pandas UDFs over mapInPandas ... STUB the decode step ... make the
# Spark-side plumbing — schema, partitioning, UDF signature, batch
# shape — real and tested")
# ---------------------------------------------------------------------------

MEDIA_DERIVATIVES_SCHEMA = (
    "url string, media_kind string, "
    "thumb_w int, thumb_h int, thumb_sha256 string, "
    "n_frames int, frame_shas array<string>, "
    "decoded boolean, decode_error string")


def resize_media(data: bytes, w: int, h: int) -> bytes:
    """Resize one image payload to a ``w`` × ``h`` thumbnail's raw RGB
    buffer. Guarded optional import: real with ``PIL`` present, else
    NotImplementedError (fake_thumbnail is the sandbox stand-in)."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - sandbox has no PIL
        raise NotImplementedError(
            "image resize requires PIL/ffmpeg, not present in this "
            "environment; fake_thumbnail is used for tests/"
            "benchmarks") from exc
    img = Image.open(io.BytesIO(data)).convert("RGB")  # pragma: no cover
    img = img.resize((w, h))                           # pragma: no cover
    return img.tobytes()                               # pragma: no cover


def fake_thumbnail(data: bytes, w: int, h: int) -> bytes:
    """DETERMINISTIC FAKE resize: sample w*h bytes evenly across the
    payload — same output length and addressing a real thumbnail's
    pixel buffer would have, so downstream schema/size handling is
    fully exercised."""
    n = len(data)
    total = w * h
    if n == 0 or total == 0:
        return b""
    step = max(n // total, 1)
    return bytes(data[min(i * step, n - 1)] for i in range(total))


def sample_frames(data: bytes, stride: int) -> list[bytes]:
    """Sample every ``stride``-th video frame as raw RGB bytes.
    Guarded optional import: real with ``pyav`` present (ffmpeg
    bindings), else NotImplementedError (fake_frames is the sandbox
    stand-in)."""
    try:
        import io

        import av
    except ImportError as exc:  # pragma: no cover - sandbox has no pyav
        raise NotImplementedError(
            "video frame sampling requires ffmpeg/pyav, not present in "
            "this environment; fake_frames is used for tests/"
            "benchmarks") from exc
    frames = []                                        # pragma: no cover
    with av.open(io.BytesIO(data)) as container:       # pragma: no cover
        for i, frame in enumerate(container.decode(video=0)):
            if i % stride == 0:
                frames.append(frame.to_rgb().planes[0].to_bytes())
    return frames                                      # pragma: no cover


def fake_frames(data: bytes, stride: int,
                frame_bytes: int = 4096) -> list[bytes]:
    """DETERMINISTIC FAKE frame sampler: treat the payload as
    fixed-size 'frames' and keep every ``stride``-th one."""
    if not data or stride <= 0:
        return []
    frames = [data[i:i + frame_bytes]
              for i in range(0, len(data), frame_bytes)]
    return frames[::stride]


def make_derivatives_fn(thumb_w: int, thumb_h: int, frame_stride: int,
                        use_fake: bool = True):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "url": [], "media_kind": [], "thumb_w": [], "thumb_h": [],
                "thumb_sha256": [], "n_frames": [], "frame_shas": [],
                "decoded": [], "decode_error": []}
            for url, data in zip(pdf["url"], pdf["html"]):
                data = bytes(data) if data is not None else b""
                kind = sniff_media_kind(data or None)
                thumb_sha = None
                shas: list[str] = []
                decoded = False
                err = None
                try:
                    if use_fake:
                        thumb = fake_thumbnail(data, thumb_w, thumb_h)
                        frames = fake_frames(data, frame_stride)
                        decoded = True
                    else:
                        thumb = resize_media(data, thumb_w, thumb_h)
                        frames = sample_frames(data, frame_stride)
                        decoded = True
                    thumb_sha = (hashlib.sha256(thumb).hexdigest()
                                 if thumb else None)
                    shas = [hashlib.sha256(f).hexdigest() for f in frames]
                except NotImplementedError as exc:
                    err = str(exc)[:120]
                out["url"].append(url)
                out["media_kind"].append(kind)
                out["thumb_w"].append(thumb_w)
                out["thumb_h"].append(thumb_h)
                out["thumb_sha256"].append(thumb_sha)
                out["n_frames"].append(len(shas))
                out["frame_shas"].append(shas)
                out["decoded"].append(decoded)
                out["decode_error"].append(err)
            df = pd.DataFrame(out)
            df["thumb_w"] = df["thumb_w"].astype("int32")
            df["thumb_h"] = df["thumb_h"].astype("int32")
            df["n_frames"] = df["n_frames"].astype("int32")
            yield df
    return fn


def extract_media_derivatives(df: DataFrame, thumb_w: int = 16,
                              thumb_h: int = 16, frame_stride: int = 4,
                              use_fake: bool = True) -> DataFrame:
    """web_pages(url, html, …) → per-doc thumbnail digest + sampled-frame
    digests. Same partitioning contract as extract_media_features: the
    fat binary column crosses Arrow exactly once, derivatives come back
    as compact typed columns."""
    return df.select("url", "html").mapInPandas(
        make_derivatives_fn(thumb_w, thumb_h, frame_stride, use_fake),
        schema=MEDIA_DERIVATIVES_SCHEMA)

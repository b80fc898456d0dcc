"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode/feature kernels themselves are pluggable: real codecs
(Pillow/librosa/av) are not available in this container, so the default
decoder raises ``NotImplementedError`` and a deterministic fake decoder
exists for tests — but the Spark-side plumbing (schema, batch iteration,
partition sizing) is real and is exactly what a production deployment
reuses with a real kernel.

Scale posture: media bytes never pass through the driver; each Arrow batch
is decoded inside an executor python worker. ``repartition`` before decode
controls batch memory (bytes/row × rows/batch); decode output carries only
features + metadata, so the heavy binary column can be dropped immediately
after the map.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

#: Canonical multimodal record layout: content + typed metadata.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),   # image | audio | video
    StructField("content", BinaryType()),
    StructField("mime", StringType()),
    StructField("n_bytes", LongType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_intensity", DoubleType()),
])


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic test media: 64 pseudo-random bytes derived from the
    row's text via chained md5 — stands in for real image bytes so the
    decode plumbing is testable in-container."""
    h = F.concat(*[F.unhex(F.md5(F.concat(F.lit(str(i)), F.col(text_col))))
                   for i in range(4)])
    return df.select(F.col(id_col).alias("media_id"),
                     F.lit("image").alias("media_type"),
                     h.alias("content"),
                     F.lit("image/fake").alias("mime"),
                     F.length(h).cast("long").alias("n_bytes"))


def fake_image_decoder(content: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real decoder: derives (width, height,
    mean byte intensity) purely from the bytes."""
    if not content:
        return 0, 0, 0.0
    width = 1 + content[0] % 64
    height = 1 + content[1] % 64
    mean = sum(content) / len(content)
    return width, height, mean


def real_image_decoder(content: bytes):  # pragma: no cover - needs Pillow
    """Production decoder slot. Requires an image codec library that is not
    installed in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires Pillow; use fake_image_decoder for "
            "plumbing tests or install a codec at deploy time") from e
    import io
    import PIL.Image as Image
    img = Image.open(io.BytesIO(content))
    import numpy as np
    arr = np.asarray(img.convert("L"), dtype="float64")
    return img.width, img.height, float(arr.mean())


def decode_images(media: DataFrame,
                  decoder: Callable[[bytes], tuple[int, int, float]] | None = None,
                  batch_partitions: int | None = None) -> DataFrame:
    """Decode image bytes to features via Arrow-batched ``mapInPandas``.

    The per-batch loop is plain python over a pandas column of bytes —
    the idiomatic shape for opaque-binary kernels (codecs are not
    vectorizable anyway); Arrow only pays for transfer once per batch.
    """
    from .session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)
    decoder = decoder or real_image_decoder
    if batch_partitions:
        media = media.repartition(batch_partitions)

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats = [decoder(c) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mean_intensity": [f[2] for f in feats],
            })

    return media.mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("content", BinaryType()),
])


def fake_image_resizer(content: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for a real resampler: stride-samples the
    byte stream down to w*h bytes (repeating cyclically when upscaling)."""
    if not content:
        return b""
    n = max(w * h, 1)
    return bytes(content[(i * len(content)) // n] for i in range(n))


def resize_images(media: DataFrame, w: int, h: int,
                  resizer=None) -> DataFrame:
    """Resize kernel over ``mapInPandas`` — same plumbing contract as
    :func:`decode_images` but binary-in/binary-out, the shape used by
    thumbnailing / normalization stages ahead of feature extraction.
    Output rows carry the new dimensions + resized bytes only; the
    original binary column never outlives the batch."""
    from .session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)
    resizer = resizer or fake_image_resizer

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": w, "height": h,
                "content": [resizer(bytes(c), w, h) for c in pdf["content"]],
            })

    return media.mapInPandas(fn, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_samples", IntegerType()),
    StructField("rms", DoubleType()),
    StructField("zero_crossing_rate", DoubleType()),
])


def fake_audio_decoder(content: bytes) -> tuple[int, float, float]:
    """Deterministic stand-in for a waveform decoder: interprets bytes as
    centered int8 samples and derives (n_samples, rms, zero-crossing
    rate) — the canonical cheap audio-quality features."""
    if not content:
        return 0, 0.0, 0.0
    import math

    samples = [b - 128 for b in content]
    # math.sqrt, not ** 0.5: sqrt is correctly rounded IEEE (identical to
    # any SQL engine's SQRT); pow(x, 0.5) is not guaranteed to be.
    rms = math.sqrt(sum(s * s for s in samples) / len(samples))
    zc = sum(1 for a, b in zip(samples, samples[1:]) if (a < 0) != (b < 0))
    zcr = zc / max(len(samples) - 1, 1)
    return len(samples), rms, zcr


def real_audio_decoder(content: bytes):  # pragma: no cover - needs soundfile
    """Production decoder: decodes any libsndfile-supported container
    (WAV/FLAC/OGG/...) via the optional public ``soundfile`` dep and
    emits the same (n_samples, rms, zero_crossing_rate) tuple as
    :func:`fake_audio_decoder` — drop-in under the identical
    ``mapInPandas`` contract. Raises ``NotImplementedError`` when the
    codec library is absent (this container), keeping the fake kernel as
    the oracle-checked path; tests/test_multimodal.py auto-skips the
    real-codec case on ImportError."""
    try:
        import soundfile as sf
    except ImportError as e:
        raise NotImplementedError(
            "real audio decode requires soundfile (libsndfile); use "
            "fake_audio_decoder for plumbing tests or install the codec "
            "at deploy time") from e
    import io
    import math

    import numpy as np
    data, _sr = sf.read(io.BytesIO(content), dtype="float64",
                        always_2d=True)
    mono = data.mean(axis=1)
    n = int(mono.shape[0])
    if n == 0:
        return 0, 0.0, 0.0
    rms = math.sqrt(float(np.mean(mono * mono)))
    neg = mono < 0
    zc = int(np.sum(neg[:-1] != neg[1:])) if n > 1 else 0
    return n, rms, zc / max(n - 1, 1)


def audio_features(media: DataFrame, decoder=None) -> DataFrame:
    """Audio feature extraction via Arrow-batched ``mapInPandas`` —
    identical plumbing to :func:`decode_images` with an audio-typed
    output schema."""
    from .session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)
    decoder = decoder or real_audio_decoder

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            feats = [decoder(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_samples": [f[0] for f in feats],
                "rms": [f[1] for f in feats],
                "zero_crossing_rate": [f[2] for f in feats],
            })

    return media.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 16) -> DataFrame:
    """Video-frame-sampling stand-in: emits one row per sampled "frame"
    offset with a byte-derived fingerprint — demonstrates the 1→N
    ``mapInPandas`` shape (explode-like output schema) used by real frame
    samplers."""
    from .session import ensure_package_on_executors
    ensure_package_on_executors(media.sparkSession)
    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_fingerprint", LongType()),
    ])

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_fingerprint": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for i, off in enumerate(range(0, len(content), every_n_bytes)):
                    chunk = content[off:off + every_n_bytes]
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame_fingerprint"].append(
                        int.from_bytes(chunk[:8].ljust(8, b"\0"), "big",
                                       signed=True))
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, schema)

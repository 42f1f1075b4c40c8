"""Multimodal (image/audio/video) column operators.

Driver-mandated LLM-pipeline extension.  Media payloads are opaque
``binary`` columns with typed metadata (the reference's precedent for
binary payloads is the VARBINARY(MAX) employee Photo column,
dimension.employee.sql:8).

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the codec step itself is stubbed because
image/audio libraries are not in this container:

* ``decode_image_meta`` parses width/height from PNG/GIF/JPEG headers in
  pure Python (deterministic, no external libs).
* ``decode_image_pixels`` raises NotImplementedError unless a decoder
  callback is injected (`set_decoder`), which is where Pillow/soundfile
  would plug in on a real cluster.

Scale notes: media rows are large and variable — the operators use
mapInPandas (arrow-batched iterator) so one task never materializes more
than ``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads, and
repartitioning by content hash keeps tasks size-balanced regardless of
per-file skew.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, source_uri string"
)

_DECODER: Callable[[bytes], object] | None = None


def set_decoder(fn: Callable[[bytes], object]) -> None:
    """Inject a real media decoder (e.g. PIL.Image.open) on clusters that
    have the codec libraries installed."""
    global _DECODER
    _DECODER = fn


def media_table(df: DataFrame, payload_col: str, kind: str, mime: str) -> DataFrame:
    """Normalize an arbitrary DataFrame with a binary column into the
    canonical media schema, content-hash partitioned (size-balanced)."""
    out = df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).alias("payload"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("string").alias("source_uri"),
    )
    return out.repartition(F.crc32(F.col("payload").cast("binary")))


def _parse_image_header(b: bytes) -> tuple[str, int, int] | None:
    """Pure-python header sniffing for PNG / GIF / JPEG (deterministic fake
    of the decode step — format + dimensions without a codec library)."""
    if b is None or len(b) < 10:
        return None
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments to SOF0/SOF2
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
    return None


def decode_image_meta(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Extract (format, width, height, n_bytes) per image via mapInPandas.

    Arrow-batched; the UDF touches only header bytes, so throughput is
    IO-bound — the correct shape for a 100 TB media scan.
    """

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [_parse_image_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [m[0] if m else None for m in metas],
                    "width": [m[1] if m else None for m in metas],
                    "height": [m[2] if m else None for m in metas],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                }
            )

    return media.mapInPandas(
        extract,
        "media_id long, format string, width int, height int, n_bytes long",
    )


def decode_image_pixels(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Full pixel decode — requires an injected decoder (set_decoder).

    STUB: the container has no image codec; on a real cluster inject
    ``set_decoder(lambda b: np.asarray(PIL.Image.open(io.BytesIO(b))))``.
    """
    if _DECODER is None:
        raise NotImplementedError(
            "no media decoder installed in this environment; call "
            "set_decoder(...) with a codec-backed callable first"
        )
    decoder = _DECODER

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            arrs = [decoder(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "pixels": [a.tobytes() for a in arrs],
                    "shape": [list(a.shape) for a in arrs],
                }
            )

    return media.mapInPandas(decode, "media_id long, pixels binary, shape array<int>")


def _parse_wav_header(b: bytes) -> tuple[int, int, int, float] | None:
    """RIFF/WAVE fmt parsing (pure python): (sample_rate, channels,
    bits_per_sample, duration_sec) — the audio analogue of the image header
    sniffer; a full sample decode would come from an injected codec."""
    if b is None or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(b):
        chunk_id = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if chunk_id == b"fmt " and pos + 24 <= len(b):
            _, channels, rate = struct.unpack("<HHI", b[pos + 8 : pos + 16])
            (bits,) = struct.unpack("<H", b[pos + 22 : pos + 24])
            fmt = (rate, channels, bits)
        elif chunk_id == b"data":
            data_size = size
        pos += 8 + size + (size % 2)
    if fmt is None or data_size is None:
        return None
    rate, channels, bits = fmt
    bytes_per_sec = rate * channels * max(bits // 8, 1)
    return (rate, channels, bits, data_size / bytes_per_sec if bytes_per_sec else 0.0)


def decode_audio_meta(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Extract (sample_rate, channels, bits, duration_sec) per WAV payload
    via mapInPandas — header-only, IO-bound, same shape as image meta."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            metas = [_parse_wav_header(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [m[0] if m else None for m in metas],
                    "channels": [m[1] if m else None for m in metas],
                    "bits_per_sample": [m[2] if m else None for m in metas],
                    "duration_sec": [m[3] if m else None for m in metas],
                }
            )

    return media.mapInPandas(
        extract,
        "media_id long, sample_rate int, channels int, bits_per_sample int,"
        " duration_sec double",
    )


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Resize every image payload to (width, height) via mapInPandas.

    STUB CODEC: with no image library in this container the transform is a
    deterministic fake — output payload is the first ``width*height`` bytes
    of the input, zero-padded (real shape/row-count/partitioning, fake
    pixels).  On a real cluster inject a codec with ``set_decoder`` and the
    decoder output feeds an actual resample here.  The Spark plumbing under
    test: Arrow batch iteration, per-row binary output sizing, schema.
    """
    n_out = width * height

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            outs = []
            for p in pdf[payload_col]:
                if _DECODER is not None:
                    arr = _DECODER(p)
                    outs.append(bytes(arr)[:n_out].ljust(n_out, b"\0"))
                else:
                    outs.append((p or b"")[:n_out].ljust(n_out, b"\0"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": outs,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(
        resize, "media_id long, payload binary, width int, height int"
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.

    The decode itself is stubbed (no video codec here); the row explosion,
    partitioning, and schema are the real scale concern: a 2-hour video at
    30 fps explodes to 7,200 rows — done JVM-side with sequence/explode, not
    in Python.
    """
    est_frames = F.greatest((F.length("payload") / 1024).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_index",
            F.explode(F.sequence(F.lit(0), est_frames, F.lit(every_n))),
        )
        .select("media_id", "frame_index", "mime")
    )

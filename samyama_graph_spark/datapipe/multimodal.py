"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature steps run as Arrow-batched ``mapInPandas``
(the only place Python touches bytes).  The media codec libraries are
not available in this environment, so the decode kernels are
deterministic STUBS — the Spark-side contract (schemas, batch
iteration, partition sizing) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_embed(content: bytes | None, dim: int) -> list[float]:
    """Decode + embed: PNG payloads are REALLY decoded (stdlib inflate
    + unfilter, png_decode below) and the pixel bytes folded into a
    ``dim``-float histogram; non-image payloads fall back to a raw
    byte histogram so plumbing tests can run on arbitrary blobs.
    Swap in PIL/torchaudio/ffmpeg for other codecs — signature and
    batch shape stay identical."""
    if content is None:
        raise NotImplementedError("real decoder required for NULL-content rows")
    data = content
    if content[:8] == _PNG_MAGIC:
        _w, _h, _ch, data = png_decode(content)
    acc = [0.0] * dim
    for i, b in enumerate(data):
        acc[i % dim] += b / 255.0
    n = max(len(data), 1)
    return [round(x / n, 6) for x in acc]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    mapInPandas keeps the binary payloads inside executor-local Arrow
    batches (never driver-side); repartition upstream so a batch's
    total payload fits executor memory (e.g. 64MB of media per task).
    """
    from samyama_graph_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["content"].map(
                        lambda c: len(c) if c is not None else 0
                    ),
                    "feature": pdf["content"].map(
                        lambda c: _decode_embed(c, dim) if c is not None else None
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: content bytes derived
    from the id (no external files)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.lit("image").alias("kind"),
            F.encode(
                F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8"
            ).alias("content"),
            F.struct(
                F.lit("image/fake").alias("mime"),
                F.lit(4).cast("int").alias("width"),
                F.lit(4).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("meta"),
        )
    )


# ---------------------------------------------------------------- real PNG
# Pure-stdlib PNG codec: no PIL in this environment, but PNG itself is
# just zlib + per-scanline filters (RFC 2083), so the decode step can be
# REAL — the mapInPandas kernel below parses actual image bytes.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_encode(width: int, height: int, rgb: "list[tuple[int,int,int]]") -> bytes:
    """Minimal RGB8 PNG writer (filter 0, one IDAT).  Deterministic:
    fixed zlib level, no ancillary chunks."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # RGB8
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        for x in range(width):
            r, g, b = rgb[y * width + x]
            raw += bytes((r, g, b))
    idat = zlib.compress(bytes(raw), 6)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def png_decode(content: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG (8-bit gray/RGB/RGBA, all 5 scanline filters) to
    ``(width, height, channels, raw_pixels)``.  Interlace unsupported."""
    import struct
    import zlib

    if content[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, channels, bitdepth = 8, 0, 0, 0, 0
    idat = bytearray()
    while pos < len(content):
        (ln,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        payload = content[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, bitdepth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bitdepth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNGs supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _y in range(height):
        ftype = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out += line
        prev = line
    return width, height, channels, bytes(out)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL image decode + per-channel statistics via Arrow-batched
    mapInPandas: parses actual PNG bytes executor-side (width, height,
    channels, channel means, ITU-R 601 luma).  This is the production
    shape for multimodal feature extraction — swap png_decode for a
    codec library without touching the Spark plumbing."""
    from samyama_graph_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, ch, px = png_decode(bytes(content))
                n = w * h
                sums = [0] * ch
                for i in range(0, len(px), ch):
                    for c in range(ch):
                        sums[c] += px[i + c]
                means = [s / n for s in sums]
                r = means[0]
                g = means[1] if ch >= 3 else means[0]
                b = means[2] if ch >= 3 else means[0]
                rows.append(
                    (int(mid), w, h, ch, r, g, b,
                     0.299 * r + 0.587 * g + 0.114 * b)
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in IMAGE_STATS_SCHEMA.fields],
            )

    return media.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


def synthetic_png_media(
    spark, n: int = 64, width: int = 8, height: int = 6
) -> DataFrame:
    """Deterministic REAL-PNG media table: pixel (x, y) of image k is
    rgb((7k+3x+5y)%256, (11k+x+2y)%256, (13k+5x+y)%256) — arithmetic
    an external oracle can replay without decoding.  Generation runs
    executor-side (mapInPandas), never on the driver."""
    from samyama_graph_spark.session import ensure_shipped

    ensure_shipped(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k in pdf["id"]:
                k = int(k)
                rgb = [
                    (
                        (7 * k + 3 * x + 5 * y) % 256,
                        (11 * k + x + 2 * y) % 256,
                        (13 * k + 5 * x + y) % 256,
                    )
                    for y in range(height)
                    for x in range(width)
                ]
                out.append(
                    (k, "image", png_encode(width, height, rgb),
                     ("image/png", width, height, None))
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "content", "meta"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------- resize
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def image_resize(media: DataFrame, new_width: int, new_height: int) -> DataFrame:
    """REAL image resize (nearest-neighbor) over the binary column:
    decode PNG pixels executor-side, resample, re-encode — media in,
    media out, so resize stages compose with decode/feature stages in
    one pipeline.  Output rows carry updated meta dimensions.  Swap
    the kernel for PIL/opencv interpolation without touching the
    Spark plumbing (same schema, same Arrow batching)."""
    from samyama_graph_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if content is None or bytes(content)[:8] != _PNG_MAGIC:
                    # clear contract failure instead of an opaque
                    # executor traceback on mixed media tables
                    raise NotImplementedError(
                        f"image_resize: media {int(mid)} ({kind}) is not "
                        "a PNG payload — decode other codecs with a real "
                        "image library (filter by kind upstream)"
                    )
                w, h, ch, px = png_decode(bytes(content))
                rgb = []
                for y2 in range(new_height):
                    sy = min(y2 * h // new_height, h - 1)
                    for x2 in range(new_width):
                        sx = min(x2 * w // new_width, w - 1)
                        off = (sy * w + sx) * ch
                        if ch >= 3:
                            rgb.append((px[off], px[off + 1], px[off + 2]))
                        else:
                            v = px[off]
                            rgb.append((v, v, v))
                rows.append(
                    (
                        int(mid),
                        str(kind),
                        png_encode(new_width, new_height, rgb),
                        ("image/png", new_width, new_height, None),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "content", "meta"]
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# -------------------------------------------------------- frame sample
# Synthetic video container: b"SVID" + u32 frame count, then per frame
# u32 byte length + PNG bytes.  Parsing it is REAL (length-prefixed
# walk); real codecs (mp4/h264) are not in this environment, so that
# branch raises NotImplementedError — the Spark-side contract (schema,
# batching, explode shape) is identical either way.

_SVID_MAGIC = b"SVID"

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def video_frame_sample(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Sample every ``every_n``-th frame out of video payloads: one
    output ROW PER FRAME (media_id, frame_no, frame PNG bytes, dims) —
    the fan-out shape of a frame-extraction stage feeding image ops
    downstream (resize/feature over the exploded frames).  Synthetic
    SVID containers are really parsed; other containers need a codec
    library and raise NotImplementedError."""
    import struct

    from samyama_graph_spark.session import ensure_shipped

    ensure_shipped(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                if data[:4] != _SVID_MAGIC:
                    raise NotImplementedError(
                        "real video codec required for non-SVID containers"
                    )
                (n_frames,) = struct.unpack(">I", data[4:8])
                off = 8
                for i in range(n_frames):
                    (ln,) = struct.unpack(">I", data[off : off + 4])
                    off += 4
                    frame = data[off : off + ln]
                    off += ln
                    if i % every_n == 0:
                        w, h, _ch, _px = png_decode(frame)
                        rows.append((int(mid), i, frame, w, h))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_video_media(
    spark, n: int = 8, frames: int = 6, width: int = 4, height: int = 3
) -> DataFrame:
    """Deterministic SVID media table: video k's frame i is the
    synthetic PNG pattern of image (k * frames + i).  Generated
    executor-side."""
    import struct

    from samyama_graph_spark.session import ensure_shipped

    ensure_shipped(spark)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k in pdf["id"]:
                k = int(k)
                payload = [_SVID_MAGIC, struct.pack(">I", frames)]
                for i in range(frames):
                    seed = k * frames + i
                    rgb = [
                        (
                            (7 * seed + 3 * x + 5 * y) % 256,
                            (11 * seed + x + 2 * y) % 256,
                            (13 * seed + 5 * x + y) % 256,
                        )
                        for y in range(height)
                        for x in range(width)
                    ]
                    png = png_encode(width, height, rgb)
                    payload.append(struct.pack(">I", len(png)))
                    payload.append(png)
                dur = frames * 40  # 25 fps
                out.append(
                    (k, "video", b"".join(payload),
                     ("video/x-svid", width, height, dur))
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "content", "meta"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)

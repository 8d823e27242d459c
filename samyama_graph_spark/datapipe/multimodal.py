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


def _decode_stub(content: bytes | None, dim: int) -> list[float]:
    """Deterministic fake 'decode + embed': byte histogram folded to
    ``dim`` floats.  Replace with a real codec (PIL/torchaudio/ffmpeg)
    in production — signature and batch shape stay identical."""
    if content is None:
        raise NotImplementedError("real decoder required for NULL-content rows")
    acc = [0.0] * dim
    for i, b in enumerate(content):
        acc[i % dim] += b / 255.0
    n = max(len(content), 1)
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
                        lambda c: _decode_stub(c, dim) if c is not None else None
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

"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (beyond-reference scope, SURVEY.md section 7 north star).

Convention: a modality column is a struct
  { data: binary, mime: string, meta: map<string,string> }
so 100 TB of media rides the same parquet/shuffle machinery as any
other column — Spark never interprets the bytes until an operator
asks. Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` so bytes cross the Python boundary once
per batch, not per row.

The actual codecs (PIL/librosa/av) are NOT in this container, so the
decode kernels are stubbed: a deterministic fake decoder behind
``try: import``. The Spark-side plumbing — schema, batching,
partition sizing, UDF signatures — is real and tested; swapping in a
real codec changes one inner function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("data", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def pack_media(df: DataFrame, data_col: str, mime: str, alias: str = "media") -> DataFrame:
    """Wrap a raw binary column into the media struct convention."""
    return df.withColumn(
        alias,
        F.struct(
            F.col(data_col).cast("binary").alias("data"),
            F.lit(mime).alias("mime"),
            F.create_map().cast("map<string,string>").alias("meta"),
        ),
    )


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content digest — no
    Python, no decode; this is what dedup/partitioning key off."""
    return df.withColumn("media_bytes", F.length(F.col(f"{media_col}.data"))).withColumn(
        "media_sha256", F.sha2(F.col(f"{media_col}.data"), 256)
    )


def _fake_image_decode(data: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a real decoder: derives (width,
    height, format) from a content digest. Replace with PIL when the
    codec is available."""
    if data is None:
        raise ValueError("no bytes")
    h = hashlib.sha256(data).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, "png" if h[2] % 2 else "jpeg"


try:  # real codec path, absent in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


IMAGE_META_SCHEMA = "id long, width int, height int, format string, media_bytes long"


def decode_image_meta(df: DataFrame, id_col: str = "id", media_col: str = "media") -> DataFrame:
    """Decode image dimensions via Arrow-batched mapInPandas.

    Plumbing is real: one Python roundtrip per Arrow batch, schema
    declared, nulls preserved. The decode kernel is the stub above
    unless PIL is importable (then it must be swapped in explicitly —
    kept as NotImplementedError to keep this container deterministic).
    """
    if _HAVE_PIL:
        raise NotImplementedError(
            "real PIL decode not wired in this environment; replace "
            "_fake_image_decode with PIL.Image.open(io.BytesIO(data)).size"
        )
    cols = df.select(F.col(id_col).alias("id"), F.col(f"{media_col}.data").alias("data"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"id": [], "width": [], "height": [], "format": [], "media_bytes": []}
            for i, data in zip(pdf["id"], pdf["data"]):
                w, h, fmt = _fake_image_decode(bytes(data))
                out["id"].append(i)
                out["width"].append(w)
                out["height"].append(h)
                out["format"].append(fmt)
                out["media_bytes"].append(len(data))
            yield pd.DataFrame(out)

    return cols.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def frame_sample_plan(
    df: DataFrame, id_col: str = "id", media_col: str = "media", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling *plan*: emits (id, frame_idx) rows the
    decoder would materialize — demonstrates the explode/partition
    shape (1 video row -> k frame rows) without a codec. Frame count
    is derived from byte length as a deterministic stand-in."""
    n_frames = (F.length(F.col(f"{media_col}.data")) / 100).cast("int") + 1
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )

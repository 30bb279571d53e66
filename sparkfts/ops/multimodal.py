"""Multimodal binary-column plumbing: typed metadata + decode/feature UDFs.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the Spark-side plumbing (schema, Arrow batch shape, partition-friendly
layout) is real and tested; the codec step itself is STUBBED because no
image/audio libraries exist in this container:

  - :func:`media_metadata` — real: byte length, magic-sniffed container
    type, 31-bit content hash, all JVM-side expressions.
  - :func:`decode_features` — Arrow-batched ``mapInPandas`` with the
    production signature; the inner ``_decode_image`` raises
    ``NotImplementedError`` unless ``fake=True``, in which case a
    deterministic byte-derived feature vector stands in so the batch
    shape, schema and partitioning are exercised end-to-end.
  - :func:`frame_sample_plan` — real: computes which frame offsets a
    video sampler would decode (pure arithmetic on metadata).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff",  # wav/avi
    b"\x1a\x45\xdf\xa3": "webm",
}


def media_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata over an opaque binary column (all built-in exprs)."""
    c = F.col(bin_col)
    kind = F.lit("unknown")
    for magic, name in sorted(MAGIC.items(), key=lambda kv: kv[1]):
        hexpref = magic.hex()
        kind = F.when(
            F.hex(F.substring(c, 1, len(magic))) == hexpref.upper(),
            F.lit(name),
        ).otherwise(kind)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(c).alias("n_bytes"),
            kind.alias("container"),
            (
                F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
                % F.lit(2_147_483_647)
            ).alias("content_hash31"),
        ),
    )


def _decode_image(payload: bytes, fake: bool) -> np.ndarray:
    """STUB: real decode needs PIL/ffmpeg (absent in this container).

    ``fake=True`` produces a deterministic feature vector from the bytes
    themselves, keeping the full Spark pipeline testable.
    """
    if not fake:
        raise NotImplementedError(
            "image/audio decode requires codec libraries not present in "
            "this environment; run with fake=True or install PIL/ffmpeg"
        )
    buf = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return buf.reshape(FEATURE_DIM, -1).mean(axis=1) / 255.0


def decode_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_target_rows: int = 1024,
) -> DataFrame:
    """binary -> fixed-dim feature vector, Arrow-batched.

    Production shape: one ``mapInPandas`` pass, each batch decoding
    ``batch_target_rows`` payloads vectorized-per-batch; output schema is
    ``(id, features array<double>)`` ready for the similarity operators.
    """
    src = df.select(F.col(id_col).alias("media_id"), F.col(bin_col).alias("p"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image(bytes(p), fake).tolist() for p in pdf["p"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return src.mapInPandas(gen, "media_id long, features array<double>")


def frame_sample_plan(
    df: DataFrame,
    duration_col: str = "duration_ms",
    fps: float = 1.0,
    max_frames: int = 8,
) -> DataFrame:
    """Frame offsets a video sampler would decode (pure plan, no codec)."""
    n = F.least(
        F.floor(F.col(duration_col) / F.lit(int(1000 / fps))).cast("int") + 1,
        F.lit(max_frames),
    )
    return df.withColumn(
        "frame_offsets_ms",
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: (i * F.col(duration_col) / n).cast("long"),
        ),
    )

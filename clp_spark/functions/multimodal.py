"""Multimodal columns: opaque `binary` payloads + typed metadata.

Web-scale corpora carry image/audio/video alongside text. The Spark-side
contract: payloads stay opaque `binary` columns; metadata (size, sniffed
container type) is JVM-side column algebra; decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` with REAL
schemas, partitioning, and batch shapes — only the codec call itself is
stubbed (no image/audio libraries in this container). Swap `_decode_stub`
for PIL/ffmpeg and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# magic-byte prefixes → container kind (hex, uppercase as Spark's hex())
MAGIC_PREFIXES = [
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/webp/avi share RIFF
    ("664C6143", "flac"),
    ("1A45DFA3", "webm"),
]


def binary_meta(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_bytes, magic_hex, kind) — metadata without touching Python."""
    magic = F.upper(F.hex(F.expr(f"substring({bin_col}, 1, 4)")))
    kind = F.lit("unknown")
    for prefix, name in reversed(MAGIC_PREFIXES):
        kind = F.when(magic.startswith(prefix), F.lit(name)).otherwise(kind)
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"octet_length({bin_col})").alias("n_bytes"),
        magic.alias("magic_hex"),
        kind.alias("kind"),
    )


def _decode_stub(payload: bytes, fake: bool):
    """Stand-in for the real image decoder (PIL.Image.open etc.).

    fake=True returns a deterministic fake decode derived from the
    payload bytes; fake=False raises, marking exactly where the codec
    library would plug in.
    """
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "pass fake=True for the deterministic test double"
        )
    n = len(payload)
    w = 1 + n % 64
    h = 1 + (n // 64) % 64
    arr = np.frombuffer(payload[: w * h * 3].ljust(w * h * 3, b"\0"), dtype=np.uint8)
    return w, h, 3, arr.astype(np.float32) / 255.0


def decode_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    feature_dim: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract: (id, width, height, channels, features).

    Arrow-batched mapInPandas; features = per-stripe means of the decoded
    pixel array, length `feature_dim` (a stand-in for an embedding model
    forward pass — same batch shape, same schema contract).
    """
    schema = (
        "id long, width int, height int, channels int, "
        f"features array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, feats = [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                w, h, c, arr = _decode_stub(bytes(payload), fake)
                stripes = np.array_split(arr, feature_dim)
                feats.append(
                    [float(s.mean()) if len(s) else 0.0 for s in stripes]
                )
                ids.append(i)
                ws.append(w)
                hs.append(h)
                cs.append(c)
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "channels": cs, "features": feats}
            )

    return df.select(id_col, bin_col).mapInPandas(run, schema=schema)


def frame_sample(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    fake: bool = False,
) -> DataFrame:
    """Video frame-sampling plumbing: (id, frame_idx, frame_offset).

    Real implementation would demux with ffmpeg; the deterministic fake
    emits one 'frame' per every_n_bytes of payload so the explode shape,
    schema, and per-row fan-out are exercised for real.
    """
    if not fake:
        raise NotImplementedError(
            "video demuxer not available; pass fake=True for the test double"
        )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(f"octet_length({bin_col})").alias("_nb"),
        )
        .select(
            "id",
            F.posexplode(
                F.expr(f"sequence(0, greatest(cast(_nb/{every_n_bytes} as int)-1, 0))")
            ).alias("frame_idx", "frame_offset_block"),
        )
        .withColumn("frame_offset", F.col("frame_offset_block") * every_n_bytes)
        .drop("frame_offset_block")
    )

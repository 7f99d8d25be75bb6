"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The Spark-side machinery (schema, partition-friendly batch shapes, Arrow
batch iteration via mapInPandas) is real and tested; the actual codec step is
STUBBED — the sandbox has no image/audio libraries — behind
``decode_fn=None`` → deterministic fake decode, or a user-provided callable
(PIL/torchaudio/ffmpeg in production). The fake decoder is deterministic so
tests pin the batch shapes and metadata flow.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, byte_mean double, byte_std double, feature array<float>"


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads from a seeded RNG)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        content = bytes(rng.integers(0, 256, size, dtype=np.uint8))
        meta = {
            "width": int(rng.integers(16, 256)) if kind != "audio" else None,
            "height": int(rng.integers(16, 256)) if kind != "audio" else None,
            "n_frames": int(rng.integers(1, 100)) if kind == "video" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "mime": {"image": "image/fake", "audio": "audio/fake", "video": "video/fake"}[kind],
        }
        rows.append((i, kind, content, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(content: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real codec: bytes → float array in [0,1].

    Production replaces this with PIL.Image.open / soundfile.read / ffmpeg —
    the surrounding Spark plumbing is identical.
    """
    arr = np.frombuffer(content, dtype=np.uint8).astype(np.float32) / 255.0
    return arr


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Decode + featurize media via mapInPandas (Arrow batches).

    Feature = fixed-dim mean-pooled segments of the decoded signal — the shape
    a real embedding model would produce. Pass ``decode_fn`` to plug a real
    codec; None uses the deterministic fake (raises NotImplementedError for a
    None payload, the contract a real codec would enforce).
    """
    decode = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                if r.content is None:
                    raise NotImplementedError("media decode of NULL payload (no codec fallback)")
                sig = decode(bytes(r.content), r.kind)
                seg = np.array_split(sig, feature_dim)
                feat = np.array([float(s.mean()) if len(s) else 0.0 for s in seg], dtype=np.float32)
                out.append(
                    (r.media_id, r.kind, len(r.content), float(sig.mean()), float(sig.std()), feat.tolist())
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "byte_mean", "byte_std", "feature"]
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: emit (media_id, frame_idx)
    for every n-th frame from metadata — the downstream decode would slice the
    container at those indices. Pure Catalyst (sequence + explode)."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")
    # n_frames > 0, not just non-null: sequence(0, -1) raises mid-job on a
    # zero-frame (empty/corrupt) container
    vids = df.filter((F.col("kind") == "video") & (F.col("meta.n_frames") > 0))
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )

"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

The reference's processor tier (UD2: normalize -> miniatures -> faces
-> classify, modules/processor/...) is the shape being reproduced:
batch ML/decode "UDFs" over per-row payloads, with results as nested
struct columns.  The decode step itself needs image/audio libraries
that are NOT in this environment, so it is STUBBED — deterministic
fake features derived from the payload bytes — behind
``decode_available()``.  Everything Spark-side (schema, batch
iteration, partitioning, output shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def decode_available() -> bool:
    """True when a real image decoder is importable (PIL/cv2)."""
    try:  # pragma: no cover - environment-dependent
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def default_decoder():
    """A (payload, dim) -> feature callable backed by PIL, or None when
    no decoder library is importable.  Resolved INSIDE the mapInPandas
    partition function, so the import cost is paid once per partition
    on the executor (the per-executor model-loading pattern; the
    reference serializes its non-thread-safe predictors the same way,
    FacesProcessor.scala:167-192)."""
    if not decode_available():
        return None
    import io as _io  # pragma: no cover - needs PIL in the env

    from PIL import Image  # pragma: no cover

    def _decode(payload: bytes, dim: int) -> list:  # pragma: no cover
        img = Image.open(_io.BytesIO(payload)).convert("L").resize((dim, dim))
        arr = np.asarray(img, dtype=np.float64)
        return (arr.mean(axis=0) / 255.0).astype(np.float32).tolist()

    return _decode  # pragma: no cover


def _fake_feature(payload: bytes, dim: int = 8) -> list:
    """Deterministic stand-in for a real decode+embed: folds payload
    bytes into `dim` float buckets.  Used for kinds with no decoder
    (audio/video), for undecodable payloads, and for everything when
    no decoder library is present."""
    if payload is None:
        return None
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * dim
    pad = (-arr.size) % dim
    folded = np.pad(arr, (0, pad)).reshape(-1, dim).astype(np.float64)
    return (folded.mean(axis=0) / 255.0).astype(np.float32).tolist()


def extract_features(
    media: DataFrame, dim: int = 8, decoder="auto"
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one decoder
    initialized per partition on the executor.

    ``decoder``: 'auto' resolves the real PIL-backed decoder when the
    library is importable (image payloads only) and falls back to the
    deterministic byte-fold stub otherwise; pass an explicit
    (payload, dim) -> list callable to inject one (tests drive the
    real-decoder code path this way without PIL in the env).  A payload
    the decoder rejects falls back to the stub rather than failing the
    batch — decode errors are data, not crashes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = default_decoder() if decoder == "auto" else decoder

        def featurize(kind: str, payload) -> list | None:
            if payload is None:
                return None
            if dec is not None and kind == "image":
                try:
                    return dec(payload, dim)
                except Exception:
                    return _fake_feature(payload, dim)
            return _fake_feature(payload, dim)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": [
                        featurize(k, p)
                        for k, p in zip(pdf["kind"], pdf["payload"])
                    ],
                    "ok": pdf["payload"].notna(),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table DERIVED from the documents corpus:
    every field is a pure function of (doc_id, text) — kind cycles by
    doc_id, the payload is the UTF-8 bytes of the text (null every
    17th row: the decode-failure path), typed metadata is arithmetic
    on doc_id.  Because the derivation is closed-form, an external SQL
    engine can recompute the pipeline's metadata outputs exactly —
    which is how the driver's DuckDB oracle checks the mapInPandas
    feature-extraction row (media_id, kind, n_bytes, ok, feature_dim)
    without needing the binary payloads on its side."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int"))
    is_img = kind == F.lit("image")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.when(F.col("doc_id") % 17 == 0, F.lit(None).cast("binary"))
        .otherwise(F.encode(F.col("text"), "UTF-8"))
        .alias("payload"),
        F.when(is_img, (F.col("doc_id") % 1024 + 64).cast("int")).alias("width"),
        F.when(is_img, (F.col("doc_id") % 768 + 64).cast("int")).alias("height"),
        F.when(~is_img, (F.col("doc_id") % 600000 + 1000).cast("int")).alias(
            "duration_ms"
        ),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = np.array(["image", "audio", "video"])
    rows = []
    for i in range(n):
        kind = str(kinds[i % 3])
        size = int(rng.integers(16, 512))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        if i % 17 == 0:
            payload = None
        rows.append(
            (
                i,
                kind,
                payload,
                int(rng.integers(64, 4096)) if kind == "image" else None,
                int(rng.integers(64, 4096)) if kind == "image" else None,
                int(rng.integers(1000, 600000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)

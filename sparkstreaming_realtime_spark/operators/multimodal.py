"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training pipeline carries image/audio/video as ``binary``
columns beside typed metadata, and decodes them in Arrow-batched
Python (``mapInPandas``) because decoding is genuinely not
expressible as a Column expression. This module implements that
plumbing for real — schema, batch iteration, partition behavior —
while the *decode* step itself is a deterministic stand-in:
the image/audio libraries aren't in this container, so
:func:`fake_decode_dims` derives "dimensions" from the byte length.
Swapping in PIL/librosa means replacing one marked function; nothing
about the Spark plan changes.

Design notes for scale:
- ``mapInPandas`` receives Arrow record batches; binary columns
  arrive as Python ``bytes`` with zero-copy from Arrow where
  possible. Keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
  small enough that a batch of payloads fits executor-python memory
  (e.g. 256 for ~4 MB images).
- The output schema is declared up front (typed metadata), so
  downstream is ordinary columnar processing again — decode early,
  project to features, drop the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def fake_decode_dims(n_bytes: int) -> tuple[int, int]:
    """STUB decode. A real implementation would be::

        img = PIL.Image.open(io.BytesIO(payload))
        return img.width, img.height

    The container has no imaging libs (environment constraint), so we
    derive deterministic fake dimensions from the payload length.
    The Spark-side plumbing (Arrow batches, schema, partitioning) is
    identical either way."""
    return n_bytes % 640 + 1, n_bytes % 480 + 1


def extract_binary_meta(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode/inspect a binary column via Arrow-batched ``mapInPandas``
    (the UDF-slow-path done the fast way: vectorized transfer, one
    Python call per batch, not per row)."""
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            n_bytes = pdf[bin_col].map(len)
            dims = n_bytes.map(fake_decode_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "fake_width": dims.map(lambda d: d[0]).astype("int64"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return df.mapInPandas(decode, META_SCHEMA)


def documents_as_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat the documents' UTF-8 bytes as the opaque payload — the
    test stand-in for image/audio blobs (TESTDATA has no binary
    table). Column expression, zero-copy into Arrow."""
    return docs.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_head", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame,
    n_frames: int = 4,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling plumbing: emit ``n_frames`` evenly spaced slices
    per payload (a video decoder would seek keyframes here; the
    slicing stand-in keeps the Spark side — 1→N row fan-out inside
    mapInPandas, declared schema, Arrow batches — fully real).

    Returns one row per (doc, frame) with the slice length and its
    first 8 bytes; payloads shorter than ``n_frames`` yield fewer
    frames, never empty ones."""
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [],
                "frame_head": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                n = min(n_frames, len(payload)) or 0
                if n == 0:
                    continue
                step = len(payload) // n
                for i in range(n):
                    frame = payload[i * step:(i + 1) * step if i < n - 1 else None]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(frame))
                    out["frame_head"].append(bytes(frame[:8]))
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("target_w", T.LongType()),
        T.StructField("target_h", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Image resize plumbing. A real implementation is::

        img = PIL.Image.open(io.BytesIO(payload))
        out = img.resize((target_w, target_h)).tobytes()

    — no imaging libs in this environment, so the STAND-IN produces a
    deterministic ``target_w·target_h``-byte payload by
    nearest-neighbor byte sampling (downsampling long payloads,
    stretching short ones — the 1-D analog of NN image resize),
    keeping everything the Spark side owns real: Arrow batches in,
    binary column out with a declared schema, size contract (every
    output payload is exactly the target size — what a training
    loader requires), and the batch-size/memory notes at module top
    apply unchanged."""
    import pandas as pd

    n_out = target_w * target_h

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "orig_bytes": [], "target_w": [],
                "target_h": [], "resized": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                if len(payload) == 0:
                    continue
                data = bytes(
                    payload[(i * len(payload) // n_out) % len(payload)]
                    for i in range(n_out)
                )
                out["doc_id"].append(doc_id)
                out["orig_bytes"].append(len(payload))
                out["target_w"].append(target_w)
                out["target_h"].append(target_h)
                out["resized"].append(data)
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, RESIZE_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_windows(
    df: DataFrame,
    sample_rate: int = 16_000,
    window_ms: int = 250,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio feature extraction over PCM16 payloads — REAL, not a
    stub: 16-bit little-endian PCM "decoding" is ``np.frombuffer``,
    so the windowed features (RMS energy, zero-crossing count — the
    classic speech/silence discriminators a curation pipeline gates
    clips on) need no external audio library at all.

    1→N fan-out inside Arrow ``mapInPandas``: each payload splits
    into fixed-duration windows (``sample_rate × window_ms``), one
    output row per window. A trailing odd byte (truncated sample) is
    dropped; empty payloads yield no rows. RMS rounds to 6dp for
    engine comparability."""
    import numpy as np
    import pandas as pd

    win = max(1, sample_rate * window_ms // 1000)

    def feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "win_idx": [], "n_samples": [],
                "rms": [], "zero_crossings": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                usable = len(payload) // 2 * 2
                if usable == 0:
                    continue
                samples = np.frombuffer(
                    payload[:usable], dtype="<i2"
                ).astype(np.float64)
                for i, start in enumerate(range(0, len(samples), win)):
                    w = samples[start:start + win]
                    out["doc_id"].append(doc_id)
                    out["win_idx"].append(i)
                    out["n_samples"].append(len(w))
                    out["rms"].append(
                        round(float(np.sqrt(np.mean(w * w))), 6)
                    )
                    out["zero_crossings"].append(
                        int(((w[:-1] * w[1:]) < 0).sum())
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(feats, AUDIO_SCHEMA)


EMB_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("l2_norm", T.DoubleType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("std", T.DoubleType()),
        T.StructField("n_nonzero", T.LongType()),
    ]
)


def embedding_features(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Vectorized numpy feature extraction over embedding arrays —
    the mapInPandas pattern for work that IS better in Python
    (numpy's SIMD batch math over a stacked matrix) than per-row
    Column expressions: one np.stack per Arrow batch, then columnar
    reductions. Round to 6dp so results are engine-comparable."""
    import numpy as np
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            m = np.stack(pdf[emb_col].to_numpy()).astype("float64")
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "l2_norm": np.round(np.sqrt((m * m).sum(axis=1)), 6),
                    "mean": np.round(m.mean(axis=1), 6),
                    "std": np.round(m.std(axis=1), 6),
                    "n_nonzero": (m != 0).sum(axis=1).astype("int64"),
                }
            )

    return df.mapInPandas(extract, EMB_FEATURE_SCHEMA)

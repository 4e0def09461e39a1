"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested — schema contracts,
partition sizing, batch iteration, UDF signatures.  The codec calls
themselves (image decode, resample, frame extraction) are STUBBED with
deterministic fakes because the media libraries are not in this
container; each stub is marked and takes the exact byte/shape contract a
real implementation (PIL/libsndfile/pyav) would.

Scale design: media rows are orders of magnitude wider than text rows —
``media_repartition`` sizes partitions by *bytes*, not row count, so a
1000-executor cluster gets balanced Arrow batches; metadata-only queries
never touch the binary column (Parquet column pruning — the same
late-materialization win as the reference's RID-driven pColStep,
``dbcon/joblist/primitivestep.h:128``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal table schema — binary payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a deterministic media table from the documents corpus (the
    container has no real media files): payload = utf-8 bytes, metadata
    derived from content.  Exercises the exact schema/partitioning paths
    a real corpus would."""
    # pmod, not %: Spark's % follows the dividend's sign, so a negative
    # id yielded element_at index 0 (INVALID_INDEX_OF_ZERO crash) or a
    # silent from-the-end pick
    mid = F.col(id_col)
    return df.select(
        mid.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(mid, F.lit(3)) + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(mid, F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod(mid, F.lit(480)) + 32).cast("int").alias("height"),
        (F.length(F.col(text_col)) * 10).cast("bigint").alias("duration_ms"),
    )


def media_repartition(df: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition a media table by payload bytes, not row count.

    Sizing comes from FILE metadata when the table is file-backed (sum
    of input-file sizes — free, no scan); only a synthesized in-memory
    relation falls back to a one-row aggregate over payload lengths.

    Known sizing skews (partition COUNT only, never correctness): the
    file path measures the WHOLE underlying table's compressed bytes —
    a filtered/projected ``df`` still counts every input file, and
    compressed on-disk bytes undercount in-memory payload size.  Pass
    a pre-materialized subset (or rely on the fallback) when the
    estimate must track the actual relation."""
    import os
    from urllib.parse import urlparse

    def _local(uri: str) -> str | None:
        # urlparse, not a byte-slice: 'file:/x' (Hadoop's 1-slash form)
        # and 'file:///x' both resolve; non-local schemes return None
        p = urlparse(uri)
        if p.scheme in ("", "file"):
            return p.path or uri
        return None

    files = df.inputFiles()
    sizes = []
    for f in files:
        lp = _local(f)
        if lp is not None and os.path.exists(lp):
            sizes.append(os.path.getsize(lp))
    if files and len(sizes) == len(files):
        total = sum(sizes)
    else:
        # remote object store (s3://…) or unresolvable paths: a silent
        # total=0 collapsed a multi-TB table into ONE partition — use
        # the one-row payload aggregate instead (a scan, but correct)
        stats = df.select(
            F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("b")
        ).collect()
        total = stats[0].b
    # ceil, not floor: a 255 MB table should get 2 partitions at a
    # 128 MB target, not one double-size partition
    n = max(1, -(-int(total or 1) // target_partition_bytes))
    return df.repartition(n, "media_id")


_STUB_MOD = 100003
_STUB_CAP = 4096
# 31^k mod p, laid out DESCENDING as one module-level int64 array: the
# tail slice _STUB_POWS_DESC[-m:] is exactly [31^(m-1) … 31^0] — a view,
# so the per-slot hash is one dot product with zero per-row allocation
# (rebuilding this array 8× per row measurably ate the vectorization
# win).
_pows = [1]
for _ in range(_STUB_CAP // 8):
    _pows.append((_pows[-1] * 31) % _STUB_MOD)
_STUB_POWS_DESC = np.array(_pows[::-1], dtype=np.int64)
del _pows


def _decode_stub(payload: bytes, modality: str) -> list[float]:
    """STUB for the real codec path (PIL.Image.open / soundfile.read /
    av.open).  Deterministic 8-dim feature from payload bytes so the
    full distributed pipeline is testable byte-for-byte.

    Math: slot s accumulates acc = acc*31 + byte over bytes at positions
    i % 8 == s, i.e. a polynomial hash sum(b_j * 31^(m-1-j)) mod p —
    evaluated here vectorized (numpy) with premodded powers; products are
    < 2^25 and partial sums < 2^35, safely inside int64.
    """
    if payload is None:
        return []
    data = np.frombuffer(payload[:_STUB_CAP], dtype=np.uint8).astype(np.int64)
    out = []
    for s in range(8):
        slot = data[s::8]
        m = len(slot)
        if m == 0:
            out.append(0.0)
            continue
        out.append(float(int((slot * _STUB_POWS_DESC[-m:]).sum() % _STUB_MOD)) / _STUB_MOD)
    return out


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over media rows (mapInPandas).

    This is the one place the engine leaves the JVM by design: codecs
    are Python-native.  Batches arrive as pandas DataFrames (Arrow), so
    per-row overhead is amortized — the pattern the reference's UDF SDK
    (``utils/udfsdk/udfsdk.h:61``) would map to at scale.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": [
                        _decode_stub(p, m)
                        for p, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explodes each video row into frame
    timestamps (JVM-side); actual frame decode would be a second
    mapInPandas over (media_id, frame_ts) — stubbed at the decode layer,
    real at the plan layer."""
    # frames at ts = 0, every, 2·every, … while ts < duration:
    # floor((duration−1)/every)+1 — plain truncation undersampled by one
    # whenever duration is not an exact multiple (1999 ms @ 1000 ms
    # yielded only ts=0, missing t=1000)
    n_frames = F.greatest(
        ((F.col("duration_ms") - 1) / every_ms).cast("int") + 1, F.lit(1)
    )
    return (
        df.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms)
            ).alias("frame_ts"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
        StructField("out_duration_ms", LongType(), True),
        StructField("in_bytes", LongType(), True),
        StructField("out_bytes", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def _resize_stub(payload: bytes | None, in_w, in_h, out_w: int, out_h: int):
    """STUB for the real resample path (PIL Image.resize /
    librosa.resample / pyav frame scaling).  Contract honored: output
    byte length scales with the area ratio, content derives
    deterministically from the input bytes (byte-striding — the real
    implementation would interpolate pixels/samples)."""
    if payload is None:
        return None
    if len(payload) == 0:
        return b""  # empty media resizes to empty (linspace over an
        # empty buffer would index out of bounds)
    ratio = (out_w * out_h) / max(in_w * in_h, 1)
    out_len = max(int(len(payload) * min(ratio, 1.0)), 1)
    data = np.frombuffer(payload, dtype=np.uint8)
    idx = np.linspace(0, len(data) - 1, out_len).astype(np.int64)
    return data[idx].tobytes()


def resize_media(df: DataFrame, out_width: int = 224, out_height: int = 224) -> DataFrame:
    """Resize/resample media to target dimensions (images/video) or
    proportional duration (audio) — Arrow-batched mapInPandas, the
    third stubbed codec stage (decode → features → RESIZE → frames).

    Real plumbing: schema contract, byte-aware batches, deterministic
    output sizing; only the pixel/sample interpolation is the stub.
    At 100 TB this is the standard image-normalization pass before
    training-shard writes — map-only, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Arrow→pandas renders nullable ints as float64 NaN, and
            # NaN is TRUTHY — `w or out_width` kept NaN and the stub
            # died on int(NaN); null dims (audio rows) take the default
            out_payload = [
                _resize_stub(
                    p,
                    out_width if w is None or pd.isna(w) else w,
                    out_height if h is None or pd.isna(h) else h,
                    out_width,
                    out_height,
                )
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            in_bytes = pdf["payload"].map(lambda b: 0 if b is None else len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "out_width": np.where(pdf["modality"] == "audio", 0, out_width),
                    "out_height": np.where(pdf["modality"] == "audio", 0, out_height),
                    "out_duration_ms": pdf["duration_ms"].fillna(0).astype("int64"),
                    "in_bytes": in_bytes.astype("int64"),
                    "out_bytes": [0 if b is None else len(b) for b in out_payload],
                    "payload": out_payload,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)

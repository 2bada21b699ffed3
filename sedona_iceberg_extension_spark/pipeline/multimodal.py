"""Multimodal column convention: opaque binary payloads + typed metadata.

Same engine pattern as WKB geometry (SURVEY.md §1.4): the payload is a
``BinaryType`` column; a sibling struct carries the typed metadata the
planner can prune/filter on natively (modality, mime, width/height/duration,
byte size, content hash).  Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes stream through Python workers batch-wise —
partitioning, schema, and batch shape are real; the *codec* itself is stubbed
(no image/audio libraries in this container) behind ``DecodeNotAvailable`` /
a deterministic fake, clearly marked.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

MEDIA_META_SCHEMA = StructType([
    StructField("modality", StringType()),      # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("n_bytes", LongType()),
    StructField("content_md5", StringType()),
])


class DecodeNotAvailable(NotImplementedError):
    """Raised by real decode paths: media codecs are not installed in this
    build environment.  The deterministic fake paths below keep the Spark
    plumbing testable end-to-end."""


def attach_media_metadata(df: DataFrame, payload_col: str, modality: str,
                          mime: str, meta_name: str = "media_meta",
                          duration_ms_col: str = None) -> DataFrame:
    """Native metadata struct over a binary payload column (no Python).
    ``duration_ms_col``: optional column carrying a known duration (video/
    audio) — real decoders would fill it; the plumbing is format-agnostic."""
    duration = (F.col(duration_ms_col).cast("long") if duration_ms_col
                else F.lit(None).cast("long"))
    return df.withColumn(meta_name, F.struct(
        F.lit(modality).alias("modality"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        duration.alias("duration_ms"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    ))


_FEATURE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("feature", DoubleType()),
])


def extract_features(df: DataFrame, id_col: str, payload_col: str,
                     batch_size_hint: int = 1024, fake: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas`` — the real
    at-scale shape (Arrow batches of bytes into Python, narrow feature rows
    out; input columns pruned to id+payload before the Python boundary).

    ``fake=True`` computes a deterministic stand-in feature (mean byte value);
    ``fake=False`` raises DecodeNotAvailable where a real codec would run."""
    # raise driver-side so the contract holds even on zero-batch inputs
    if not fake:
        raise DecodeNotAvailable(
            "media codecs not installed; run with fake=True or add a codec")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # once per task; reused across batches

        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                # numpy views the payload buffer without copying and sums
                # in C (guide §4.2: vectorize inside the Arrow batch) —
                # an exact integer sum, so the value is bit-identical to
                # the previous pure-Python byte loop
                feats.append(
                    float(int(np.frombuffer(b, np.uint8).sum(dtype=np.int64)))
                    / len(b) if b is not None and len(b) else None)
            yield pd.DataFrame({
                "id": pdf[id_col],
                "n_bytes": [len(b) if b is not None else 0 for b in pdf[payload_col]],
                "feature": feats,
            })

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, _FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, payload_col: str,
                      every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (video, frame_ts) —
    the explode is native (sequence over duration from metadata); the frame
    decode itself is the stubbed mapInPandas stage."""
    return (
        df.select(F.col(id_col), F.col(payload_col), F.col("media_meta"))
        .withColumn("frame_ts_ms", F.explode(F.sequence(
            F.lit(0).cast("long"),
            F.coalesce(F.col("media_meta.duration_ms"), F.lit(0).cast("long")),
            F.lit(every_ms).cast("long"))))
    )


_RESIZE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("payload", BinaryType()),
])


def resize_images(df: DataFrame, id_col: str, payload_col: str,
                  width: int = 8, height: int = 8,
                  fake: bool = True) -> DataFrame:
    """Image resize over binary payloads via ``mapInPandas`` — the third
    multimodal stage next to decode/feature-extract and frame-sample.
    Arrow batches of bytes into Python, fixed-size resized payloads out;
    input pruned to id+payload before the Python boundary.

    ``fake=True`` produces the deterministic stand-in 'resample': the
    source bytes cycled to exactly width*height bytes (so the output
    payload is value-checkable byte-for-byte by the oracle);
    ``fake=False`` raises DecodeNotAvailable where PIL/libvips would
    run.  The schema/batching/partitioning contract is identical either
    way — swapping in a real codec changes only the inner loop."""
    target = int(width) * int(height)
    # raise driver-side so the contract holds even on zero-batch inputs
    if not fake:
        raise DecodeNotAvailable(
            "image codecs not installed; run with fake=True or add PIL")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for b in pdf[payload_col]:
                if b is None or len(b) == 0:
                    outs.append(None)
                    continue
                reps = (target + len(b) - 1) // len(b)
                outs.append((bytes(b) * reps)[:target])
            yield pd.DataFrame({
                "id": pdf[id_col],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "n_bytes": [len(o) if o is not None else 0 for o in outs],
                "payload": outs,
            })

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(run, _RESIZE_SCHEMA)


_CHUNK_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("energy", LongType()),
])


def audio_chunk_energy(df: DataFrame, id_col: str, payload_col: str,
                       frame_bytes: int = 8, fake: bool = True) -> DataFrame:
    """Audio framing + per-frame energy over binary payloads via
    ``mapInPandas`` — the fourth multimodal stage (decode/feature,
    frame-sample, resize, now framing): Arrow batches of bytes in, one
    narrow row per fixed-size frame out (1 -> N fan-out INSIDE the Python
    stage, so the binary column is never exploded engine-side).

    ``fake=True`` computes the deterministic stand-in energy (sum of the
    frame's byte values); ``fake=False`` raises DecodeNotAvailable where
    a real PCM decode would run.  Partial trailing frames are dropped —
    the fixed-frame contract real audio featurizers use."""
    # capability check DRIVER-side, before any plan is built: an executor-side
    # raise only fires if a batch exists, so fake=False on an empty input
    # would otherwise silently return an empty frame table instead of failing.
    if not fake:
        raise DecodeNotAvailable(
            "audio codecs not installed; run with fake=True")

    def run(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            ids, idxs, nbs, ens = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                nf = len(b) // frame_bytes
                if not nf:
                    continue
                # frame + sum in C instead of a per-frame Python loop
                # (guide §4.2): reshape a no-copy view of the payload into
                # (nf, frame_bytes) and row-sum with an exact int64
                # accumulator — values identical to the previous
                # per-frame ``int(sum(fr))``
                frames = np.frombuffer(
                    b, np.uint8, count=nf * frame_bytes).reshape(
                        nf, frame_bytes)
                ids.extend([i] * nf)
                idxs.extend(range(nf))
                nbs.extend([frame_bytes] * nf)
                ens.extend(frames.sum(axis=1, dtype=np.int64).tolist())
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "n_bytes": nbs,
                 "energy": ens})

    return df.select(F.col(id_col), F.col(payload_col)) \
        .mapInPandas(run, _CHUNK_SCHEMA)

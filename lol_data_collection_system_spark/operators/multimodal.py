"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

Design (the 100 TB shape):
- A multimodal table is (id, modality, payload binary, meta struct). The
  payload column is NEVER parsed by Catalyst — scans prune it unless a
  stage needs bytes, so metadata-only queries stay columnar and cheap.
- Decode / feature-extract / resize / frame-sample run as `mapInPandas`
  over Arrow record batches: bytes flow JVM→Python zero-copy-ish
  per-batch, not per-row; partition boundaries are preserved (no
  shuffle); output schemas are declared up front so downstream stages
  stay fully typed.
- The actual codec calls (PIL/ffmpeg/soundfile) are STUBBED behind
  `_decode_payload` — the container ships no media libs. The stub is
  deterministic (derived from the bytes), so the plumbing — schema,
  batching, partitioning, UDF signature — is real and testable; swapping
  in a real codec changes one function.

Reference analogue: the reference stores opaque JSON documents next to
relational rows and parses them per use (`models.py:101-103`); the binary
column + lazy decode is the same "relational spine + document payload"
pattern with the payload opaque to the planner.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_payload(payload: bytes, modality: str) -> list[float]:
    """STUB decode: the real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` / ``soundfile.read`` /
    ``av.open`` — none of which ship in this container. Deterministic
    fake: 4 floats derived from the md5 of the bytes, so tests can assert
    exact values and the Arrow round-trip is exercised end-to-end.
    """
    digest = hashlib.md5(payload).digest()
    # k / 2^32 is a dyadic rational — exact in float, no rounding needed
    return [
        int.from_bytes(digest[i : i + 4], "big") / 2**32 for i in range(0, 16, 4)
    ]


def decode_features(media: DataFrame, batch_limit: int = 1024) -> DataFrame:
    """payload → (n_bytes, md5, feature vector) via mapInPandas.

    One Arrow batch in, one out; no shuffle — the decode inherits the
    scan's partitioning. `batch_limit` caps rows per emitted batch so a
    partition of large blobs can't blow Python memory (stream, don't
    accumulate).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                payloads = chunk["payload"]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].astype("int64"),
                        "modality": chunk["modality"],
                        "n_bytes": payloads.map(len).astype("int64"),
                        "payload_md5": payloads.map(
                            lambda b: hashlib.md5(bytes(b)).hexdigest()
                        ),
                        "feature": [
                            _decode_payload(bytes(b), m)
                            for b, m in zip(payloads, chunk["modality"])
                        ],
                    }
                )

    return media.mapInPandas(run, DECODED_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n: int = 10, meta_frames: Column | None = None
) -> DataFrame:
    """Frame-sampling *plan*: one output row per sampled frame index,
    computed from metadata only (`sequence` + `explode`) — the heavy
    decode is deferred to `decode_features` on the sampled subset. This is
    the pattern that keeps a video corpus scan metadata-only until the
    last stage.
    """
    nf = meta_frames if meta_frames is not None else F.col("meta.n_frames")
    idx = F.sequence(
        F.lit(0), F.greatest(nf - 1, F.lit(0)), F.lit(every_n)
    )
    return media.select(
        "media_id",
        "modality",
        F.explode(idx).alias("frame_idx"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter for the driver's testdata: materialize a MEDIA_SCHEMA table
    from `documents` (payload = utf-8 bytes of text, modality assigned
    round-robin, metadata derived deterministically). Stands in for a real
    (id, blob) source like `spark.read.format("binaryFile")`."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        F.lit(16_000).alias("sample_rate"),
        (F.col("n_chars") % 300 + 1).cast("int").alias("n_frames"),
        F.lit("stub").alias("codec"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )

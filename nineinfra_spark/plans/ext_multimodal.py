"""[EXT] Multimodal column handling (SURVEY.md §2.10 [EXT]).

Treats media payloads as opaque ``binary`` columns with typed
metadata — the lakehouse pattern for image/audio/video at 100 TB:
bytes live in parquet binary columns (or object-store references),
metadata in plain columns, and decode/feature-extraction runs as
Arrow-batched Python over ``mapInPandas``.

No media libraries exist in this container, so the DECODE step is a
deterministic fake (byte-level features); ``decode_image`` documents
the real integration point and raises ``NotImplementedError``. The
Spark-side plumbing — binary schema, Arrow batch shape, partition
behavior, UDF signatures — is real and tested.

The testdata has no binary table, so payloads are derived
deterministically from ``documents.text`` (utf-8 bytes). That keeps
every query oracle-able: DuckDB computes the same bytes via
``encode()``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import t
from nineinfra_spark.plans.registry import query

N_HIST_BUCKETS = 8


def payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, fmt, width, height).

    The binary payload + typed metadata shape every multimodal table
    here uses; metadata is deterministic so oracles can replicate it.
    """
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("wav")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        (16 + (F.col("doc_id") % 5) * 8).cast("int").alias("width"),
        (16 + (F.col("doc_id") % 7) * 8).cast("int").alias("height"),
    )


def decode_image(payload: bytes, fmt: str) -> object:
    """Real decode integration point (PIL/libav/etc.).

    STUB: media libraries are not available in this environment; the
    pipelines below use deterministic byte-level fakes instead.
    """
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; use the byte-level feature extractors instead"
    )


@query(
    "mm_metadata_extract",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS fmt,
           octet_length(encode(text)) AS n_bytes,
           CAST(16 + (doc_id % 5) * 8 AS INT) AS width,
           CAST(16 + (doc_id % 7) * 8 AS INT) AS height,
           CAST(16 + (doc_id % 5) * 8 AS INT) * CAST(16 + (doc_id % 7) * 8 AS INT) AS n_pixels
    FROM documents
    """,
    tags=("ext", "multimodal"),
)
def mm_metadata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over a binary media column: byte
    size from the binary payload itself plus declared dimensions.
    Pure per-row projection on the binary column — scan-speed at any
    scale, and the payload column is pruned away by Catalyst wherever
    a query touches only metadata."""
    return payloads(spark, sf_dir).select(
        "doc_id",
        "fmt",
        F.length("payload").alias("n_bytes"),
        "width",
        "height",
        (F.col("width") * F.col("height")).alias("n_pixels"),
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH f AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text), 16),
                              i -> ascii(substr(text, CAST(i AS INT), 1))) AS frames
        FROM documents
    )
    SELECT doc_id, len(frames) AS n_frames,
           CAST(list_aggregate(frames, 'sum') AS BIGINT) AS frame_checksum
    FROM f
    """,
    tags=("ext", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a media stream: take every 16th byte as a
    'frame' (stand-in for video frame extraction), emit frame count +
    checksum. The access pattern — strided reads within one row's
    payload, no cross-row state — is exactly how real frame sampling
    distributes: rows are independent, so partitioning is free."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(
                "transform(sequence(1, length(text), 16), i -> ascii(substr(text, i, 1)))"
            ).alias("frames"),
        )
        .select(
            "doc_id",
            F.size("frames").alias("n_frames"),
            F.expr("aggregate(frames, 0L, (acc, x) -> acc + x)").alias("frame_checksum"),
        )
    )


def _byte_histogram_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per-payload byte histogram (deterministic
    fake 'decode' — see module docstring). Vectorized per Arrow batch;
    emits a fixed set of scalar feature columns (h0..h7) like a real
    embedding extractor would emit fixed-shape features. Scalar
    columns (not array<double>) keep the row hashable for downstream
    row-wise tooling and make the result exactly oracle-able."""
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr >> 5, minlength=N_HIST_BUCKETS)
            row = {"doc_id": int(doc_id), "n_bytes": int(len(arr))}
            for k in range(N_HIST_BUCKETS):
                row[f"h{k}"] = int(hist[k])
            out.append(row)
        yield pd.DataFrame(out)


_HIST_ORACLE = """
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               hex(encode(text)) AS hx
        FROM documents
    )
    SELECT doc_id, n_bytes,
{bucket_cols}
    FROM b
"""
# byte >> 5 == hi_nibble >> 1, so the bucket of byte i is determined by
# the i-th odd hex digit alone — exact integer arithmetic, no float.
_BUCKET_COL = (
    "        len(list_filter(range(1, n_bytes + 1), "
    "i -> (strpos('0123456789ABCDEF', substr(hx, CAST(2*i-1 AS INT), 1)) - 1) // 2 = {k}"
    ")) AS h{k}"
)


@query(
    "mm_decode_features",
    oracle=_HIST_ORACLE.format(
        bucket_cols=",\n".join(_BUCKET_COL.format(k=k) for k in range(N_HIST_BUCKETS))
    ),
    tags=("ext", "multimodal", "mapInPandas"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched rows → numpy per batch → fixed-shape integer features
    (8-bucket byte histogram as the deterministic decode stand-in; the
    real decoder plugs into ``decode_image``).

    This is THE pattern for multimodal feature extraction at 100 TB:
    embarrassingly parallel over partitions, Arrow transfer (no
    per-row pickling), bounded memory per batch (Spark caps Arrow
    batch rows), output schema fixed so downstream plans are stable.
    The histogram is fully deterministic, so it carries a real DuckDB
    oracle (bucket counts recomputed from the hex of the encoded
    payload — ``byte >> 5`` depends only on the high nibble)."""
    src = payloads(spark, sf_dir).select("doc_id", "payload")
    schema = "doc_id long, n_bytes long, " + ", ".join(
        f"h{k} long" for k in range(N_HIST_BUCKETS)
    )
    return src.mapInPandas(_byte_histogram_batches, schema).orderBy("doc_id")

"""Multimodal columns (SURVEY.md §2.11 L6): opaque binary payloads with
typed metadata, processed by Arrow-batched Pandas UDFs.

The engine's multimodal contract: media rides as a ``binary`` column +
a metadata struct; decode / feature-extract / resize / frame-sample run as
``mapInPandas`` stages so each Arrow batch crosses the JVM↔Python boundary
once. Real codecs (PIL/ffmpeg/torchaudio) are not available in this
container, so the decode step is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is requested.
The Spark-side plumbing — schema, batching, partitioning, UDF signature —
is real and is what the tests/oracle verify.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an image library not present in this
    environment. The pipeline injects :func:`fake_decode_meta` instead."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; use fake_decode_meta for tests"
    )


def fake_decode_meta(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic fake decoder: metadata derived from payload size only —
    stands in for (width, height, n_frames) of a real decoder."""
    return (n_bytes % 640 + 16, (n_bytes * 7) % 480 + 16, n_bytes % 10 + 1)


def llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 — binary payload pipeline: build a binary column (UTF-8 payload
    standing in for image bytes), then 'decode' via mapInPandas with the
    deterministic fake decoder. Arrow moves whole batches; the UDF is
    vectorized over the batch. At 100 TB the input would be parquet with a
    binary column (or file pointers resolved per-partition), partitioned so
    one batch ≈ one Arrow record batch of bounded byte size.
    """
    documents = load_table(spark, sf_dir, "documents")
    with_payload = documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (n_bytes % 640 + 16).astype("int32"),
                    "height": (n_bytes * 7 % 480 + 16).astype("int32"),
                    "n_frames": (n_bytes % 10 + 1).astype("int32"),
                }
            )

    return with_payload.mapInPandas(
        decode_batch,
        "doc_id long, n_bytes long, width int, height int, n_frames int",
    )


ORACLES: dict[str, str] = {
    "llm_multimodal": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
               CAST(octet_length(encode(text)) * 7 % 480 + 16 AS INTEGER) AS height,
               CAST(octet_length(encode(text)) % 10 + 1 AS INTEGER) AS n_frames
        FROM documents
    """,
}

QUERY_FNS = {
    "llm_multimodal": llm_multimodal,
}

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


def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6b — resize stage: fit each decoded image into a 224×224 box
    preserving aspect ratio (integer arithmetic only, so the geometry has
    an exact SQL oracle), and emit a bounded payload slice standing in for
    the re-encoded thumbnail bytes. Runs as a second ``mapInPandas`` stage
    over the same Arrow batches — the chained-stage shape a real
    decode→resize pipeline has; still a narrow map, no shuffle."""
    documents = load_table(spark, sf_dir, "documents")
    with_payload = documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            width = (n_bytes % 640 + 16).astype("int64")
            height = (n_bytes * 7 % 480 + 16).astype("int64")
            # fit into 224x224: scale = 224 / max(w, h), integer floor math
            long_side = width.where(width >= height, height)
            out_w = (width * 224 // long_side).astype("int32")
            out_h = (height * 224 // long_side).astype("int32")
            thumb = pdf["payload"].map(lambda b: b[:256])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": out_w,
                    "out_height": out_h,
                    "thumb_bytes": thumb.map(len).astype("int64"),
                }
            )

    return with_payload.mapInPandas(
        resize_batch,
        "doc_id long, out_width int, out_height int, thumb_bytes long",
    )


def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6c — frame sampling: 1→N fanout from each 'video' payload to up to
    4 evenly spaced frame rows (``idx_j = ⌊j·n_frames/k⌋``) — the
    table-function shape of a real frame sampler, via ``mapInPandas`` so
    each Arrow batch fans out in one pass. Integer index math ⇒ exact SQL
    oracle; output size is bounded by 4× input rows regardless of media
    length."""
    documents = load_table(spark, sf_dir, "documents")
    with_payload = documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len).astype("int64")
            n_frames = (n_bytes % 10 + 1).astype("int64")
            rows = {"doc_id": [], "frame_idx": [], "frame_offset_bytes": []}
            for doc_id, nb, nf in zip(pdf["doc_id"], n_bytes, n_frames):
                k = min(int(nf), 4)
                frame_sz = int(nb) // int(nf)
                for j in range(k):
                    idx = j * int(nf) // k
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_offset_bytes"].append(idx * frame_sz)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "frame_offset_bytes": pd.Series(
                        rows["frame_offset_bytes"], dtype="int64"
                    ),
                }
            )

    return with_payload.mapInPandas(
        sample_batch,
        "doc_id long, frame_idx int, frame_offset_bytes long",
    )


def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6d — feature-extraction stage: numeric features per payload (byte
    count, mean byte value, distinct byte count) computed batch-vectorized
    in the UDF — the shape of an embedding/feature extractor, with a cheap
    deterministic feature so the stage has an exact oracle (the fixture
    payloads are ASCII, so bytes == codepoints on the SQL side). Narrow
    map; feature width is fixed, so output size is rows × O(1) regardless
    of media size."""
    documents = load_table(spark, sf_dir, "documents")
    with_payload = documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def feature_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, mean_num, n_distinct = [], [], []
            for b in pdf["payload"]:
                n = len(b)
                n_bytes.append(n)
                mean_num.append(sum(b))
                n_distinct.append(len(set(b)))
            nb = pd.Series(n_bytes, dtype="int64")
            # integer byte sum / integer count: exact in double; EMPTY
            # payloads get the documented -1.0 sentinel (not NaN — NaN
            # never hash-compares equal, and a 0-byte payload is a valid
            # input the fixture happens not to contain)
            mean = (pd.Series(mean_num, dtype="float64") / nb).where(
                nb > 0, -1.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": nb,
                    "mean_byte": mean,
                    "n_distinct_bytes": pd.Series(n_distinct, dtype="int32"),
                }
            )

    return with_payload.mapInPandas(
        feature_batch,
        "doc_id long, n_bytes long, mean_byte double, n_distinct_bytes int",
    )


ORACLES: dict[str, str] = {
    "llm_multimodal_features": """
        WITH ch AS (
            -- len(text) > 0 guard: DuckDB's string_split('', '') yields
            -- [''] and unicode('') is -1, which would fabricate a 1-byte
            -- row for an empty payload; empty docs take the LEFT JOIN
            -- sentinel path instead (0 bytes, mean -1.0)
            SELECT doc_id, unicode(unnest(string_split(text, ''))) AS cp
            FROM documents WHERE len(text) > 0
        ),
        agg AS (
            SELECT doc_id,
                   COUNT(*) AS n_bytes,
                   CAST(SUM(cp) AS DOUBLE) / COUNT(*) AS mean_byte,
                   CAST(COUNT(DISTINCT cp) AS INTEGER) AS n_distinct_bytes
            FROM ch GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(a.n_bytes, 0) AS n_bytes,
               COALESCE(a.mean_byte, -1.0) AS mean_byte,
               CAST(COALESCE(a.n_distinct_bytes, 0) AS INTEGER)
                   AS n_distinct_bytes
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "llm_multimodal_resize": """
        WITH d AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   octet_length(encode(text)) % 640 + 16 AS width,
                   octet_length(encode(text)) * 7 % 480 + 16 AS height
            FROM documents
        )
        SELECT doc_id,
               CAST(width * 224 // GREATEST(width, height) AS INTEGER)
                   AS out_width,
               CAST(height * 224 // GREATEST(width, height) AS INTEGER)
                   AS out_height,
               CAST(LEAST(n_bytes, 256) AS BIGINT) AS thumb_bytes
        FROM d
    """,
    "llm_multimodal_frames": """
        WITH d AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(octet_length(encode(text)) % 10 + 1 AS BIGINT)
                       AS n_frames
            FROM documents
        )
        SELECT doc_id,
               CAST((j * n_frames) // LEAST(n_frames, 4) AS INTEGER)
                   AS frame_idx,
               CAST(((j * n_frames) // LEAST(n_frames, 4))
                    * (n_bytes // n_frames) AS BIGINT) AS frame_offset_bytes
        FROM d
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) g
        WHERE j < LEAST(n_frames, 4)
    """,
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
    "llm_multimodal_resize": llm_multimodal_resize,
    "llm_multimodal_frames": llm_multimodal_frames,
    "llm_multimodal_features": llm_multimodal_features,
}

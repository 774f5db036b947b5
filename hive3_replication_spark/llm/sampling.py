"""Corpus assembly for training-data pipelines (SURVEY.md §2.11): stratified
sampling and fixed-budget sequence packing.

Language/source rebalancing is a standard corpus-construction step: keep a
different fraction of each stratum (downsample the over-represented
language, keep all of the rare one). The engine implements it with a
DETERMINISTIC hash bucket instead of ``df.sampleBy`` RNG:

- reproducible: the same document is kept or dropped on every run, on any
  cluster size, independent of partitioning — which is what makes a 100 TB
  corpus build auditable and resumable;
- SQL-expressible: the keep predicate is plain integer arithmetic, so the
  operator has a full DuckDB oracle (sampleBy's Bernoulli RNG would be
  engine-specific and rows-only);
- a narrow filter: no shuffle, fully pushed into the scan stage.

The bucket is an LCG-style mix of the stable document id. The id is first
reduced mod a large prime so the multiply stays far inside int64 even for
petabyte-scale id spaces (ANSI mode would fault on overflow — by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

_PRIME = 1_000_003          # id folding prime (keeps the multiply < 2^63)
_MULT = 1_103_515_245       # LCG multiplier (Numerical Recipes)
_INC = 12_345
_BUCKETS = 2_048

#: Per-language keep thresholds out of _BUCKETS (en is over-represented in
#: the fixture corpus → downsample hardest; zh kept almost whole).
_KEEP: dict[str, int] = {"en": 512, "de": 1024, "es": 1024, "fr": 1024, "zh": 1536}
_DEFAULT_KEEP = 2_048  # unknown stratum: keep everything


def sample_bucket(id_col: F.Column) -> F.Column:
    """Deterministic bucket in [0, _BUCKETS) from a stable integer id."""
    return ((id_col % _PRIME) * _MULT + _INC) % _BUCKETS


def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsampling of the documents corpus."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(keep))
            for lang, keep in sorted(_KEEP.items())
        ],
        F.lit(_DEFAULT_KEEP),
    )
    return (
        docs.withColumn("bucket", sample_bucket(F.col("doc_id")))
        .filter(F.col("bucket") < threshold)
        .select("doc_id", "lang", "source", F.col("bucket").alias("sample_bucket"))
    )


_PACK_SHARDS = 64      # independent packing streams (parallelism unit)
_CTX_TOKENS = 512      # context-window budget per packed sequence


def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assemble documents into fixed-token-budget
    context windows for training, the step between dedup/filtering and
    tokenized shard writing.

    Scale design: a single global greedy pack would serialize on one
    cumulative sum over the whole corpus. Instead documents are dealt into
    ``_PACK_SHARDS`` independent streams by a deterministic id mod (NOT a
    hash of partitioning — reproducible on any cluster size), and packing
    is greedy *within* a shard: running token total over the unique doc_id
    order, sequence number = previous-total DIV budget. One hash shuffle
    on shard + a partition-local sort; 64 streams keep every core busy and
    the window state is a single counter. Oversized docs (> budget) get a
    window to themselves rather than an infinite split — the downstream
    tokenizer truncates, matching standard pipeline behavior."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.least(
        (F.size(F.split(F.col("text"), " "))).cast("bigint"),
        F.lit(_CTX_TOKENS),
    )
    shard = (F.col("doc_id") % _PACK_SHARDS).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select("doc_id", shard, n_tokens.alias("n_tokens"))
    cum = staged.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        ((F.col("cum_tokens") - F.col("n_tokens")) / _CTX_TOKENS)
        .cast("bigint")
        .alias("seq_no"),
        (F.col("cum_tokens") - F.col("n_tokens")).alias("seq_offset_tokens"),
    )


ORACLES: dict[str, str] = {
    "llm_pack_sequences": f"""
        WITH staged AS (
            SELECT doc_id,
                   doc_id % {_PACK_SHARDS} AS shard,
                   LEAST(CAST(LENGTH(string_split(text, ' ')) AS BIGINT),
                         {_CTX_TOKENS}) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, shard, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM staged
        )
        SELECT doc_id, shard, n_tokens,
               (cum_tokens - n_tokens) // {_CTX_TOKENS} AS seq_no,
               cum_tokens - n_tokens AS seq_offset_tokens
        FROM cum
    """,
    "llm_sample_stratified": f"""
        WITH b AS (
            SELECT doc_id, lang, source,
                   ((doc_id % {_PRIME}) * {_MULT} + {_INC}) % {_BUCKETS} AS sample_bucket
            FROM documents
        )
        SELECT doc_id, lang, source, sample_bucket
        FROM b
        WHERE sample_bucket < CASE lang
            WHEN 'en' THEN 512
            WHEN 'de' THEN 1024
            WHEN 'es' THEN 1024
            WHEN 'fr' THEN 1024
            WHEN 'zh' THEN 1536
            ELSE {_DEFAULT_KEEP} END
    """,
}

QUERY_FNS = {
    "llm_sample_stratified": llm_sample_stratified,
    "llm_pack_sequences": llm_pack_sequences,
}

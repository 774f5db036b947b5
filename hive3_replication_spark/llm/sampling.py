"""Stratified sampling for training-data pipelines (SURVEY.md §2.11/2.13).

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

from pyspark.sql import DataFrame, SparkSession
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


ORACLES: dict[str, str] = {
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
}

"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

from pyspark.sql.types import _parse_datatype_string  # noqa: PLC2701


def rows_df(
    spark: SparkSession, schema: StructType | str, rows: list[tuple]
) -> DataFrame:
    """Literal-rows DataFrame built entirely JVM-side.

    ``spark.createDataFrame(list, ...)`` routes tiny metadata relations
    through a Python-RDD scan, which costs a Python worker round-trip per
    job (~4 s per write in local mode — measured). Building the same rows
    as ``range(1) → explode(array(struct(lit…)))`` keeps manifest/watermark
    bookkeeping pure JVM: ~20× faster and no Python in executor tasks.
    """
    if isinstance(schema, str):
        schema = _parse_datatype_string(schema)
        assert isinstance(schema, StructType)
    structs = []
    for row in rows:
        cols = []
        for field, value in zip(schema.fields, row):
            cols.append(F.lit(value).cast(field.dataType).alias(field.name))
        structs.append(F.struct(*cols))
    if not structs:
        return spark.createDataFrame([], schema)
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_r"))
        .select("_r.*")
    )

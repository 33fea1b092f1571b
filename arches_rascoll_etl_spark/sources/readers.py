"""Source/sink connectors.

Generalizes the reference's I/O surface (SURVEY.md §2.1):
* S1 CSV scan with header — ``read_csv``
* S2 CSV sink JSON-encoding nested columns — ``write_csv_with_json_cols``
  (reference: save_data_to_csv_with_objects_as_json,
  arches_rascoll/ref_collection.py:30-50)
* S3 CSV reload parsing JSON strings back to structure —
  ``read_csv_with_json_cols`` (reference: make_objs_from_json_strings,
  ref_collection.py:53-71)
* change-log scan with offset-range pruning — ``read_changelog``
  (partition-pruned by batch_id; the lake-side analogue of tailing a
  binlog offset range)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv_with_json_cols(df: DataFrame, path: str, mode: str = "overwrite") -> list[str]:
    """CSV sink: nested (struct/array/map) columns serialized via to_json.
    Returns the names of the JSON-encoded columns (needed to reload)."""
    nested = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
    ]
    out = df
    for c in nested:
        out = out.withColumn(c, F.to_json(F.col(c)))
    out.write.option("header", True).mode(mode).csv(path)
    return nested


def read_csv_with_json_cols(
    spark: SparkSession,
    path: str,
    json_cols: dict[str, T.DataType | str],
    schema: T.StructType | None = None,
) -> DataFrame:
    """Reload a CSV snapshot, parsing JSON-string columns back to structure.
    ``from_json`` returns null on malformed input — the same skip-on-error
    semantics as the reference's try/except JSON parse."""
    df = read_csv(spark, path, schema)
    for c, dtype in json_cols.items():
        df = df.withColumn(c, F.from_json(F.col(c), dtype))
    return df


def read_changelog(
    spark: SparkSession,
    path: str,
    batch_lo: int | None = None,
    batch_hi: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Scan a change log with offset-range pruning on batch_id.

    When the log is laid out partitioned by batch_id (the generator/bench
    layout), the range predicate prunes entire partitions at planning time —
    verify with .explain(): PartitionFilters: [batch_id >= lo, batch_id <= hi].
    """
    df = spark.read.format(fmt).load(path)
    if batch_lo is not None:
        df = df.where(F.col("batch_id") >= batch_lo)
    if batch_hi is not None:
        df = df.where(F.col("batch_id") <= batch_hi)
    return df

"""Bucketed (co-located) tables: pre-shuffle once at write time so repeated
fact-fact joins and aggregations on the bucket key run with NO exchange
(SURVEY section 4.3; the guide's bucketing pattern).

At 100 TB this is the difference between shuffling both fact tables on
every join and shuffling neither: bucket lineitem and orders on the order
key with the same bucket count, and every subsequent join on that key is
a zip of co-located buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> None:
    """Persist df as an external bucketed+sorted parquet table registered in
    the session catalog (bucket metadata lives in the catalog, which is why
    plain .parquet() writes can't express this)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

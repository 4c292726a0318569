"""Backup / restore (SURVEY section 2.1 S7): the pg_dump / psql-restore ops
(Makefile:103-116) dissolve into parquet directory snapshots in a file-based
columnar engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def backup(df: DataFrame, snapshot_path: str, partition_by: tuple[str, ...] = ()) -> None:
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snapshot_path)


def restore(spark: SparkSession, snapshot_path: str, target_path: str) -> None:
    spark.read.parquet(snapshot_path).write.mode("overwrite").parquet(target_path)

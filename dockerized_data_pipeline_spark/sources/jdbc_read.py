"""Partitioned read FROM an external SQL store via an injectable DB-API
connection factory -- the read half of the JDBC story (``jdbc_upsert.py``
is the write half; reference tables live in Postgres,
/root/reference/scripts/fetch_stock_data.py:86-88).

Spark's built-in JDBC source splits a numeric key into
``numPartitions`` ranges and runs one bounded query per partition; this
module reproduces that execution shape with a plain DB-API driver:

  * the driver computes stride ranges over ``[lower, upper]`` exactly like
    ``spark.read.jdbc(..., column, lowerBound, upperBound, numPartitions)``
    -- the first range is unbounded below and the last unbounded above, so
    rows OUTSIDE the hint bounds are still read (Spark's documented
    semantics: bounds control parallelism, not filtering);
  * each range becomes one Spark partition whose task opens ONE connection
    through the picklable factory and streams its bounded query;
  * the per-range WHERE predicate pushes the split to the database, so
    partitions read disjoint key ranges in parallel -- the parallel-ingest
    shape for backfilling a 100 TB table from an operational store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .jdbc_upsert import ConnectionFactory


def split_ranges(
    lower: int, upper: int, num_partitions: int
) -> list[tuple[int | None, int | None]]:
    """Spark-JDBC-style stride split: ``num_partitions`` (lo, hi) pairs
    meaning ``key >= lo AND key < hi``; None = unbounded (first/last)."""
    if num_partitions <= 1 or lower >= upper:
        return [(None, None)]
    stride = max((upper - lower) // num_partitions, 1)
    bounds = [lower + k * stride for k in range(1, num_partitions)]
    ranges: list[tuple[int | None, int | None]] = [(None, bounds[0])]
    ranges += [(bounds[k], bounds[k + 1]) for k in range(len(bounds) - 1)]
    ranges.append((bounds[-1], None))
    return ranges


def jdbc_partitioned_read(
    spark: SparkSession,
    connection_factory: ConnectionFactory,
    table: str,
    columns: list[str],
    key_col: str,
    lower: int,
    upper: int,
    num_partitions: int,
    schema: str,
    fetch_batch_rows: int = 10_000,
) -> DataFrame:
    """Read ``table`` in parallel: one bounded query per Spark partition.

    ``schema`` is the output DDL string (column order must match
    ``columns``). The factory must be picklable; it runs inside executor
    tasks, one connection per range.
    """
    ranges = split_ranges(lower, upper, num_partitions)
    # exactly ONE range per Spark partition: parallelize with one element
    # per slice. A hash repartition on range_id gives no such bijection --
    # murmur3(id) mod N routinely collides two ranges into one task and
    # leaves others empty, serializing the DB queries it promised to
    # parallelize.
    rows = [(i, r[0], r[1]) for i, r in enumerate(ranges)]
    range_df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, len(rows)),
        "range_id int, lo long, hi long",
    )
    collist = ", ".join(columns)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                preds = []
                if not pd.isna(row["lo"]):
                    preds.append(f"{key_col} >= {int(row['lo'])}")
                if not pd.isna(row["hi"]):
                    preds.append(f"{key_col} < {int(row['hi'])}")
                where = f" WHERE {' AND '.join(preds)}" if preds else ""
                conn = connection_factory()
                try:
                    cur = conn.cursor()
                    cur.execute(f"SELECT {collist} FROM {table}{where}")
                    # stream the cursor in bounded chunks: a wide range must
                    # never materialize its whole result in task memory (a
                    # 100 TB-backfill partition can exceed executor RAM);
                    # each chunk becomes its own Arrow batch downstream
                    while True:
                        chunk = cur.fetchmany(fetch_batch_rows)
                        if not chunk:
                            break
                        yield pd.DataFrame(list(chunk), columns=columns)
                finally:
                    try:
                        conn.close()
                    except Exception:
                        pass

    return range_df.mapInPandas(fetch, schema=schema)

"""Batch file-format connectors: schema-enforced CSV / JSON-lines / ORC
readers and writers with malformed-row tolerance.

The reference's only wire format is JSON (the Alpha Vantage payload,
scripts/fetch_stock_data.py:47-56) and its storage is Postgres; a complete
engine needs the standard batch formats as first-class sources/sinks. All
readers take an EXPLICIT schema -- schema inference is a full extra pass
over the data at 100 TB and is never the production path -- and run in
PERMISSIVE mode with a ``_corrupt_record`` rescue column, the engine-level
twin of sources/parse.py's try_cast discipline (P5): malformed rows become
inspectable rows, never job failures.

Scale posture: every reader is a plain DataFrame scan (splittable files
parallelize per HDFS/S3 block; gzipped CSV/JSON does not split -- prefer
zstd parquet/ORC or uncompressed line formats for bulk data). Writers go
through a single ``.write`` with an explicit ``partitionBy`` so downstream
scans get partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_rescue(schema: T.StructType) -> T.StructType:
    """PERMISSIVE mode needs the rescue column declared in the schema."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with explicit schema; malformed lines land in _corrupt_record."""
    return (
        spark.read.schema(_with_rescue(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with explicit schema; unparseable lines are rescued."""
    return (
        spark.read.schema(_with_rescue(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC is self-describing (schema in the file footer, like parquet)."""
    return spark.read.orc(path)


def split_malformed(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean_rows_without_rescue_col, malformed_rows, cached_source) --
    the P5 contract: quarantine bad input for inspection instead of
    failing or dropping.

    The parsed batch is cached: Spark disallows plans that reference only
    the internal corrupt-record column of a live CSV/JSON scan (the parser
    would have to re-run just to report its own failures), and both halves
    of the split re-scan the same input anyway. Callers process one
    bounded ingest batch at a time (the reference's model), so the cache
    is batch-sized, not corpus-sized; call ``cached_source.unpersist()``
    after the quarantine write (the third return value exists precisely
    so the caller CAN release it -- the two filtered views cannot
    unpersist their parent)."""
    cached = df.cache()
    clean = cached.filter(cached[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = cached.filter(cached[CORRUPT_COL].isNotNull())
    return clean, bad, cached


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Uniform sink: parquet / orc / csv / json with optional partitioning."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", True)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Raw media ingestion: Spark's ``binaryFile`` source reads whole files
    as binary blobs with (path, modificationTime, length, content) columns
    -- the standard on-ramp for image/audio corpora before decode. Scale
    posture: one input partition per file group (spark.sql.files.
    maxPartitionBytes governs packing of small files); filters on path /
    length push to the listing, and content bytes never touch the driver.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def media_from_binary_files(
    spark: SparkSession,
    path: str,
    kind: str = "image",
    glob: str | None = None,
) -> DataFrame:
    """binaryFile rows -> the multimodal MEDIA_SCHEMA contract
    (media_id, kind, blob, meta): ids are xxhash64(path) -- stable across
    re-ingests -- and source path/mtime/length ride along as meta, so the
    decode / frame-sample / feature stages run unchanged on real files."""
    raw = read_binary_files(spark, path, glob)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("blob"),
        F.create_map(
            F.lit("path"), F.col("path"),
            F.lit("length"), F.col("length").cast("string"),
            F.lit("mtime"), F.col("modificationTime").cast("string"),
        ).alias("meta"),
    )

"""plans/mllsh.py: the frozen BucketedRandomProjectionLSH constants must
match what Spark-ML actually generates for (seed=42, dim=64,
numHashTables=4), and the SQL bucket arithmetic must reproduce the
model's hash output -- a Spark-ML upgrade that changes either fails
here before it corrupts the x3 LSH oracles."""

from __future__ import annotations

import duckdb
from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from dockerized_data_pipeline_spark.plans import mllsh


def _fit_model(spark):
    df = spark.range(4).select(
        array_to_vector(
            F.expr("transform(sequence(1, 64), i -> CAST(i AS DOUBLE))")
        ).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=mllsh.BUCKET_LENGTH,
        numHashTables=mllsh.NUM_TABLES,
        seed=mllsh.SEED,
    )
    return lsh.fit(df)


def test_frozen_unit_vectors_match_fitted_model(spark):
    model = _fit_model(spark)
    fitted = [list(v.toArray()) for v in model._java_obj.randUnitVectors()]
    assert fitted == mllsh.UNIT_VECTORS  # bit-exact, not approx


def test_sql_buckets_match_model_hashes(spark):
    """End-to-end: the SQL floor(dot/len) buckets equal the model's hash
    output on real fixture vectors (normalized, like the operator)."""
    from dockerized_data_pipeline_spark.catalog import load_table
    from pyspark.ml.feature import Normalizer

    model = _fit_model(spark)
    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .limit(50)
        .select(
            "vec_id",
            array_to_vector(F.col("embedding").cast("array<double>")).alias("raw"),
        )
    )
    normed = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(emb)
    hashed = model.transform(normed).select("vec_id", "hashes").collect()
    expected = {
        r.vec_id: [int(h[0]) for h in r.hashes] for r in hashed
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "'/root/testdata/sf0.001/embeddings.parquet'"
    )
    cols = ", ".join(f"b{j}" for j in range(mllsh.NUM_TABLES))
    sql = (
        f"WITH {mllsh._normalized_cte()} "
        f"SELECT vec_id, {cols} FROM bk WHERE vec_id IN "
        f"({', '.join(str(k) for k in expected)})"
    )
    got = {r[0]: list(r[1:]) for r in con.execute(sql).fetchall()}
    con.close()
    assert got == expected

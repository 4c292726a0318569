"""Collection-typed column queries (SURVEY section 2.11 X4 first-class
array/map columns; section 2.7 unpivot): array functions over the embedding
vectors, map functions over parsed JSON props, and stack/unpivot.

Float outputs here are element *copies* (first/last/min/max) -- bit-exact
across engines; only the fold-based sum uses the portable left-to-right
aggregate verified in functions.vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .registry import query


@query(
    "f_array_gallery",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS n_dims,
           embedding[1] AS first_val,
           embedding[LEN(embedding)] AS last_val,
           list_max(embedding) AS max_val,
           list_min(embedding) AS min_val,
           LEN(list_filter(embedding, x -> x > 0)) AS n_positive,
           list_reverse(list_slice(embedding, 1, 3))[1] AS third_val
    FROM embeddings
    """,
)
def f_array_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("n_dims"),
        F.element_at(emb, 1).alias("first_val"),
        F.element_at(emb, F.size(emb)).alias("last_val"),
        F.array_max(emb).alias("max_val"),
        F.array_min(emb).alias("min_val"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        # scalar output (3rd element via reverse∘slice): array-typed outputs
        # are kept to rows-only queries so the oracle hash stays on scalars
        F.element_at(F.reverse(F.slice(emb, 1, 3)), 1).alias("third_val"),
    )


@query(
    "f_map_gallery",
    oracle="""
    SELECT event_id,
           LEN(json_keys(props)) AS n_keys,
           json_keys(props)[1] AS first_key,
           CASE WHEN props IS NULL THEN NULL
                ELSE (json_extract_string(props, '$.k') IS NOT NULL)
           END AS has_k,
           COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_or_default
    FROM events
    """,
)
def f_map_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.map_contains_key(m, "k").alias("has_k"),
        F.coalesce(F.element_at(m, "k"), F.lit(-1)).alias("k_or_default"),
    )


@query(
    "set_unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
    """,
)
def set_unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt via the stack generator (the inverse of pivot)."""
    p = load_table(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice)"
        " AS (measure, value)",
    )

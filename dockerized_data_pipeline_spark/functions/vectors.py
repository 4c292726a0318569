"""Vector math over ``array<float>`` embedding columns (SURVEY section 2.11
X3/X4): dot product, norms, cosine similarity as higher-order-function
column expressions -- JVM-side, no UDFs, no shuffle.

Element folds are left-to-right in both Spark (``aggregate``) and DuckDB
(``list_dot_product``), so double-precision results are bit-identical across
engines -- which is what lets cosine scores be oracle-checked after coarse
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL for a zero-norm side (cosine is undefined there): try_divide
    mirrors DuckDB's x/0 -> NULL, where ANSI `/` would raise -- found by
    the r10 NULL tier via hash-embeds of NULL text (exactly the zero
    vector). Arithmetic is unchanged for every non-zero denominator."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def literal_vector(values) -> Column:
    """A query vector as a literal array column (broadcast as a constant into
    every task -- no join needed for 1-vector probes)."""
    return F.array(*[F.lit(float(v)) for v in values])


def literal_matrix(rows) -> Column:
    """A codebook as ONE array<array<double>> literal.

    Per-centroid expression loops (``F.array(*[fold(v, literal_vector(c))
    for c in centroids])``) build k x dim plan nodes through py4j and
    k x dim-term codegen -- a FIXED cost of several seconds per query at
    k=32, dim=64 that dominated the semantic-dedup family's wall time at
    every scale factor (sf0.001 and sf0.1 timed the same). A single
    nested literal plus ``F.transform`` keeps the tree constant-size
    while evaluating the identical IEEE arithmetic per row (verified
    bit-equal), and the same per-row work ships to executors as one
    small constant instead of a giant expression."""
    return F.lit([[float(v) for v in r] for r in rows])


def int8_quantize_stats(
    df, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """Symmetric int8 scalar quantization stats per vector: scale =
    max|x|/127, codes = floor(x/scale + 0.5) in [-127, 127], plus exact
    reconstruction-error ppm -- pure higher-order-function expressions,
    zero shuffle, zero Python. floor-based rounding is engine-portable
    where round() half-ties are not. The scale is materialized as its own
    column first: referencing it inside the transform lambda would
    re-evaluate the O(dim) array_max per ELEMENT."""
    d = df.select(
        id_col,
        F.transform(F.col(vec_col), lambda e: e.cast("double")).alias("v"),
    ).withColumn(
        "scale",
        F.greatest(
            F.array_max(F.transform(F.col("v"), lambda e: F.abs(e))) / F.lit(127.0),
            F.lit(1e-30),
        ),
    )
    code = lambda e: F.floor(e / F.col("scale") + F.lit(0.5))
    err_num = F.aggregate(
        F.transform(
            F.col("v"),
            lambda e: (e - code(e) * F.col("scale")) * (e - code(e) * F.col("scale")),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    err_den = F.aggregate(
        F.transform(F.col("v"), lambda e: e * e), F.lit(0.0), lambda a, b: a + b
    )
    return d.select(
        id_col,
        F.size("v").cast("bigint").alias("n_dims"),
        F.array_max(F.transform(F.col("v"), lambda e: F.abs(code(e))))
        .cast("bigint")
        .alias("max_abs_code"),
        F.floor(err_num / F.greatest(err_den, F.lit(1e-30)) * F.lit(1000000.0))
        .cast("bigint")
        .alias("err_ppm"),
    )

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
    return dot(a, b) / (norm(a) * norm(b))


def literal_vector(values) -> Column:
    """A query vector as a literal array column (broadcast as a constant into
    every task -- no join needed for 1-vector probes)."""
    return F.array(*[F.lit(float(v)) for v in values])

"""Feature-hash embeddings: text -> dense vector entirely in-engine.

The classic hashing trick (Weinberger et al., ICML'09): each token hashes
to one of ``dim`` buckets with a +/-1 sign, and a document's embedding is
the per-bucket signed count. No vocabulary, no model artifact, no Python
in the hot path -- and the output feeds the same ANN stack (cosine top-k,
k-means, IVF) as learned embeddings. The quality is obviously below a
trained encoder, but the pipeline shape (doc -> vector -> index -> probe)
is identical, which is what an engine has to supply.

Cross-engine portable hashing: md5 hex is identical everywhere; hex chars
map to integers by position in '0123456789abcdef' (strpos/instr), so
bucket and sign derive portably without any hex->int cast (DuckDB lacks
conv()). All weights are exact bigints -> SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

_HEX = "0123456789abcdef"


def _hex_val(c: Column) -> Column:
    """Position of a hex char in the alphabet, 0..15 (portable hex->int)."""
    return F.instr(F.lit(_HEX), c) - 1


def feature_hash_sparse(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Sparse form: (doc, bucket, weight) with weight = signed token count.

    bucket = (16*h[0] + h[1]) % dim, sign = parity of h[2], where h is
    md5(token) hex. One explode + one hash-agg shuffle keyed on
    (doc, bucket); weights are exact bigints.
    """
    if not 1 <= dim <= 256:
        raise ValueError("dim must be in [1, 256] (two hex chars of entropy)")
    tk = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", F.md5(F.col("tok")))
    bucket = F.pmod(
        _hex_val(F.substring("h", 1, 1)) * 16 + _hex_val(F.substring("h", 2, 1)),
        F.lit(dim),
    )
    sign = F.when(_hex_val(F.substring("h", 3, 1)) % 2 == 0, 1).otherwise(-1)
    return (
        tk.select("doc", bucket.alias("bucket"), sign.alias("s"))
        .groupBy("doc", "bucket")
        .agg(F.sum("s").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def feature_hash_embed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Dense form: (doc, embedding array<double>[dim]) -- drop-in input for
    cosine_topk / kmeans_fit / ivf_topk. Densification is per-doc map
    assembly over at most ``dim`` aggregated entries. Every input doc gets
    a row: docs whose signed token counts fully cancel (and empty-token
    docs) yield the zero vector via the left join back to the distinct doc
    ids -- without it they would silently vanish from downstream
    cosine/k-means."""
    sparse = feature_hash_sparse(docs, id_col, text_col, dim)
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket"), F.col("weight")))
    )
    ids = docs.select(F.col(id_col).alias("doc")).distinct()
    return (
        ids.join(sparse.groupBy("doc").agg(m.alias("m")), "doc", "left")
        .select(
            "doc",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i), F.lit(0)
                ).cast("double"),
            ).alias("embedding"),
        )
    )

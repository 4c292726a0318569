"""Product quantization (PQ) for embedding compression -- the memory side
of large-scale ANN (IVF in operators/similarity.py is the compute side;
IVF-PQ composes both, the standard billion-vector index layout).

The vector is split into ``m`` contiguous subspaces; each subspace gets
its own k-centroid codebook trained with the deterministic distributed
k-means (operators/kmeans.py -- content-addressed init, decimal-sum
means, so codebooks and codes are bit-identical on any partitioning).
A d-dim float vector then stores as m small integers: for d=16 float32,
m=4, k=8 that is 64 bytes -> 4 x 3 bits, a ~40x compression, with
distance computation against a query reduced to m table lookups.

Everything stays in DataFrame expressions: encoding is the same
array-of-distances argmin used by k-means assignment (whole-stage
codegen, zero shuffle); training is m independent k-means runs over
sliced vectors (m driver-side loops over a k x d_sub codebook each,
the same tiny-collect pattern as the IVF probe)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import _sq_dist, kmeans_fit


def _sub_vec(vec_col: str, j: int, d_sub: int):
    return F.slice(F.col(vec_col), j * d_sub + 1, d_sub)


def pq_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 8,
    iterations: int = 4,
) -> list[list[list[float]]]:
    """Train m sub-codebooks (each k x d/m). The vector dim must divide
    evenly by m (standard PQ constraint)."""
    df = df.filter(F.col(vec_col).isNotNull())  # r10 NULL-vector policy
    dim = len(df.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m

    # r11 (guide section 2.6 "overlap independent jobs"): the m sub-space
    # trainings are fully independent Lloyd's runs -- driver loops of
    # tiny collect jobs whose wall-clock is dominated by sequential
    # job-launch latency, not compute. Submitting them from a small
    # thread pool lets each training's next iteration back-fill the
    # executors the others leave idle: wall time ~= one training instead
    # of m. Results are unchanged -- each thread trains on its own slice
    # with the same deterministic init/means, and the codebook list is
    # assembled in subspace order.
    from concurrent.futures import ThreadPoolExecutor

    def train(j: int) -> list[list[float]]:
        sub = df.select(
            F.col(id_col), _sub_vec(vec_col, j, d_sub).alias("__sub")
        )
        return kmeans_fit(sub, id_col, "__sub", k=k, iterations=iterations)

    with ThreadPoolExecutor(max_workers=min(m, 4)) as pool:
        return list(pool.map(train, range(m)))


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): per-subspace argmin centroid index. One
    scan, pure expressions, no shuffle."""
    from ..functions.vectors import literal_matrix

    df = df.filter(F.col(vec_col).isNotNull())  # r10 NULL-vector policy
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    code_cols = []
    # transform over one codebook literal per subspace: constant-size
    # plan, bit-identical arithmetic (see functions/vectors.literal_matrix)
    for j, cb in enumerate(codebooks):
        sub = _sub_vec(vec_col, j, d_sub)
        dists = F.transform(literal_matrix(cb), lambda c: _sq_dist(sub, c))
        code_cols.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return df.select(F.col(id_col), F.array(*code_cols).alias("codes"))


def pq_reconstruction_mse_ppm(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """1-row summary: TOTAL squared reconstruction error of the PQ
    approximation over the corpus (fixed-point, 6 decimal digits) plus
    the row count -- the quality metric a codebook training job gates on
    before swapping the index (mse = total_err_fp6 / 1e6 / n_vectors).

    A sum is reported rather than the mean (r7, same reasoning as
    kmeans_cluster_sizes): decimal SUM + FLOOR(x * 10^6) is exact integer
    arithmetic identical on Spark and DuckDB, so the query is
    SQL-oracle-able; a decimal AVG divides, and the two engines round
    division results at different scales in the last digit."""
    from ..functions.vectors import literal_matrix

    df = df.filter(F.col(vec_col).isNotNull())  # r10 NULL-vector policy
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    per_sub_err = []
    for j, cb in enumerate(codebooks):
        sub = _sub_vec(vec_col, j, d_sub)
        dists = F.transform(literal_matrix(cb), lambda c: _sq_dist(sub, c))
        per_sub_err.append(F.array_min(dists))
    total_err = per_sub_err[0]
    for e in per_sub_err[1:]:
        total_err = total_err + e
    # decimal before the sum: float summation order is partition-dependent,
    # decimal sums are exact -- same discipline as the k-means means
    return df.select(total_err.cast("decimal(28,10)").alias("err")).agg(
        F.count("*").alias("n_vectors"),
        F.floor(F.sum("err") * 1_000_000).cast("bigint").alias("total_err_fp6"),
    )


def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 2,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """The full IVF-PQ ANN read path: coarse-quantizer pruning (score only
    vectors in the n_probe lists nearest the query), PQ-approximate
    distances for cheap candidate ranking, exact rerank of the top
    ``rerank`` survivors.

    The PQ distance needs NO per-row float vector math: because the query
    is a literal, the m x k table of (query-subvector -> centroid)
    distances is computed driver-side in plain Python and enters the plan
    as literal arrays -- per row the approximate distance is m
    element_at lookups summed, the table-lookup trick that makes PQ fast
    on real indexes. Exact rerank touches only ``rerank`` rows
    (TakeOrderedAndProject bounded twice). Deterministic end to end."""
    from ..functions.vectors import cosine, literal_matrix, literal_vector
    from .similarity import ivf_assignments

    m = len(codebooks)
    d_sub = len(codebooks[0][0])

    # --- driver-side (tiny): probe-list choice + PQ distance tables
    def sq(u, v):
        return sum((a - b) * (a - b) for a, b in zip(u, v))

    def norm_sims(c):
        import math

        dot = sum(a * b for a, b in zip(query_vec, c))
        nq = math.sqrt(sum(a * a for a in query_vec))
        nc = math.sqrt(sum(a * a for a in c)) or 1.0
        return dot / (nq * nc)

    probe_lists = sorted(
        range(len(coarse_centroids)),
        key=lambda i: (-norm_sims(coarse_centroids[i]), i),
    )[:n_probe]
    tables = [
        [sq(query_vec[j * d_sub : (j + 1) * d_sub], c) for c in cb]
        for j, cb in enumerate(codebooks)
    ]

    # --- plan-side: prune -> PQ lookup distance -> bounded exact rerank
    assigned = ivf_assignments(df, coarse_centroids, id_col, vec_col)
    pruned = assigned.filter(F.col("cluster_id").isin(probe_lists))
    approx = F.lit(0.0)
    for j in range(m):
        sub = F.slice(F.col(vec_col), j * d_sub + 1, d_sub)
        dists = F.transform(literal_matrix(codebooks[j]), lambda c: _sq_dist(sub, c))
        code = F.array_position(dists, F.array_min(dists))  # 1-based
        table = F.array(*[F.lit(float(t)) for t in tables[j]])
        approx = approx + F.element_at(table, code.cast("int"))
    candidates = (
        pruned.withColumn("approx_dist", approx)
        .orderBy(F.asc("approx_dist"), F.asc(id_col))
        .limit(rerank)
    )
    q = literal_vector(query_vec)
    return (
        candidates.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_digits)
            .cast(f"decimal(18,{round_digits})")
            .alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )

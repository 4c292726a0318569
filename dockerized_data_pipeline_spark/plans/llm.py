"""LLM-data-pipeline queries (SURVEY section 2.11, BASELINE north_star):
dedup, similarity search, text analysis, JSON-props analytics over the
``documents`` / ``embeddings`` / ``events`` fixtures.

Ratio outputs use FLOOR(x * 1e6) "parts-per-million" integers instead of
decimal rounding: floor of an identical IEEE double is engine-portable,
while round() at a representable tie (dyadic rationals like 1/128) is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread_input
from ..functions import text as TX
from ..functions.vectors import cosine
from ..operators import dedup as DD
from ..operators import similarity as SIM
from .registry import query

_STOP_SQL = "('" + "','".join(TX.STOPWORDS) + "')"


# ---------------------------------------------------------------------------
# X1 -- exact dedup
# ---------------------------------------------------------------------------


@query(
    "x1_exact_dedup_docs",
    oracle="""
    SELECT text, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def x1_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate collapse keyed on content, keeping the smallest id.
    At 100 TB: group on xxhash64(text) first so the shuffle carries digests,
    then verify within hash groups."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@query(
    "x1_dedup_union_self",
    oracle="""
    SELECT DISTINCT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type FROM events
      UNION ALL
      SELECT event_id, user_id, event_type FROM events
    )
    """,
)
def x1_dedup_union_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates over a corpus with planted exact dupes (self-union)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return DD.exact_dedup(ev.unionByName(ev))


# ---------------------------------------------------------------------------
# X5 -- text analysis
# ---------------------------------------------------------------------------


@query(
    "x5_text_stats",
    oracle="""
    SELECT doc_id, lang, n_chars,
           LENGTH(text) AS len_chars,
           LEN(string_split(text, ' ')) AS n_tokens,
           LEN(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_regex_tokens
    FROM documents
    """,
)
def x5_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.length("text").alias("len_chars"),
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.regex_token_count(F.col("text")).alias("n_regex_tokens"),
    )


@query(
    "x5_source_profile",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang, source
    """,
)
def x5_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(TX.token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
    )


@query(
    "x5_stopword_ppm",
    oracle=f"""
    SELECT doc_id,
           CAST(FLOOR(
             LEN(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL}))
             * 1000000.0 / LEN(string_split(text, ' '))
           ) AS BIGINT) AS stop_ppm
    FROM documents
    """,
)
def x5_stopword_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring building block: stopword density in ppm."""
    d = load_table(spark, sf_dir, "documents")
    stop = TX.marker_score(F.col("text"), TX.STOPWORDS)
    total = TX.token_count(F.col("text"))
    return d.select(
        "doc_id",
        F.floor(stop * F.lit(1000000.0) / total).cast("bigint").alias("stop_ppm"),
    )


@query(
    "x5_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(FLOOR(
             (0.5 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 200.0, 1.0)
              + 0.5 * LEAST(
                  CAST(LEN(list_filter(string_split(text, ' '),
                                       t -> t IN {_STOP_SQL})) AS DOUBLE)
                  / GREATEST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) * 0.05, 1.0),
                  1.0))
             * 1000000.0
           ) AS BIGINT) AS quality_ppm
    FROM documents
    """,
)
def x5_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score (length + stopword-density components) as a
    portable ppm integer -- the per-doc gate a corpus-prep pipeline
    filters on (see x7_corpus_prep for the composed flow)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", TX.quality_score_ppm(F.col("text")).alias("quality_ppm")
    )


# COALESCE(.., 0) (r10 NULL tier): NULL text scores 0 on every marker set,
# so the CASE's GREATEST()=0 arm yields 'und' -- the Spark side's
# lang_guess already treats NULL scores as "no hit" (its conditions are
# NULL -> false), so both engines answer 'und' for absent text.
_LANG_SCORE_SQL = {
    lang: f"COALESCE(LEN(list_filter(string_split(text, ' '), t -> t IN ('"
    + "','".join(markers)
    + "'))), 0)"
    for lang, markers in TX.LANG_MARKERS.items()
}


@query(
    "x5_lang_guess",
    oracle=f"""
    SELECT doc_id, lang,
      CASE
        WHEN GREATEST(en_s, es_s, fr_s, de_s) = 0 THEN 'und'
        WHEN en_s = GREATEST(en_s, es_s, fr_s, de_s) THEN 'en'
        WHEN es_s = GREATEST(en_s, es_s, fr_s, de_s) THEN 'es'
        WHEN fr_s = GREATEST(en_s, es_s, fr_s, de_s) THEN 'fr'
        ELSE 'de'
      END AS guessed_lang
    FROM (
      SELECT doc_id, lang,
             {_LANG_SCORE_SQL['en']} AS en_s,
             {_LANG_SCORE_SQL['es']} AS es_s,
             {_LANG_SCORE_SQL['fr']} AS fr_s,
             {_LANG_SCORE_SQL['de']} AS de_s
      FROM documents
    )
    """,
)
def x5_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (argmax with en>es>fr>de priority)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", TX.lang_guess(F.col("text")).alias("guessed_lang"))


@query(
    "x5_doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL ELSE list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                              t -> CAST(LENGTH(t) * 17 + ascii(t[1:1]) AS BIGINT))),
             (acc, v) -> (acc * 31 + v) % {TX.FINGERPRINT_MOD}
           ) END AS fingerprint
    FROM documents
    """,
)
def x5_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (portable integer
    arithmetic, no engine hash builtins)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.doc_fingerprint(F.col("text")).alias("fingerprint"))


@query(
    "x7_corpus_prep",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source, text,
             LEN(string_split(text, ' ')) AS n_tokens,
             LEN(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL})) AS n_stop
      FROM documents
    ), filtered AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 20 AND 1000
        AND n_stop * 50 >= n_tokens          -- stopword density >= 2%
        AND lang IN ('en', 'de', 'fr', 'es')
    ), deduped AS (
      SELECT lang, source, text, MIN(doc_id) AS keep_id,
             MAX(n_tokens) AS n_tokens
      FROM filtered GROUP BY lang, source, text
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(keep_id) AS first_doc
    FROM deduped GROUP BY lang
    """,
)
def x7_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data prep: quality gates (token count + stopword
    density) -> language allowlist -> exact dedup -> per-language corpus
    stats. The whole pipeline is one declarative plan: scan-side filters,
    one dedup shuffle, one aggregation."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = TX.token_count(F.col("text"))
    n_stop = TX.marker_score(F.col("text"), TX.STOPWORDS)
    filtered = (
        d.withColumn("n_tokens", n_tokens)
        .withColumn("n_stop", n_stop)
        .filter(
            F.col("n_tokens").between(20, 1000)
            & (F.col("n_stop") * 50 >= F.col("n_tokens"))
            & F.col("lang").isin("en", "de", "fr", "es")
        )
    )
    deduped = filtered.groupBy("lang", "source", "text").agg(
        F.min("doc_id").alias("keep_id"), F.max("n_tokens").alias("n_tokens")
    )
    return deduped.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("keep_id").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# X6 -- JSON props analytics
# ---------------------------------------------------------------------------


@query(
    "x6_props_analytics",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def x6_props_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# X3 -- similarity search
# ---------------------------------------------------------------------------

_PROBE_VEC_ID = 0


def _probe_vector(spark: SparkSession, sf_dir: str):
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == _PROBE_VEC_ID)
        .select("embedding")
        .first()
    )
    return list(row[0])


# --- DuckDB oracle fragments for the vector-index queries (r7) ------------
#
# These mirror the engine's vector arithmetic EXACTLY so formerly rows-only
# queries hash-match: list_dot_product is the same left-to-right fold as
# F.aggregate(zip_with(...)) (functions/vectors.py), ROW_NUMBER over
# (score DESC|dist ASC, cid) reproduces array_position(array_max/min)'s
# first-occurrence tie-break, and the float->DECIMAL(28,10) cast goes
# through VARCHAR because Spark casts via the double's shortest decimal
# representation while DuckDB's direct float->decimal cast rounds in float
# arithmetic (1.25f -> 1.2499999744; verified divergent, the VARCHAR
# round-trip matches Spark on every fixture value at all three sfs).

_EMB_DIM = 64  # fixture embedding dimensionality (all sfs)


def _duck_cos(a: str, b: str) -> str:
    """Cosine(a, b) in DuckDB, same expression tree as vectors.cosine."""
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _duck_sq_dist(a: str, b: str) -> str:
    """Elementwise (a-b)^2 fold, same order as kmeans._sq_dist (Spark's
    0.0 seed vs list_reduce's first-element seed agree: 0.0 + d == d for
    the non-negative squares)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])), (s, x) -> s + x)"
    )


# WHERE embedding IS NOT NULL: the r10 NULL-vector policy (operators/
# kmeans.py, operators/similarity.py) -- NULL vectors are excluded from
# every vector operator on the Spark side, so every oracle built on this
# CTE excludes them too.
_DUCK_EMB_V = (
    "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"
    " WHERE embedding IS NOT NULL)"
)


def _duck_kmeans_ctes(
    k: int,
    iterations: int,
    dim: int = _EMB_DIM,
    vec_sql: str = "{v}",
    prefix: str = "",
    include_v: bool = True,
):
    """CTE chain replaying operators/kmeans.kmeans_fit in SQL: seeds = k
    smallest md5(vec_id) (cluster id = md5 rank), per-iteration argmin
    assignment by squared distance (ties -> lower cid), DECIMAL(28,10)
    per-dimension sums, mean = correctly-rounded decimal->double (via
    VARCHAR) over exact count; empty clusters keep the previous centroid.

    ``vec_sql`` is the trained vector as a format template over the
    ``v`` CTE's vector column (``{v}`` is the column reference; e.g.
    ``{v}[1:16]`` trains a PQ subspace slice); ``prefix`` namespaces the
    chain's CTEs so several codebooks compose in one statement;
    ``include_v=False`` lets the caller supply its own ``v(vec_id, v)``
    source (e.g. feature-hash embeddings).
    Returns (ctes_sql, final_centroid_cte_name)."""
    parts = [_DUCK_EMB_V] if include_v else []
    parts.append(f"""{prefix}c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
              AS INTEGER) AS cid, {vec_sql.format(v="v")} AS cv
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {k})""")
    for it in range(iterations):
        av = vec_sql.format(v="a.v")
        parts.append(f"""{prefix}a{it} AS (
  SELECT vec_id, sv, cid AS cluster_id FROM (
    SELECT a.vec_id, {av} AS sv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_sq_dist(av, 'c.cv')} ASC, c.cid) AS rn
    FROM v a CROSS JOIN {prefix}c{it} c
  ) WHERE rn = 1)""")
        sums = ", ".join(
            f"SUM(CAST(CAST(sv[{j + 1}] AS VARCHAR) AS DECIMAL(28,10))) AS s{j}"
            for j in range(dim)
        )
        parts.append(
            f"{prefix}s{it} AS (SELECT cluster_id, COUNT(*) AS n, {sums} "
            f"FROM {prefix}a{it} GROUP BY cluster_id)"
        )
        means = ", ".join(
            f"CAST(CAST(s.s{j} AS VARCHAR) AS DOUBLE) / s.n" for j in range(dim)
        )
        parts.append(f"""{prefix}c{it + 1} AS (
  SELECT p.cid, CASE WHEN s.n IS NULL THEN p.cv ELSE list_value({means}) END AS cv
  FROM {prefix}c{it} p LEFT JOIN {prefix}s{it} s ON p.cid = s.cluster_id)""")
    return ",\n".join(parts), f"{prefix}c{iterations}"


def _duck_ivf_topk_sql(cents_cte: str, final_c: str, k: int, n_probe: int) -> str:
    """Probe-ranking + cosine-argmax assignment + pruned top-k, shared by
    the fixed-codebook and kmeans-trained IVF oracles."""
    return f"""
WITH {cents_cte},
q AS (
  SELECT v AS qv FROM v WHERE vec_id = {_PROBE_VEC_ID}
), probe AS (
  SELECT cid FROM {final_c} CROSS JOIN q
  ORDER BY {_duck_cos('cv', 'qv')} DESC, cid LIMIT {n_probe}
), assigned AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT a.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.v', 'c.cv')} DESC, c.cid) AS rn
    FROM v a CROSS JOIN {final_c} c
  ) WHERE rn = 1
)
SELECT a.vec_id,
       CAST(CAST(ROUND({_duck_cos('a.v', 'qv')}, 4) AS DECIMAL(18,4)) AS DOUBLE)
         AS cos_sim
FROM v a JOIN assigned s ON a.vec_id = s.vec_id CROSS JOIN q
WHERE s.cluster_id IN (SELECT cid FROM probe)
ORDER BY cos_sim DESC, a.vec_id LIMIT {k}
"""


_IVF_FIXED_CENTS = """v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
), cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cv
  FROM v WHERE vec_id < 8
)"""

_IVF_FIXED_ORACLE = _duck_ivf_topk_sql(_IVF_FIXED_CENTS, "cents", k=10, n_probe=3)


@query(
    "x3_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = {_PROBE_VEC_ID}
    )
    SELECT vec_id,
           CAST(CAST(ROUND(
             list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))), 4) AS DECIMAL(18,4)) AS DOUBLE) AS cos_sim
    FROM embeddings, q
    WHERE embedding IS NOT NULL
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def x3_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k against a probe vector (the baseline
    ANN answer; TakeOrderedAndProject, no global sort)."""
    return SIM.cosine_topk(
        load_table(spark, sf_dir, "embeddings"), _probe_vector(spark, sf_dir), k=10
    )


@query(
    "x3_cosine_neardup_pairs",
    oracle="""
    SELECT id_a, id_b, CAST(cos_sim AS DOUBLE) AS cos_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             CAST(ROUND(
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
               4) AS DECIMAL(18,4)) AS cos_sim
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id
    ) WHERE cos_sim >= 0.60
    """,
)
def x3_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact quadratic baseline; the scale
    path is operators.similarity.lsh_neardup_pairs)."""
    return SIM.cosine_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=0.60
    )


# ---------------------------------------------------------------------------
# X2 -- near-duplicate text detection
# ---------------------------------------------------------------------------


@query(
    "x2_ngram_jaccard_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE lang = 'de' AND LEN(string_split(text, ' ')) >= 4
    ), sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(generate_series(1, LEN(toks) - 3),
                      i -> array_to_string(list_slice(toks, i, i + 3), ' '))) AS shingle
        FROM d)
    ), cnt AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(FLOOR(n_common * 1000000.0
                      / (ca.n_sh + cb.n_sh - n_common)) AS BIGINT) AS jaccard_ppm
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE n_common * 20 >= (ca.n_sh + cb.n_sh - n_common)
    """,
)
def x2_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-gram Jaccard pairs over the 'de' slice (the verification pass
    for LSH candidates; integer threshold compare, ppm output)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    return DD.ngram_jaccard_pairs_ppm(docs, "doc_id", "text", n=4, threshold_num=1, threshold_den=20)


# X8: benchmark decontamination. src19 plays the held-out eval set; the
# rest of the corpus is scanned ONCE and its shingles hash-joined against
# the BROADCAST benchmark shingle set (eval sets are small by
# construction). Containment -- the fraction of the benchmark doc's
# n-grams present in the corpus doc -- not Jaccard, so a long document
# embedding a short benchmark item still scores high.
@query(
    "x8_decontaminate_overlap",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks
      FROM documents WHERE LEN(string_split(text, ' ')) >= 4
    ), sh AS (
      SELECT DISTINCT doc_id, source, shingle FROM (
        SELECT doc_id, source,
               UNNEST(list_transform(generate_series(1, LEN(toks) - 3),
                      i -> array_to_string(list_slice(toks, i, i + 3), ' '))) AS shingle
        FROM d)
    ), bcnt AS (
      SELECT doc_id, COUNT(*) AS n_bench_sh
      FROM sh WHERE source = 'src19' GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_id AS corpus_doc, b.doc_id AS bench_doc, COUNT(*) AS n_common
      FROM (SELECT doc_id, shingle FROM sh WHERE source <> 'src19') c
      JOIN (SELECT doc_id, shingle FROM sh WHERE source = 'src19') b USING (shingle)
      GROUP BY 1, 2
    )
    SELECT corpus_doc, bench_doc,
           CAST(FLOOR(n_common * 1000000.0 / n_bench_sh) AS BIGINT) AS containment_ppm
    FROM inter JOIN bcnt ON bcnt.doc_id = bench_doc
    WHERE n_common * 20 >= n_bench_sh
    """,
)
def x8_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src19")
    bench = docs.filter(F.col("source") == "src19")
    return DD.ngram_containment_ppm(
        corpus, bench, "doc_id", "text", n=4, threshold_num=1, threshold_den=20
    )


# Engine-hash-based ops: deterministic but not SQL-portable -> rows-only.


def _kmeans_codebook_oracle() -> str:
    ctes, final_c = _duck_kmeans_ctes(k=8, iterations=3)
    return f"""
WITH {ctes},
final_assign AS (
  SELECT vec_id, sqd, cid AS cluster_id FROM (
    SELECT a.vec_id, c.cid, {_duck_sq_dist('a.v', 'c.cv')} AS sqd,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_sq_dist('a.v', 'c.cv')} ASC, c.cid) AS rn
    FROM v a CROSS JOIN {final_c} c
  ) WHERE rn = 1)
SELECT CAST(cluster_id AS INTEGER) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(FLOOR(SUM(CAST(CAST(sqd AS VARCHAR) AS DECIMAL(28,10))) * 10000)
            AS BIGINT) AS sum_sq_dist_fp4
FROM final_assign GROUP BY cluster_id
"""


@query("x3_kmeans_codebook", oracle=_kmeans_codebook_oracle())
def x3_kmeans_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF centroid codebook from the data with deterministic
    distributed k-means (operators/kmeans.py: content-addressed init,
    decimal-sum means -> identical centroids on any partitioning) and
    report per-cluster sizes + exact fixed-point inertia. Oracled (r7):
    the iterations unroll into a DuckDB CTE chain replaying the same
    md5-rank seeds, argmin tie-breaks, and decimal sums, so even the
    trained-float path hash-matches across engines."""
    from ..operators import kmeans as KM

    emb = load_table(spark, sf_dir, "embeddings")
    return KM.kmeans_cluster_sizes(emb, "vec_id", "embedding", k=8, iterations=3)


@query("x3_ivf_topk", oracle=_IVF_FIXED_ORACLE)
def x3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN top-k. Codebook = first 8 vectors by id
    (deterministic stand-in for trained centroids), probing the 3 nearest
    lists. Oracled (r7): probe ranking, cosine-argmax assignment, and the
    pruned top-k all replay in DuckDB with identical fold arithmetic."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        list(r[0])
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").select("embedding").collect()
    ]
    return SIM.ivf_topk(emb, _probe_vector(spark, sf_dir), cents, k=10, n_probe=3)


def _ivf_trained_oracle() -> str:
    ctes, final_c = _duck_kmeans_ctes(k=8, iterations=2)
    return _duck_ivf_topk_sql(ctes, final_c, k=10, n_probe=3)


@query("x3_ivf_topk_trained", oracle=_ivf_trained_oracle())
def x3_ivf_topk_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over a codebook TRAINED by the deterministic k-means
    (the production pairing: kmeans_fit centroids spread over the data,
    so each list is balanced and n_probe/n_lists prunes evenly --
    arbitrary seed vectors make no such promise). Oracled (r7): the
    k-means CTE chain feeds the same probe/assign/top-k SQL as
    x3_ivf_topk."""
    from ..operators import kmeans as KM

    emb = load_table(spark, sf_dir, "embeddings")
    cents = KM.kmeans_fit(emb, "vec_id", "embedding", k=8, iterations=2)
    return SIM.ivf_topk(emb, _probe_vector(spark, sf_dir), cents, k=10, n_probe=3)


def _brp_pairs_oracle() -> str:
    from .mllsh import brp_pairs_sql

    return brp_pairs_sql(0.9)


@query("x3_lsh_neardup_pairs", oracle=_brp_pairs_oracle())
def x3_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE scale path for embedding near-dup pairs: random-projection LSH
    bucket join (operators/similarity.py lsh_neardup_pairs) -- candidate
    cost tracks bucket density, not n^2. Hash-matched (r8, was rows-only
    as "Spark-ML internals"): the model's random unit vectors are a pure
    function of (seed, dim, numHashTables), frozen as literals in
    plans/mllsh.py and pinned by tests/test_mllsh.py; normalization,
    bucketing, and the strict euclidean re-distance replay in DuckDB.
    x3_cosine_neardup_pairs above is the exact quadratic VERIFICATION
    BASELINE, and tests/test_llm_ops.py asserts planted-neighbor recall
    against it. Euclidean threshold 0.9 on unit vectors ~= cosine 0.60
    (the baseline's threshold: cos = 1 - d^2/2)."""
    return SIM.lsh_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold_euclidean=0.9
    )


def _brp_capped_oracle() -> str:
    from .mllsh import brp_pairs_capped_sql

    return brp_pairs_capped_sql(1.3)


@query("x3_brp_pairs_bucket_capped", oracle=_brp_capped_oracle())
def x3_brp_pairs_bucket_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100x-SCALE form of x3_lsh_neardup_pairs (VERDICT r10 task 3):
    native random-projection LSH with a hot-bucket cap. The ml-backed
    path above has no bucket bound, so a near-orthogonal corpus (every
    synthetic vector projects near 0) collapses into one mega-bucket and
    a quadratic join -- the SCALE_ORACLE_r10 sf1 timeout. This variant
    ports the MinHash capped design (operators/dedup.py
    _drop_hot_buckets): finer buckets (0.02 vs 0.5) spread the cloud,
    band rows in buckets > 128 are dropped BEFORE the self-join
    (bounded at cap^2 per bucket -- recall tradeoff, never precision:
    the exact re-distance filters every surviving candidate), and
    x3_brp_bucket_skew_profile below is the first-class drop
    accounting. Oracled end-to-end (cap included) via the frozen
    projection literals in plans/mllsh.py.

    Threshold 1.3 (cos ~= 0.155), wider than the ml path's 0.9: the
    synthetic corpus is isotropic with no planted embedding near-dups
    (gen_scale.py draws every component uniform), so at 0.9 the
    survivor set is empty by construction and the differential would
    prove nothing. At 1.3 thousands of candidate pairs flow through
    normalize -> bucket -> cap -> join -> exact re-distance on both
    engines -- a meaningful hash-match of the whole pipeline."""
    return SIM.brp_neardup_pairs_capped(
        load_table(spark, sf_dir, "embeddings"), threshold_euclidean=1.3
    )


def _brp_profile_oracle() -> str:
    from .mllsh import brp_bucket_profile_sql

    return brp_bucket_profile_sql()


@query("x3_brp_bucket_skew_profile", oracle=_brp_profile_oracle())
def x3_brp_bucket_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_size, n_buckets) histogram of the native BRP band table:
    run BEFORE (or beside) x3_brp_pairs_bucket_capped to see exactly
    which bucket sizes the cap drops -- the same pairing as
    x2_minhash_pairs_bucket_capped / x2_lsh_bucket_skew_profile. Tiny
    output, one map-side-combined aggregation."""
    from ..operators.dedup import band_bucket_profile
    from .mllsh import UNIT_VECTORS

    banded = SIM.brp_bucket_table(
        load_table(spark, sf_dir, "embeddings"), UNIT_VECTORS, 0.02
    )
    return band_bucket_profile(banded).select(
        F.col("bucket_size").cast("bigint").alias("bucket_size"),
        F.col("n_buckets").cast("bigint").alias("n_buckets"),
    )


def _neardup_collapse_oracle() -> str:
    from .duckhash import neardup_collapse_sql

    return neardup_collapse_sql()


@query("x2_neardup_collapse", oracle=_neardup_collapse_oracle())
def x2_neardup_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup dedup flow: LSH candidate pairs -> EXACT n-gram
    Jaccard verification restricted to the candidate set -> connected-
    component clusters -> keep one canonical doc per cluster. Clustering
    runs on verified pairs only, so an LSH false positive can never
    merge two genuinely-distinct documents. Returns the surviving corpus
    ids. Hash-matched (r8, was rows-only): XXH64-in-SQL candidates +
    list_intersect Jaccard + RECURSIVE min-id closure
    (plans/duckhash.py::neardup_collapse_sql)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.verified_neardup_pairs(docs, "doc_id", "text")
    return DD.collapse_neardups(docs, pairs).select("doc_id", "lang", "source")


def _simhash_oracles() -> tuple[str, str]:
    from .duckhash import simhash_pairs_sql, simhash_signatures_sql

    return simhash_signatures_sql(), simhash_pairs_sql(3)


_SIMHASH_SIG_ORACLE, _SIMHASH_PAIRS_ORACLE = _simhash_oracles()


@query("x2_simhash_signatures", oracle=_SIMHASH_SIG_ORACLE)
def x2_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-matched (r8, was rows-only): the 64 majority bit-votes over
    per-token XXH64 replay in DuckDB via plans/duckhash.py."""
    return DD.simhash_signatures(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query("x2_simhash_neardup_pairs", oracle=_SIMHASH_PAIRS_ORACLE)
def x2_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding (guaranteed recall at
    hamming <= 3). Hash-matched (r8, was rows-only): signature, banding,
    and the bit_count(xor) hamming filter all replay in DuckDB."""
    return DD.simhash_neardup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


def _minhash_pairs_oracle() -> str:
    from .duckhash import minhash_pairs_sql

    return minhash_pairs_sql()


@query("x2_minhash_neardup_pairs", oracle=_minhash_pairs_oracle())
def x2_minhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native banding MinHash-LSH (deterministic xxhash64; the ml-backed
    variant operators.dedup.minhash_neardup_pairs is the API-compatible
    alternative). Hash-matched (r8, was rows-only as "xxhash64 has no
    DuckDB equivalent"): plans/duckhash.py replays Spark's XXH64 in
    generated SQL -- token hash, shingle fold, 16-way seed-mix
    signatures, banding, and the agreement estimate all reproduce
    bit-for-bit (pinned by tests/test_duckhash.py)."""
    return DD.minhash_neardup_pairs_native(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


_BUCKET_CAP = 2  # fixture buckets top out at 3, so cap=2 exercises drops


def _minhash_capped_oracle() -> str:
    from .duckhash import minhash_pairs_sql

    return minhash_pairs_sql(max_bucket_size=_BUCKET_CAP)


@query("x2_minhash_pairs_bucket_capped", oracle=_minhash_capped_oracle())
def x2_minhash_pairs_bucket_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-bucket-capped LSH variant (r9): buckets larger than
    max_bucket_size are dropped from candidate generation BEFORE the
    bucket self-join, bounding the join at bands * cap^2 rows per bucket
    regardless of how degenerately the corpus hashes -- the guard for
    the failure mode the sf1 scale-oracle run demonstrated (a
    boilerplate-heavy or hash-degenerate corpus turns the 'bounded'
    bucket join quadratic in the hottest bucket). A recall tradeoff,
    never precision; the dropped buckets are first-class observable via
    x2_lsh_bucket_skew_profile."""
    return DD.minhash_neardup_pairs_native(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        max_bucket_size=_BUCKET_CAP,
    )


def _bucket_profile_oracle() -> str:
    from .duckhash import bucket_profile_sql

    return bucket_profile_sql(max_bucket_size=_BUCKET_CAP)


@query("x2_lsh_bucket_skew_profile", oracle=_bucket_profile_oracle())
def x2_lsh_bucket_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-size histogram + which sizes the cap would drop (r9):
    the 'no silent caps' companion to x2_minhash_pairs_bucket_capped.
    One map-side-combined aggregation over the band table; output is one
    row per distinct bucket size (control-plane sized at any corpus
    scale)."""
    d = load_table(spark, sf_dir, "documents")
    sig = DD.minhash_signatures(d, "doc_id", "text", 3, 16)
    banded = DD.banded_signatures(sig, 8, 2)
    return (
        DD.band_bucket_profile(banded)
        .select(
            F.col("bucket_size").cast("bigint").alias("bucket_size"),
            F.col("n_buckets").cast("bigint").alias("n_buckets"),
            (F.col("bucket_size") > _BUCKET_CAP).alias("dropped_at_cap"),
        )
        .orderBy("bucket_size")
    )


# X8: deterministic content-addressed train/val/test splits. Hash-based
# assignment (md5 of the doc id) is the split discipline a training
# pipeline needs at 100 TB: stable under re-runs, re-partitioning, and
# incremental arrivals (a document's split never changes as the corpus
# grows), with no seeded RNG. The split is a pure per-row expression --
# no shuffle before the summary agg. md5 hex is identical across engines,
# and the hex-string range compare keeps boundary arithmetic portable:
# first two hex chars give 256 buckets; < 'cd' is 205/256 ~ 80% train,
# < 'e6' is 25/256 ~ 10% val, rest ~ 10% test.
@query(
    "x8_hash_split_summary",
    oracle="""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM (
      SELECT CASE WHEN b < 'cd' THEN 'train'
                  WHEN b < 'e6' THEN 'val'
                  ELSE 'test' END AS split, n_chars, doc_id
      FROM (SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b,
                   n_chars, doc_id
            FROM documents)
    )
    GROUP BY split
    """,
)
def x8_hash_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# X8: corpus mixture sampling -- downweight sources by keeping a
# deterministic hash fraction of each (the blend step before training:
# e.g. keep all curated text, 50% of mid-tier, 10% of bulk web). Same
# md5-bucket discipline as the split: a doc's keep/drop decision never
# changes across runs or corpus growth, and the whole decision is a
# per-row expression folded into one scan (no sample() RNG, no shuffle
# before the summary agg). 'zz' sorts above every hex char, so tier-1
# keeps everything; '80' is 128/256 = 50%, '1a' is 26/256 ~ 10%.
@query(
    "x8_mixture_sample_summary",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN b < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM (
      SELECT source, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b,
             CASE WHEN source IN ('src0','src1','src2','src3') THEN 'zz'
                  WHEN source IN ('src4','src5','src6','src7') THEN '80'
                  ELSE '1a' END AS thr
      FROM documents
    )
    GROUP BY source
    """,
)
def x8_mixture_sample_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thr = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3"), "zz")
        .when(F.col("source").isin("src4", "src5", "src6", "src7"), "80")
        .otherwise("1a")
    )
    return (
        docs.select("source", b.alias("b"), thr.alias("thr"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("b") < F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
    )


# ---------------------------------------------------------------------------
# X5 (continued) -- repetition quality filters + PII hygiene
# ---------------------------------------------------------------------------


@query(
    "x5_repetition_metrics",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    uc AS (SELECT doc_id, tok, COUNT(*) AS c FROM u GROUP BY 1, 2),
    ua AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_c,
                  COUNT(*) AS n_distinct
           FROM uc GROUP BY 1),
    b AS (SELECT doc_id,
                 [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))] AS bgs
          FROM t),
    bu AS (SELECT doc_id, unnest(bgs) AS bg FROM b),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bu GROUP BY 1, 2),
    ba AS (SELECT doc_id, MAX(c) AS top_bg FROM bc GROUP BY 1)
    SELECT ua.doc_id, n_tokens,
           CAST(FLOOR(n_distinct * 1000000.0 / n_tokens) AS BIGINT)
               AS distinct_token_ppm,
           CAST(FLOOR(top_c * 1000000.0 / n_tokens) AS BIGINT)
               AS top_token_ppm,
           CAST(FLOOR(COALESCE(top_bg, 0) * 1000000.0
                      / GREATEST(n_tokens - 1, 1)) AS BIGINT)
               AS top_bigram_ppm
    FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id
    """,
)
def x5_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: type-token ratio, top-unigram and
    top-bigram fractions per document (operators/quality.py
    repetition_metrics). The downstream corpus-prep gate drops documents
    whose top bigram dominates (boilerplate / template spam)."""
    from ..operators.quality import repetition_metrics

    return repetition_metrics(load_table(spark, sf_dir, "documents"))


@query(
    "x5_pii_redact",
    oracle="""
    WITH aug AS (
      SELECT doc_id, source,
             text || CASE WHEN doc_id % 7 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@example.com or 10.0.'
                     || CAST(doc_id % 256 AS VARCHAR) || '.15 now'
                ELSE '' END AS text
      FROM documents)
    SELECT doc_id, source,
           LEN(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           LEN(regexp_extract_all(text,
               '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ipv4,
           LEN(regexp_extract_all(text,
               '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}')) AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
               '\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def x5_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene pass: detect + redact emails / IPv4s / phone numbers
    (functions/text.py pii_count / pii_redact). The fixture corpus is
    PII-free, so deterministic synthetic PII is planted on every 7th doc
    INSIDE the query -- the oracle plants the identical text, making the
    redaction output a non-trivially-nonzero cross-engine hash check.
    Per-row regexp expressions only: zero shuffle, codegen throughout."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".15 now"),
            ),
        ).otherwise(F.lit("")),
    )
    aug = docs.select("doc_id", "source", planted.alias("text"))
    return aug.select(
        "doc_id",
        "source",
        TX.pii_count(F.col("text"), TX.EMAIL_RE).alias("n_emails"),
        TX.pii_count(F.col("text"), TX.IPV4_RE).alias("n_ipv4"),
        TX.pii_count(F.col("text"), TX.PHONE_RE).alias("n_phones"),
        TX.pii_redact(F.col("text")).alias("redacted"),
    )


# ---------------------------------------------------------------------------
# X3 (continued) -- embedding near-dup collapse, end-to-end
# ---------------------------------------------------------------------------


def _brp_collapse_oracle() -> str:
    from .mllsh import brp_collapse_sql

    return brp_collapse_sql(0.9, 0.5)


@query("x3_neardup_collapse", oracle=_brp_collapse_oracle())
def x3_neardup_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full embedding near-dup dedup flow, mirroring x2_neardup_collapse:
    LSH candidate pairs -> EXACT cosine verification on candidates only ->
    connected-component clusters -> keep the minimum vec_id per cluster.
    Returns the surviving vectors. Hash-matched (r8): frozen-constant
    BRP-LSH candidates + exact cosine + RECURSIVE closure
    (plans/mllsh.py::brp_collapse_sql)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = SIM.verified_cosine_pairs(emb, threshold=0.9).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return DD.collapse_neardups(emb, pairs, id_col="vec_id").select(
        "vec_id", "label"
    )


@query(
    "x8_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 32 AS bucket,
             LEN(string_split(text, ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT bucket,
           CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM c GROUP BY 1, 2
    """,
)
def x8_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: assign documents to
    fixed-token-budget bins (2048 tokens) by sequential fill in id order.

    Scale shape: packing runs WITHIN 32 hash buckets (deterministic
    doc_id % 32), so the window sort is per-bucket -- no global
    single-task sort, and bucket count scales with the cluster. Each bin
    is a training micro-batch; the (bucket, bin_id) pair is the batch key.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 32).alias("bucket"),
        TX.token_count(F.col("text")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.select(
            "bucket",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(2048.0))
            .cast("bigint")
            .alias("bin_id"),
            "n_tokens",
        )
        .groupBy("bucket", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# X5 (continued) -- corpus-level n-gram frequency table
# ---------------------------------------------------------------------------


@query(
    "x5_top_ngrams",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
    b AS (SELECT [toks[i] || ' ' || toks[i+1]
                  FOR i IN range(1, len(toks))] AS bgs FROM t),
    u AS (SELECT unnest(bgs) AS bigram FROM b)
    SELECT bigram, COUNT(*) AS n_occurrences
    FROM u GROUP BY bigram
    ORDER BY n_occurrences DESC, bigram
    LIMIT 20
    """,
)
def x5_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigram frequency table (the n-gram census behind
    boilerplate detection and contamination screens). Scale shape: explode
    bigrams -> hash-agg on the bigram string (map-side partial absorbs
    within-partition repeats) -> TakeOrderedAndProject for the top-k; the
    only shuffle carries (bigram, partial_count) pairs, and the final
    ordered selection never materializes a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    bgs = docs.select(
        F.expr(
            "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
            "         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),"
            "         (a, b) -> concat(a, ' ', b))"
        ).alias("bgs")
    )
    return (
        bgs.select(F.explode("bgs").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("bigram"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# X8 (continued) -- per-source document cap ("domain cap")
# ---------------------------------------------------------------------------


@query(
    "x8_source_cap",
    oracle="""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents) WHERE rk <= 3
    """,
)
def x8_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the "domain cap" dedup-adjacent corpus op:
    no single source may contribute more than k=3 documents). Selection is
    deterministic -- documents are ranked by md5(doc_id), a stable
    pseudo-random order that never changes across runs or corpus growth --
    and skew-safe: source is low-cardinality, so a plain window would sort
    one giant partition per source in a single task; the two-phase
    bucketed_topk (operators/skew.py) keeps every sort bounded."""
    from ..operators.skew import bucketed_topk

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("__ord")
    )
    return bucketed_topk(
        docs,
        partition_cols=["source"],
        order_by=[F.asc("__ord"), F.asc("doc_id")],
        k=3,
        rank_col="rk",
    ).select("doc_id", "source", "rk")


# ---------------------------------------------------------------------------
# X5 (continued) -- percentile length trim
# ---------------------------------------------------------------------------


@query(
    "x5_length_trim",
    oracle="""
    WITH n AS (SELECT doc_id, lang,
                      len(string_split(text, ' ')) AS n_tokens
               FROM documents),
    t AS (SELECT quantile_cont(n_tokens, 0.05) AS lo,
                 quantile_cont(n_tokens, 0.95) AS hi FROM n)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM n, t WHERE n_tokens >= lo AND n_tokens <= hi
    GROUP BY lang
    """,
)
def x5_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier trim: drop documents outside the [p5, p95] token-count
    band (truncation-artifact shards and boilerplate mega-docs are both
    length outliers), reporting survivors per language. The thresholds are
    a 1-row aggregate broadcast back over the scan -- two passes over a
    cached narrow projection at worst, no shuffle wider than the final
    per-language agg. At 100 TB swap percentile() for approx_percentile
    (sketch-mergeable, one pass); the exact form here is the oracle-
    portable baseline."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("lang", TX.token_count(F.col("text")).alias("n_tokens"))
    thr = n.agg(
        F.expr("percentile(n_tokens, 0.05)").alias("lo"),
        F.expr("percentile(n_tokens, 0.95)").alias("hi"),
    )
    return (
        n.crossJoin(F.broadcast(thr))
        .filter((F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# X5 (continued) -- per-source distinctive terms (tf/df relevance)
# ---------------------------------------------------------------------------


@query(
    "x5_distinctive_terms",
    oracle="""
    WITH u AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    tf AS (SELECT source, tok, COUNT(*) AS tf FROM u GROUP BY 1, 2),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM u GROUP BY 1),
    s AS (SELECT source, tf.tok AS tok, tf, df,
                 CAST(FLOOR(tf * 1000000.0 / df) AS BIGINT) AS score_ppm
          FROM tf JOIN df ON tf.tok = df.tok)
    SELECT source, tok, tf, df, score_ppm, rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY score_ppm DESC, tok) AS rk
      FROM s) WHERE rk <= 3
    """,
)
def x5_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf-flavored source profiling: the 3 most source-distinctive
    tokens per source, scored tf/df in portable integer ppm (a token
    concentrated in one source scores high; corpus-wide filler scores ~1).
    Scale shape: one explode feeding two hash-aggs (term frequency keyed
    by (source, token); doc frequency keyed by token -- partial aggs
    absorb the per-token rows map-side), an equi-join on token, then the
    two-phase bucketed_topk per source (source is low-cardinality; a plain
    window would funnel each source through one task)."""
    from ..operators.skew import bucketed_topk

    docs = load_table(spark, sf_dir, "documents")
    u = spread_input(docs.select("doc_id", "source", "text")).select(
        "doc_id", "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    # r11: pre-aggregate the token stream to (tok, doc_id, source) counts
    # before the tf/df aggregates -- the partial agg collapses repeated
    # tokens map-side, so both downstream aggregates consume the distinct
    # (token, doc) stream instead of the raw token stream (measured
    # 0.81 -> 0.58 s med-of-7 at sf0.1). Deliberately NOT localCheckpointed:
    # materializing ~1M small rows through the block manager cost more
    # than recomputing the pre-agg per consumer (measured 0.83 vs 0.58) --
    # the checkpoint-small-intermediates-only rule. Values are unchanged:
    # tf is the sum of per-doc counts, df still COUNT(DISTINCT doc_id).
    g = u.groupBy("tok", "doc_id", "source").agg(F.count("*").alias("__c"))
    tf = g.groupBy("source", "tok").agg(F.sum("__c").alias("tf"))
    df = g.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    s = tf.join(df, "tok").select(
        "source",
        "tok",
        "tf",
        "df",
        F.floor(F.col("tf") * 1_000_000.0 / F.col("df"))
        .cast("bigint")
        .alias("score_ppm"),
    )
    return bucketed_topk(
        s,
        partition_cols=["source"],
        order_by=[F.desc("score_ppm"), F.asc("tok")],
        k=3,
        rank_col="rk",
    ).select("source", "tok", "tf", "df", "score_ppm", "rk")


# ---------------------------------------------------------------------------
# X8 (continued) -- quality-weighted corpus sampling
# ---------------------------------------------------------------------------


_QUALITY_PPM_SQL = f"""CAST(FLOOR(
             (0.5 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 200.0, 1.0)
              + 0.5 * LEAST(
                  CAST(LEN(list_filter(string_split(text, ' '),
                                       t -> t IN {_STOP_SQL})) AS DOUBLE)
                  / GREATEST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) * 0.05, 1.0),
                  1.0))
             * 1000000.0
           ) AS BIGINT)"""


@query(
    "x8_quality_weighted_sample",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, n_chars,
             {_QUALITY_PPM_SQL} AS quality_ppm,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b
      FROM documents),
    banded AS (
      SELECT doc_id, n_chars, b,
             CASE WHEN quality_ppm >= 650000 THEN 'high'
                  WHEN quality_ppm >= 450000 THEN 'mid'
                  ELSE 'low' END AS band,
             CASE WHEN quality_ppm >= 650000 THEN 'zz'
                  WHEN quality_ppm >= 450000 THEN '80'
                  ELSE '1a' END AS thr
      FROM q)
    SELECT band, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN b < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN b < thr THEN n_chars ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM banded GROUP BY band
    """,
)
def x8_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: keep everything from the high-
    quality band, 50% of mid, ~10% of low -- the standard blend step that
    upsamples curated text without discarding the long tail entirely.
    Same deterministic md5-bucket discipline as x8_mixture_sample_summary
    (a doc's keep/drop never changes across runs or corpus growth); the
    whole decision is one per-row expression chain, no shuffle before the
    summary agg."""
    docs = load_table(spark, sf_dir, "documents")
    q = TX.quality_score_ppm(F.col("text"))
    band = (
        F.when(q >= 650000, "high").when(q >= 450000, "mid").otherwise("low")
    )
    thr = (
        F.when(q >= 650000, "zz").when(q >= 450000, "80").otherwise("1a")
    )
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    kept = F.when(b < thr, 1).otherwise(0)
    return (
        docs.select(
            band.alias("band"),
            kept.alias("kept"),
            F.col("n_chars"),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_chars")).cast("bigint").alias("kept_chars"),
        )
    )


# ---------------------------------------------------------------------------
# X7 (continued) -- full corpus-prep composite with repetition gate + splits
# ---------------------------------------------------------------------------


def _rep_with_stop(d: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, top_token_ppm, n_stop) in ONE token pass (r11).

    The r10 x7 pipelines ran operators.quality.repetition_metrics (one
    tokenize+explode) AND a second per-row split+filter for the stopword
    count; folding the stopword count into the same (doc, tok) aggregation
    -- sum(c | tok in STOPWORDS), the identical multiplicity-inclusive
    count marker_score produced -- halves the tokenize work. The ppm
    expression is copied verbatim from repetition_metrics so values stay
    bit-identical."""
    ucc = (
        spread_input(d.select("doc_id", "text"))  # r11: parallelize tokenize
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return (
        ucc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("__nt"),
            F.max("c").alias("__top_c"),
            F.sum(
                F.when(F.col("tok").isin(*TX.STOPWORDS), F.col("c")).otherwise(0)
            ).alias("n_stop"),
        )
        .select(
            "doc_id",
            F.col("__nt").cast("bigint").alias("n_tokens"),
            F.floor(F.col("__top_c") * F.lit(1000000.0) / F.col("__nt"))
            .cast("bigint")
            .alias("top_token_ppm"),
            "n_stop",
        )
    )


@query(
    "x7_corpus_prep_full",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    uc AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    ucc AS (SELECT doc_id, tok, COUNT(*) AS c FROM uc GROUP BY 1, 2),
    rep AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, MAX(c) AS top_c
            FROM ucc GROUP BY 1),
    scored AS (
      SELECT d.doc_id, d.lang, d.source, d.text, rep.n_tokens,
             LEN(list_filter(string_split(d.text, ' '),
                             x -> x IN {_STOP_SQL})) AS n_stop,
             CAST(FLOOR(rep.top_c * 1000000.0 / rep.n_tokens) AS BIGINT)
                 AS top_token_ppm
      FROM documents d JOIN rep ON d.doc_id = rep.doc_id
    ), filtered AS (
      SELECT * FROM scored
      WHERE n_tokens BETWEEN 20 AND 1000
        AND n_stop * 50 >= n_tokens
        AND top_token_ppm < 500000
        AND lang IN ('en', 'de', 'fr', 'es')
    ), deduped AS (
      SELECT lang, text, MIN(doc_id) AS keep_id, MAX(n_tokens) AS n_tokens
      FROM filtered GROUP BY lang, text
    ), split_assigned AS (
      SELECT lang, n_tokens, keep_id,
             CASE WHEN substr(md5(CAST(keep_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                  WHEN substr(md5(CAST(keep_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM deduped
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(keep_id) AS first_doc
    FROM split_assigned GROUP BY lang, split
    """,
)
def x7_corpus_prep_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-corpus pipeline as ONE declarative plan:
    quality gates (length band + stopword density) -> Gopher repetition
    gate (top-unigram dominance, from operators/quality.py's explode-agg
    metrics -- never an O(len^2) per-row scan) -> language allowlist ->
    exact dedup keyed on content -> deterministic md5 train/val/test
    assignment on the surviving id -> per-(lang, split) corpus stats.
    Composes x5_quality/x5_repetition/x1_dedup/x8_hash_split; PII
    redaction (x5_pii_redact) would slot in as one more per-row projection
    before the dedup. Two shuffles total beyond the repetition metric's
    own doc-keyed agg: the dedup hash-agg and the final stats agg."""
    d = load_table(spark, sf_dir, "documents")
    rep = _rep_with_stop(d)  # one token pass: rep metrics + stopword count
    filtered = (
        d.join(rep, "doc_id")
        .filter(
            F.col("n_tokens").between(20, 1000)
            & (F.col("n_stop") * 50 >= F.col("n_tokens"))
            & (F.col("top_token_ppm") < 500000)
            & F.col("lang").isin("en", "de", "fr", "es")
        )
    )
    deduped = filtered.groupBy("lang", "text").agg(
        F.min("doc_id").alias("keep_id"), F.max("n_tokens").alias("n_tokens")
    )
    b = F.substring(F.md5(F.col("keep_id").cast("string")), 1, 2)
    split = F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    return (
        deduped.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("keep_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# X3 (continued) -- product quantization
# ---------------------------------------------------------------------------


def _pq_codes_oracle() -> str:
    d_sub = _EMB_DIM // 4
    chains, kcs = [], []
    for j in range(4):
        lo, hi = j * d_sub + 1, (j + 1) * d_sub
        ctes_j, cj = _duck_kmeans_ctes(
            8, 3, dim=d_sub, vec_sql=f"{{v}}[{lo}:{hi}]", prefix=f"pq{j}_",
            include_v=(j == 0),
        )
        chains.append(ctes_j)
        kcs.append(f"""k{j} AS (
  SELECT vec_id, cid FROM (
    SELECT a.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_sq_dist(f'a.v[{lo}:{hi}]', 'c.cv')} ASC, c.cid) AS rn
    FROM v a CROSS JOIN {cj} c
  ) WHERE rn = 1)""")
    chains_sql = ",\n".join(chains)
    kcs_sql = ",\n".join(kcs)
    return f"""
WITH {chains_sql},
{kcs_sql}
SELECT a.vec_id,
       list_value(CAST(k0.cid AS INTEGER), CAST(k1.cid AS INTEGER),
                  CAST(k2.cid AS INTEGER), CAST(k3.cid AS INTEGER)) AS codes
FROM v a
JOIN k0 ON a.vec_id = k0.vec_id
JOIN k1 ON a.vec_id = k1.vec_id
JOIN k2 ON a.vec_id = k2.vec_id
JOIN k3 ON a.vec_id = k3.vec_id
"""


@query("x3_pq_codes", oracle=_pq_codes_oracle())
def x3_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes for every embedding (operators/pq.py):
    4 subspaces x 8 centroids trained with the deterministic k-means, so
    codebooks and codes are bit-identical on any partitioning (invariants
    in tests/test_pq.py). At scale this is the memory half of an IVF-PQ
    index: the 16-float vector stores as 4 small ints. Oracled (r7):
    four slice-parameterized k-means CTE chains compose in one statement
    (the generator's vec_sql/prefix parameters exist for exactly this)."""
    from ..operators.pq import pq_encode, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, m=4, k=8, iterations=3)
    return pq_encode(emb, cbs)


def _pq_mse_oracle() -> str:
    d_sub = _EMB_DIM // 4
    chains, mparts = [], []
    for j in range(4):
        lo, hi = j * d_sub + 1, (j + 1) * d_sub
        ctes_j, cj = _duck_kmeans_ctes(
            8, 3, dim=d_sub, vec_sql=f"{{v}}[{lo}:{hi}]", prefix=f"pq{j}_",
            include_v=(j == 0),
        )
        chains.append(ctes_j)
        mparts.append(f"""m{j} AS (
  SELECT a.vec_id, MIN({_duck_sq_dist(f'a.v[{lo}:{hi}]', 'c.cv')}) AS e
  FROM v a CROSS JOIN {cj} c GROUP BY a.vec_id)""")
    chains_sql = ",\n".join(chains)
    mparts_sql = ",\n".join(mparts)
    return f"""
WITH {chains_sql},
{mparts_sql},
err AS (
  SELECT CAST(CAST(m0.e + m1.e + m2.e + m3.e AS VARCHAR) AS DECIMAL(28,10))
           AS err
  FROM m0 JOIN m1 ON m0.vec_id = m1.vec_id
  JOIN m2 ON m0.vec_id = m2.vec_id JOIN m3 ON m0.vec_id = m3.vec_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(FLOOR(SUM(err) * 1000000) AS BIGINT) AS total_err_fp6
FROM err
"""


@query("x3_pq_mse", oracle=_pq_mse_oracle())
def x3_pq_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-validating PQ summary: corpus TOTAL squared reconstruction
    error (decimal sum -> partition-invariant fixed-point integer) -- the
    gate a codebook-training job checks before swapping the ANN index.
    Oracled (r7): four trained sub-codebook CTE chains + per-row min
    distances; the sum stays exact integer arithmetic on both engines
    (a ppm MEAN would divide, and decimal division rounds differently
    across engines at the last digit)."""
    from ..operators.pq import pq_reconstruction_mse_ppm, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(emb, m=4, k=8, iterations=3)
    return pq_reconstruction_mse_ppm(emb, cbs)


def _ivfpq_oracle() -> str:
    d_sub = _EMB_DIM // 4
    co_ctes, co_c = _duck_kmeans_ctes(8, 2, prefix="co_")
    chains, kparts = [co_ctes], []
    for j in range(4):
        lo, hi = j * d_sub + 1, (j + 1) * d_sub
        ctes_j, cj = _duck_kmeans_ctes(
            8, 2, dim=d_sub, vec_sql=f"{{v}}[{lo}:{hi}]", prefix=f"pq{j}_",
            include_v=False,
        )
        chains.append(ctes_j)
        # chosen sub-centroid per vector (argmin sq-dist, ties lower cid)
        # carrying the PQ table value = dist(query subvector, chosen
        # centroid) -- arithmetically identical to the Spark plan's
        # element_at lookup into the driver-computed literal table
        kparts.append(f"""k{j} AS (
  SELECT vec_id,
         {_duck_sq_dist(f'(SELECT qv FROM q)[{lo}:{hi}]', 'cv')} AS t
  FROM (
    SELECT a.vec_id, c.cv,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_sq_dist(f'a.v[{lo}:{hi}]', 'c.cv')} ASC, c.cid) AS rn
    FROM v a CROSS JOIN {cj} c
  ) WHERE rn = 1)""")
    chains_sql = ",\n".join(chains)
    kparts_sql = ",\n".join(kparts)
    return f"""
WITH {chains_sql},
q AS (SELECT v AS qv FROM v WHERE vec_id = {_PROBE_VEC_ID}),
probe AS (
  SELECT cid FROM {co_c} CROSS JOIN q
  ORDER BY {_duck_cos('cv', 'qv')} DESC, cid LIMIT 3
),
assigned AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT a.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.v', 'c.cv')} DESC, c.cid) AS rn
    FROM v a CROSS JOIN {co_c} c
  ) WHERE rn = 1
),
{kparts_sql},
candidates AS (
  SELECT s.vec_id
  FROM assigned s
  JOIN k0 ON s.vec_id = k0.vec_id JOIN k1 ON s.vec_id = k1.vec_id
  JOIN k2 ON s.vec_id = k2.vec_id JOIN k3 ON s.vec_id = k3.vec_id
  WHERE s.cluster_id IN (SELECT cid FROM probe)
  ORDER BY 0.0 + k0.t + k1.t + k2.t + k3.t ASC, s.vec_id ASC
  LIMIT 50
)
SELECT a.vec_id,
       CAST(CAST(ROUND({_duck_cos('a.v', 'qv')}, 4) AS DECIMAL(18,4)) AS DOUBLE)
         AS cos_sim
FROM v a JOIN candidates c ON a.vec_id = c.vec_id CROSS JOIN q
ORDER BY cos_sim DESC, a.vec_id ASC LIMIT 10
"""


@query("x3_ivfpq_topk", oracle=_ivfpq_oracle())
def x3_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete billion-vector index read path in one plan
    (operators/pq.py ivfpq_topk): trained coarse quantizer prunes to
    n_probe lists, PQ table-lookup distances rank candidates without
    per-row vector math (the query's m x k distance table enters the plan
    as literals), exact cosine reranks only the bounded survivor set.
    Oracled (r7): FIVE composed k-means CTE chains (coarse + 4 PQ
    subspaces) feed the same prune -> approx-rank -> bounded-rerank flow;
    the literal distance table is replayed as sq-dist(query slice,
    chosen sub-centroid), the identical arithmetic. Recall-vs-exact
    asserted in tests/test_pq.py."""
    from ..operators import kmeans as KM
    from ..operators.pq import ivfpq_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    # r11 (guide section 2.6): the coarse quantizer and the PQ codebooks
    # are trained on the SAME raw vectors and are fully independent --
    # overlap the two driver-loop trainings so one's job tail back-fills
    # the other's idle executors. Identical codebooks, ~half the wall.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_coarse = pool.submit(
            KM.kmeans_fit, emb, "vec_id", "embedding", 8, 2
        )
        f_cbs = pool.submit(pq_train, emb, m=4, k=8, iterations=2)
        coarse, cbs = f_coarse.result(), f_cbs.result()
    return ivfpq_topk(
        emb, _probe_vector(spark, sf_dir), coarse, cbs, k=10, n_probe=3
    )


# ---------------------------------------------------------------------------
# X5 (continued) -- document chunking (sliding token windows)
# ---------------------------------------------------------------------------


@query(
    "x5_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(range(0, GREATEST(n, 1), 48)) AS start
      FROM t)
    SELECT doc_id,
           CAST(start / 48 AS INT) AS chunk_idx,
           CAST(len(list_slice(toks, CAST(start AS INT) + 1,
                               CAST(start AS INT) + 64)) AS INT)
               AS n_chunk_tokens,
           array_to_string(list_slice(toks, CAST(start AS INT) + 1,
                                      CAST(start AS INT) + 64), ' ')
               AS chunk_text
    FROM s
    """,
)
def x5_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token chunks, stride 48 = 16
    tokens of overlap) -- the context-window prep step between cleaning
    and embedding/packing. Pure expressions: tokenize once, posexplode
    the stride sequence, slice per chunk; row multiplication happens
    engine-side with zero shuffle and no per-row Python."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    s = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(48))
        ).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start") + 1, 64)
    return s.select(
        "doc_id",
        (F.col("start") / 48).cast("int").alias("chunk_idx"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@query(
    "x5_token_diversity",
    oracle="""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), cnt AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM tk GROUP BY doc_id, tok
    ), agg AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS d,
             SUM(c * c) AS sum_sq, MAX(c) AS top
      FROM cnt GROUP BY doc_id
    )
    -- LEFT JOIN from documents (r10 NULL tier): the unnest silently drops
    -- NULL-text docs; Spark's higher-order functions keep the row with
    -- NULL metrics, so the oracle must too.
    SELECT dd.doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(d AS BIGINT) AS distinct_tokens,
           CAST(d * 1000000 // n AS BIGINT) AS ttr_ppm,
           CAST(1000000 - (sum_sq * 1000000 // (n * n)) AS BIGINT) AS gini_ppm,
           CAST(top * 1000000 // n AS BIGINT) AS top_share_ppm
    FROM documents dd LEFT JOIN agg ON dd.doc_id = agg.doc_id
    """,
)
def x5_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity / repetition metrics per document (type-token
    ratio, Gini impurity, top-token share -- exact ppm integers). The
    engine side is zero-shuffle higher-order functions; the oracle uses the
    equivalent explode + two-level aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    return TX.token_diversity_frame(docs, "doc_id", "text")


_WINNOW_K, _WINNOW_W = 5, 4


@query(
    "x5_winnow_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
               s -> CAST(LENGTH(s) * 17 + ascii(s[1:1]) AS BIGINT)) AS vals
      FROM documents
    ), g AS (
      SELECT doc_id,
        list_transform(range(1, GREATEST(LEN(vals) - {_WINNOW_K} + 1, 0) + 1),
          i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                                        vals[i:i + {_WINNOW_K} - 1]),
               (acc, v) -> (acc * 31 + v) % {TX.FINGERPRINT_MOD})) AS grams
      FROM t
    ), m AS (
      SELECT doc_id, grams,
        list_transform(range(1, GREATEST(LEN(grams) - {_WINNOW_W} + 1, 0) + 1),
          i -> list_min(grams[i:i + {_WINNOW_W} - 1])) AS mins
      FROM g
    ), sel AS (
      SELECT doc_id,
             list_sort(list_distinct(
               CASE WHEN LEN(mins) >= 1 THEN mins ELSE grams END)) AS fingerprints
      FROM m
    )
    SELECT doc_id, fingerprints,
           CAST(LEN(fingerprints) AS BIGINT) AS n_fp
    FROM sel
    """,
)
def x5_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints per document (SIGMOD'03 local document
    fingerprinting): ~1/w of the k-gram hashes, guaranteed to share a
    fingerprint with any document that shares a token run of length
    >= k + w - 1. Portable integer rolling hash, so the oracle replays the
    identical selection in DuckDB list functions."""
    # r11: the winnow folds are per-row expression work; spread the
    # single-split fixture scan so they parallelize (catalog.spread_input
    # is a no-op on multi-split inputs; measured 0.71 -> 0.39 s at sf0.1)
    docs = spread_input(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    fped = TX.winnow_fingerprints(docs, "text", k=_WINNOW_K, w=_WINNOW_W)
    return fped.select(
        "doc_id",
        "fingerprints",
        F.size("fingerprints").cast("long").alias("n_fp"),
    )


_WINNOW_HOT_CAP = 50  # drop fingerprints occurring in > cap docs (stop-grams)
_WINNOW_MIN_SHARED = 2


@query(
    "x8_winnow_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
               s -> CAST(LENGTH(s) * 17 + ascii(s[1:1]) AS BIGINT)) AS vals
      FROM documents
    ), g AS (
      SELECT doc_id,
        list_transform(range(1, GREATEST(LEN(vals) - {_WINNOW_K} + 1, 0) + 1),
          i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                                        vals[i:i + {_WINNOW_K} - 1]),
               (acc, v) -> (acc * 31 + v) % {TX.FINGERPRINT_MOD})) AS grams
      FROM t
    ), m AS (
      SELECT doc_id, grams,
        list_transform(range(1, GREATEST(LEN(grams) - {_WINNOW_W} + 1, 0) + 1),
          i -> list_min(grams[i:i + {_WINNOW_W} - 1])) AS mins
      FROM g
    ), ex AS (
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN LEN(mins) >= 1 THEN mins ELSE grams END)) AS fp
      FROM m
    ), cold AS (
      SELECT fp FROM ex GROUP BY fp HAVING COUNT(*) <= {_WINNOW_HOT_CAP}
    ), exf AS (
      SELECT ex.doc_id, ex.fp FROM ex JOIN cold USING (fp)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fp
    FROM exf a JOIN exf b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_WINNOW_MIN_SHARED}
    """,
)
def x8_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document overlap (contamination / plagiarism) detection:
    explode each doc's winnow fingerprints, drop hot fingerprints that
    occur in > cap documents (stop-grams -- the same slim-bucket discipline
    as the MinHash band join), then bucket-join on fingerprint and keep
    pairs sharing >= 2. Cost tracks true overlap density, never all-pairs:
    the join key is the fingerprint, so co-bucketed work is bounded by
    cap^2 per fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    # winnow_exploded materializes the slim fingerprint table BEFORE the
    # explode (Generate would collapse the staged winnow projections and
    # re-amplify the array work ~75x); at real scale that checkpoint is
    # "write the fingerprint table"
    ex = TX.winnow_exploded(
        docs, "doc_id", "text", k=_WINNOW_K, w=_WINNOW_W
    ).repartition(32, "fp")
    cold = (
        ex.groupBy("fp")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") <= _WINNOW_HOT_CAP)
        .select("fp")
    )
    exf = ex.join(cold, "fp")
    a, b = exf.alias("a"), exf.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("shared_fp"))
        .filter(F.col("shared_fp") >= _WINNOW_MIN_SHARED)
    )


@query(
    "x6_variant_props",
    oracle="""
    WITH k AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_k,
           CAST(COUNT(DISTINCT k) AS BIGINT) AS distinct_k,
           CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS even_k
    FROM k GROUP BY event_type
    """,
)
def x6_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the Spark 4 VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` extraction -- the scale answer to repeated
    ``get_json_object`` string re-parsing (x6_props_analytics is the
    classic-path twin). Oracle uses DuckDB's JSON extraction."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.parse_json(F.col("props"))
    )
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_k"),
            F.count_distinct(F.col("k")).cast("bigint").alias("distinct_k"),
            F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("even_k"),
        )
    )


_VOCAB_K = 1000


@query(
    "x5_oov_rate",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok
    ), vocab AS (
      SELECT tok FROM freq
      QUALIFY ROW_NUMBER() OVER (ORDER BY c DESC, tok) <= {_VOCAB_K}
    ), scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             COUNT(*) FILTER (WHERE v.tok IS NULL) AS n_oov
      FROM tk t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_oov AS BIGINT) AS n_oov,
           CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_ppm
    FROM scored
    """,
)
def x5_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own top-K
    token vocabulary (deterministic ties: count desc, then token) -- the
    exact-arithmetic stand-in for perplexity filtering: high OOV = the doc
    doesn't look like the corpus. Corpus-conditional: vocabulary comes from
    a token-frequency aggregate, broadcast into the per-doc join (top-K is
    a distributed TakeOrdered, never a driver collect)."""
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    freq = tk.groupBy("tok").agg(F.count("*").alias("c"))
    vocab = (
        freq.orderBy(F.col("c").desc(), F.col("tok"))
        .limit(_VOCAB_K)
        .select("tok")
    )
    scored = (
        tk.join(F.broadcast(vocab.withColumn("__in_v", F.lit(True))), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count(F.when(F.col("__in_v").isNull(), 1)).alias("n_oov"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_oov").cast("bigint").alias("n_oov"),
        F.floor(F.col("n_oov") * 1_000_000 / F.col("n_tokens"))
        .cast("bigint")
        .alias("oov_ppm"),
    )


_N_CURRICULUM_SHARDS = 8


@query(
    "x8_curriculum_shards",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(FLOOR(
               (0.5 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 200.0, 1.0)
                + 0.5 * LEAST(
                    CAST(LEN(list_filter(string_split(text, ' '),
                                         t -> t IN {_STOP_SQL})) AS DOUBLE)
                    / GREATEST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) * 0.05, 1.0),
                    1.0))
               * 1000000.0
             ) AS BIGINT) AS quality_ppm
      FROM documents
    ), sharded AS (
      SELECT doc_id, lang, quality_ppm,
             NTILE({_N_CURRICULUM_SHARDS}) OVER (
               ORDER BY quality_ppm, doc_id) AS shard
      FROM scored
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(quality_ppm) AS min_q, MAX(quality_ppm) AS max_q,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM sharded GROUP BY shard
    """,
)
def x8_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: shard the corpus into N difficulty tiers by
    ascending quality score (NTILE over a deterministic total order --
    quality then doc_id), reporting each tier's size and score range.
    NTILE's global ordering is the one inherently-serial step; at 100 TB
    the same tiers come from quantile cut points (percentile_approx) with
    per-row bucket assignment -- documented here, asserted equivalent in
    tests at fixture scale."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", TX.quality_score_ppm(F.col("text")).alias("quality_ppm")
    )
    sharded = scored.withColumn(
        "shard",
        F.ntile(_N_CURRICULUM_SHARDS)
        .over(Window.orderBy("quality_ppm", "doc_id"))
        .cast("bigint"),
    )
    return sharded.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("quality_ppm").alias("min_q"),
        F.max("quality_ppm").alias("max_q"),
        F.count_distinct(F.col("lang")).cast("bigint").alias("n_langs"),
    )


@query(
    "x5_lang_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS labeled,
             {_LANG_SCORE_SQL['en']} AS en_s,
             {_LANG_SCORE_SQL['es']} AS es_s,
             {_LANG_SCORE_SQL['fr']} AS fr_s,
             {_LANG_SCORE_SQL['de']} AS de_s
      FROM documents
    ), g AS (
      SELECT labeled,
        CASE
          WHEN GREATEST(en_s, es_s, fr_s, de_s) = 0 THEN 'und'
          WHEN en_s = GREATEST(en_s, es_s, fr_s, de_s) THEN 'en'
          WHEN es_s = GREATEST(en_s, es_s, fr_s, de_s) THEN 'es'
          WHEN fr_s = GREATEST(en_s, es_s, fr_s, de_s) THEN 'fr'
          ELSE 'de'
        END AS guessed
      FROM scored
    )
    SELECT labeled, guessed, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY labeled, guessed
    """,
)
def x5_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the marker-based
    lang_guess against the labeled lang column -- the quality-evaluation
    query a corpus pipeline runs before trusting a classifier gate."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.col("lang").alias("labeled"),
            TX.lang_guess(F.col("text")).alias("guessed"),
        )
        .groupBy("labeled", "guessed")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _ivf_recall_oracle() -> str:
    ctes, final_c = _duck_kmeans_ctes(8, 2)
    probe_rows = " UNION ALL ".join(
        f"""
  SELECT CAST({p} AS BIGINT) AS n_probe,
         (SELECT COUNT(*) FROM exact_top) AS k,
         (SELECT COUNT(*) FROM exact_top e JOIN (
            SELECT vec_id FROM scored WHERE prank <= {p}
            ORDER BY cos_sim DESC, vec_id LIMIT 10
          ) a ON e.vec_id = a.vec_id) AS hits"""
        for p in (1, 2, 3, 4, 8)
    )
    return f"""
WITH {ctes},
q AS (SELECT v AS qv FROM v WHERE vec_id = {_PROBE_VEC_ID}),
exact_top AS (
  SELECT e.vec_id,
         CAST(ROUND({_duck_cos('e.v', 'qv')}, 4) AS DECIMAL(18,4)) AS cs
  FROM v e CROSS JOIN q
  ORDER BY cs DESC, e.vec_id LIMIT 10
),
ranked AS (
  SELECT cid, ROW_NUMBER() OVER (
    ORDER BY {_duck_cos('cv', 'qv')} DESC, cid) AS prank
  FROM {final_c} CROSS JOIN q
),
assigned AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT a.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.v', 'c.cv')} DESC, c.cid) AS rn
    FROM v a CROSS JOIN {final_c} c
  ) WHERE rn = 1
),
scored AS (
  SELECT a.vec_id, r.prank,
         CAST(ROUND({_duck_cos('a.v', 'qv')}, 4) AS DECIMAL(18,4)) AS cos_sim
  FROM v a JOIN assigned s ON a.vec_id = s.vec_id
  JOIN ranked r ON s.cluster_id = r.cid CROSS JOIN q
),
rowsx AS ({probe_rows})
SELECT n_probe, k, hits, CAST(hits * 1000000 // k AS BIGINT) AS recall_ppm
FROM rowsx
"""


@query("x3_ivf_recall_eval", oracle=_ivf_recall_oracle())
def x3_ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN self-evaluation: the recall@10-vs-n_probe curve of the
    trained-codebook IVF search against the exact cosine top-10 -- the
    measurement a pipeline runs before choosing its n_probe/n_lists
    operating point (n_probe = 8 of 8 lists scans everything, so its row
    must show recall 1.0; fewer probes trade recall for scan fraction).
    Oracled (r7): the per-n_probe prefix filters replay in SQL as rank
    predicates over one scored table -- the same prefix-consistency
    argument the Spark plan uses."""
    from ..operators import kmeans as KM

    from ..functions.vectors import cosine, literal_vector

    exact = x3_cosine_topk(spark, sf_dir).select("vec_id")
    k = exact.count()
    emb = load_table(spark, sf_dir, "embeddings")
    cents = KM.kmeans_fit(emb, "vec_id", "embedding", k=8, iterations=2)
    probe = _probe_vector(spark, sf_dir)
    # assignment + probe scoring happen ONCE (checkpointed); each
    # n_probe row then only filters the scored table to its cluster
    # prefix -- identical values to per-probe ivf_topk calls (the probe
    # ranking is prefix-consistent and the score expression is the
    # same), but 5x less assignment work
    ranked = SIM.rank_probe_clusters(probe, cents, len(cents))
    scored = (
        SIM.ivf_assignments(emb, cents)
        .select(
            "vec_id",
            "cluster_id",
            F.round(cosine(F.col("embedding"), literal_vector(probe)), 4)
            .cast("decimal(18,4)")
            .alias("cos_sim"),
        )
        .localCheckpoint(eager=True)
    )
    rows = []
    for n_probe in (1, 2, 3, 4, 8):
        approx = (
            scored.filter(F.col("cluster_id").isin(*ranked[:n_probe]))
            .orderBy(F.desc("cos_sim"), "vec_id")
            .limit(10)
            .select("vec_id")
        )
        hit = exact.join(approx, "vec_id", "left_semi").count()
        rows.append((n_probe, int(k), int(hit), int(hit * 1_000_000 // k)))
    return spark.createDataFrame(
        rows, "n_probe long, k long, hits long, recall_ppm long"
    )


_BATCH_PROBES = 5


@query(
    "x3_batch_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < {_BATCH_PROBES}
    ), scored AS (
      SELECT q.probe_id, e.vec_id,
             CAST(ROUND(
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(q.qv, q.qv))), 4) AS DECIMAL(18,4)
             ) AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> q.probe_id
    )
    SELECT probe_id, vec_id, CAST(cos_sim AS DOUBLE) AS cos_sim FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
                               ORDER BY scored.cos_sim DESC, vec_id) <= 3
    """,
)
def x3_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval: exact cosine top-3 neighbors for EACH of the first
    5 probe vectors in one pass -- broadcast the tiny probe set over the
    corpus scan (corpus read once for the whole batch, not once per
    query), then two-phase bucketed top-k per probe so no probe's ranking
    funnels through a single task."""
    from ..functions.vectors import cosine
    from ..operators.skew import bucketed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < _BATCH_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 4)
            .cast("decimal(18,4)")
            .alias("cos_sim"),
        )
    )
    return bucketed_topk(
        scored,
        ["probe_id"],
        [F.col("cos_sim").desc(), F.col("vec_id")],
        k=3,
    ).drop("rk")


@query(
    "x8_dataset_card",
    oracle=f"""
    WITH scored AS (
      SELECT source, lang, text,
             LEN(string_split(text, ' ')) AS n_tokens,
             CAST(FLOOR(
               (0.5 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 200.0, 1.0)
                + 0.5 * LEAST(
                    CAST(LEN(list_filter(string_split(text, ' '),
                                         t -> t IN {_STOP_SQL})) AS DOUBLE)
                    / GREATEST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) * 0.05, 1.0),
                    1.0))
               * 1000000.0
             ) AS BIGINT) AS q_ppm
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique_texts,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(q_ppm) AS BIGINT) AS sum_quality_ppm,
           CAST(MIN(q_ppm) AS BIGINT) AS min_quality_ppm,
           CAST(MAX(q_ppm) AS BIGINT) AS max_quality_ppm
    FROM scored GROUP BY source
    """,
)
def x8_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the per-source summary a team publishes with a
    training corpus -- sizes, dedup headroom (unique texts), language
    spread, token volume, and the quality-score envelope, in one grouped
    pass (quality sums stay exact ppm integers; the mean is the consumer's
    division)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        "lang",
        "text",
        TX.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        TX.quality_score_ppm(F.col("text")).alias("q_ppm"),
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct(F.col("text")).cast("bigint").alias("n_unique_texts"),
        F.count_distinct(F.col("lang")).cast("bigint").alias("n_langs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("q_ppm").cast("bigint").alias("sum_quality_ppm"),
        F.min("q_ppm").alias("min_quality_ppm"),
        F.max("q_ppm").alias("max_quality_ppm"),
    )


_OPENING_TOKENS = 8


@query(
    "x8_shared_openings",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
             md5(array_to_string(string_split(text, ' ')[1:{_OPENING_TOKENS}], ' ')) AS fp,
             source
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_openings
    FROM h a JOIN h b ON a.fp = b.fp AND a.source < b.source
    GROUP BY source_a, source_b
    """,
)
def x8_shared_openings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix on document openings: fingerprint
    the first {8} tokens of every doc, and count, per unordered source
    pair, how many distinct openings they share -- the boilerplate/header
    leakage signal crawl pipelines use to spot sources copying from each
    other. At 100 TB: the DISTINCT is one hash-agg shuffle over slim
    (16-byte fp, source) rows; the self-join shuffles only that distinct
    set on fp, and only fingerprints present in >=2 sources produce output,
    so candidate cost tracks shared-boilerplate density, never n^2 over
    docs."""
    d = load_table(spark, sf_dir, "documents")
    # text IS NOT NULL (r10 NULL tier): concat_ws SWALLOWS a NULL token
    # array, so every NULL-text doc fingerprinted to md5('') and all
    # sources spuriously "shared" the empty opening. Absent text is not
    # a shared opening.
    h = d.filter(F.col("text").isNotNull()).select(
        F.md5(
            F.concat_ws(" ", F.slice(TX.tokens(F.col("text")), 1, _OPENING_TOKENS))
        ).alias("fp"),
        "source",
    ).distinct()
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("shared_openings"))
    )


@query(
    "x5_token_rank_score",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
      SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok
    ), vocab AS (
      SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rnk
      FROM freq QUALIFY rnk <= {1000}
    ), scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tokens,
             SUM(COALESCE(v.rnk, {1000} + 1)) AS rank_sum
      FROM tk t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(rank_sum AS BIGINT) AS rank_sum,
           CAST(rank_sum * 1000000 // n_tokens AS BIGINT) AS mean_rank_ppm
    FROM scored
    """,
)
def x5_token_rank_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean corpus-frequency rank per document (CCNet-style common-token
    quality signal, exact integers end to end): rank the corpus's top-1000
    tokens by frequency (ties broken by token text), score every doc by the
    mean rank of its tokens with out-of-vocab tokens pinned at rank 1001.
    Low mean rank = the doc is built from the corpus's most common words;
    high = rare-token soup. Exact-arithmetic stand-in for perplexity
    filtering with a graded (not binary-OOV) signal. At 100 TB: token
    frequency is one hash-agg shuffle with map-side combine; the top-K is a
    distributed TakeOrdered; the rank window runs over a constant K=1000
    rows and the ranked vocab broadcasts into the per-doc join."""
    from pyspark.sql import Window

    K = 1000
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(TX.tokens(F.col("text"))).alias("tok"))
    freq = tk.groupBy("tok").agg(F.count("*").alias("c"))
    # TakeOrderedAndProject trims the vocab to K rows BEFORE the
    # single-task rank window, so the window input is bounded by the
    # constant K, never the corpus vocabulary.
    topk = freq.orderBy(F.col("c").desc(), F.col("tok")).limit(K)
    w = Window.orderBy(F.col("c").desc(), F.col("tok"))
    vocab = topk.select(
        "tok", F.row_number().over(w).cast("bigint").alias("rnk")
    )
    scored = (
        tk.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("rnk"), F.lit(K + 1))).alias("rank_sum"),
        )
    )
    return scored.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("rank_sum").cast("bigint").alias("rank_sum"),
        F.floor(F.col("rank_sum") * 1_000_000 / F.col("n_tokens"))
        .cast("bigint")
        .alias("mean_rank_ppm"),
    )


_FXP = 4096  # 2^12 fixed-point scale: round(x * 2^12) is the same integer in
# any engine (power-of-two scaling is exact in IEEE doubles; both engines
# round halves away from zero), so centroid component SUMS are exact bigints
# and order-independent -- the float-accumulation trap that normally makes
# per-group vector means un-oracle-able.


@query(
    "x3_centroid_purity",
    oracle=f"""
    WITH comp AS (
      SELECT vec_id, label,
             unnest(generate_series(1, len(embedding))) AS i,
             CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * {_FXP}) AS BIGINT) AS q
      FROM embeddings
    ), cent AS (
      SELECT label AS cand, i, SUM(q) AS s FROM comp GROUP BY label, i
    ), cnorm AS (
      SELECT cand, SUM(s * s) AS cn2 FROM cent GROUP BY cand
    ), vnorm AS (
      SELECT vec_id, SUM(q * q) AS vn2 FROM comp GROUP BY vec_id
    ), dots AS (
      SELECT c.vec_id, v.cand, SUM(c.q * v.s) AS dot
      FROM comp c JOIN cent v ON c.i = v.i
      GROUP BY c.vec_id, v.cand
    ), scored AS (
      SELECT d.vec_id, d.cand,
             CAST(FLOOR(CAST(d.dot AS DOUBLE)
                        / (sqrt(CAST(n.vn2 AS DOUBLE)) * sqrt(CAST(cn.cn2 AS DOUBLE)))
                        * 1000000) AS BIGINT) AS cos_ppm
      FROM dots d
      JOIN vnorm n ON d.vec_id = n.vec_id
      JOIN cnorm cn ON d.cand = cn.cand
    ), nearest AS (
      SELECT vec_id, cand, cos_ppm,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos_ppm DESC, cand) AS rn
      FROM scored
    )
    SELECT e.label AS true_label, nr.cand AS nearest_label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(nr.cos_ppm) AS BIGINT) AS min_cos_ppm,
           CAST(MAX(nr.cos_ppm) AS BIGINT) AS max_cos_ppm
    FROM nearest nr JOIN embeddings e ON nr.vec_id = e.vec_id
    WHERE nr.rn = 1
    GROUP BY true_label, nearest_label
    """,
)
def x3_centroid_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label-quality audit: per-label centroids, then a
    nearest-centroid confusion matrix (true label x nearest centroid's
    label) -- the standard "are my labels/clusters coherent" eval before
    training on labeled embeddings. Exact cross-engine arithmetic: each
    float component becomes round(x * 2^12) (identical bigint in any
    engine), so centroid sums, dot products, and norms are exact integers;
    cosine rescaling by the group count cancels, so centroids are used as
    un-normalized SUM vectors. At 100 TB: the component explode is a slim
    (id, i, q) stream with no shuffle; centroids are one hash-agg down to
    n_labels x dim rows that broadcast into the dot join; per-vector
    aggregates shuffle on the high-cardinality vec_id only; the argmax
    window is partitioned per vector over n_labels rows."""
    return SIM.centroid_purity(
        load_table(spark, sf_dir, "embeddings"), fxp=_FXP
    )


def _fixture_cache(sf_dir: str, src_table: str, namespace: str, build_fn) -> str:
    """Per-fixture persisted-state cache with race-safe publication.

    The key includes the source file's byte size and NANOSECOND mtime, so
    a regenerated fixture can never serve a stale artifact. ``build_fn``
    writes into a private staging dir which is then os.rename'd into
    place -- atomic on POSIX -- so two concurrent sessions (parallel
    pytest, bench + oracle checker) both building the same cache never
    interleave writes into one directory: the loser's rename fails
    against the winner's complete copy and its staging dir is discarded.
    All builds here are deterministic, so cache and recompute are
    byte-equal."""
    import os
    import shutil
    import uuid

    st = os.stat(os.path.join(sf_dir, f"{src_table}.parquet"))
    tag = (
        f"{os.path.basename(sf_dir.rstrip('/'))}"
        f"-{st.st_size}-{st.st_mtime_ns}"
    )
    out = f"/tmp/spark_graft_cache/{namespace}/{tag}"
    if os.path.exists(os.path.join(out, "_CACHE_DONE")):
        return out
    staging = f"{out}.build-{uuid.uuid4().hex[:8]}"
    build_fn(staging)
    open(os.path.join(staging, "_CACHE_DONE"), "a").close()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    try:
        os.rename(staging, out)
    except OSError:
        # only a concurrent COMPLETE build excuses the failed rename --
        # anything else (stale plain file at out, cross-device move)
        # must surface, not silently discard the built artifact
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(os.path.join(out, "_CACHE_DONE")):
            raise
    return out


def _persisted_corpus_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus MinHash signature index AS PERSISTED STATE: built once
    per fixture and read back as slim parquet thereafter. This is the
    operator's real 100 TB posture -- the index is maintained
    incrementally on disk, not re-signed from corpus text per probe --
    and it also de-duplicates the plan (corpus_sig feeds both the
    candidate join and the verification join; an inline subtree would be
    computed twice)."""

    def build(staging: str) -> None:
        corpus = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        DD.minhash_signatures(
            corpus, "doc_id", "text", n=3, num_hashes=16
        ).write.mode("overwrite").parquet(staging)

    return spark.read.parquet(
        _fixture_cache(sf_dir, "documents", "corpus_sig16", build)
    )


def _incremental_pairs_oracle() -> str:
    from .duckhash import incremental_pairs_sql

    return incremental_pairs_sql()


@query("x2_incremental_neardup", oracle=_incremental_pairs_oracle())
def x2_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection (hash-matched r8 via the
    XXH64-in-SQL replay, plans/duckhash.py::incremental_pairs_sql):
    treat doc_id % 10 == 0 as today's arriving batch and the rest
    as the already-indexed corpus, then find every near-dup pair TOUCHING
    the batch by probing the corpus's PERSISTED MinHash signature index --
    corpus text is never re-read and corpus-corpus pairs are never
    recomputed. The daily-delta shape that keeps 100 TB dedup O(batch),
    not O(corpus); the index lives on disk (built once per fixture, see
    _persisted_corpus_sig), so the measured cost is sign-the-batch + two
    probe joins against a 24 B/row table. Deterministic: xxhash64
    signatures, no seeds."""
    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 10 == 0)
    corpus_sig = _persisted_corpus_sig(spark, sf_dir)
    return DD.incremental_neardup_pairs(
        corpus_sig, batch, "doc_id", "text"
    ).orderBy("doc_a", "doc_b")


_FH_DIM = 64


@query(
    "x5_feature_hash_sparse",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS tok FROM documents
    ), hx AS (
      SELECT doc, md5(tok) AS h FROM tk
    ), b AS (
      SELECT doc,
             ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % {_FH_DIM} AS bucket,
             CASE WHEN (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM hx
    )
    SELECT doc, CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(s) AS BIGINT) AS weight
    FROM b GROUP BY doc, bucket HAVING SUM(s) != 0
    """,
)
def x5_feature_hash_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hash embedding, sparse form (hashing trick, Weinberger
    ICML'09): tokens hash to one of 64 signed buckets via portable md5
    hex-char arithmetic, a doc's representation is its per-bucket signed
    counts -- text becomes a vector with no vocabulary, no model, no
    Python. Exact bigint weights make the whole embedding SQL-oracle-able
    -- rare for an embedding pipeline. At 100 TB: one explode + one
    (doc, bucket) hash-agg with map-side combine; output is at most 64
    slim rows per doc."""
    from ..operators.hashembed import feature_hash_sparse

    d = load_table(spark, sf_dir, "documents")
    out = feature_hash_sparse(d, "doc_id", "text", dim=_FH_DIM)
    return out.select("doc", F.col("bucket").cast("bigint").alias("bucket"), "weight")


# Feature-hash dense embeddings as a DuckDB CTE block ending in
# v(vec_id, v) -- the same shape _duck_kmeans_ctes(include_v=False)
# trains over, shared by the hash-embed top-k and clusters oracles.
_DUCK_HASH_DENSE_V = f"""tk AS (
  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS tok FROM documents
), hx AS (
  SELECT doc, md5(tok) AS h FROM tk
), b AS (
  SELECT doc,
         ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)) % {_FH_DIM}
           AS bucket,
         CASE WHEN (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM hx
), w AS (
  SELECT doc, bucket, SUM(s) AS weight
  FROM b GROUP BY doc, bucket HAVING SUM(s) != 0
), ids AS (
  SELECT DISTINCT doc_id AS doc FROM documents
), grid AS (
  SELECT i.doc, g.k FROM ids i CROSS JOIN (SELECT unnest(range({_FH_DIM})) AS k) g
), v AS (
  SELECT g.doc AS vec_id,
         list(CAST(COALESCE(w.weight, 0) AS DOUBLE) ORDER BY g.k) AS v
  FROM grid g LEFT JOIN w ON w.doc = g.doc AND w.bucket = g.k
  GROUP BY g.doc
)"""

_HASH_EMBED_TOPK_ORACLE = f"""
WITH {_DUCK_HASH_DENSE_V},
q AS (
  SELECT v AS qv FROM v WHERE vec_id = 0
)
SELECT d.vec_id,
       CAST(CAST(ROUND({_duck_cos('d.v', 'qv')}, 4) AS DECIMAL(18,4)) AS DOUBLE)
         AS cos_sim
FROM v d CROSS JOIN q
ORDER BY cos_sim DESC, d.vec_id LIMIT 10
"""


@query("x3_hash_embed_topk", oracle=_HASH_EMBED_TOPK_ORACLE)
def x3_hash_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end text -> vector -> retrieval with zero external models:
    feature-hash every document into a dense 64-dim vector, then exact
    cosine top-10 against doc 0's vector -- the full similarity-search
    pipeline shape (embed -> index -> probe) running on in-engine
    embeddings. Deterministic: md5 buckets, exact integer weights, one
    single-row driver fetch for the probe (same discipline as
    x3_cosine_topk). Oracled (r7): md5 is engine-portable, so the whole
    embed + densify + cosine pipeline replays in DuckDB."""
    from ..operators.hashembed import feature_hash_embed

    d = load_table(spark, sf_dir, "documents")
    emb = feature_hash_embed(d, "doc_id", "text", dim=_FH_DIM).withColumnRenamed(
        "doc", "vec_id"
    )
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    if row is None:
        raise ValueError("probe doc_id=0 missing from feature-hash embeddings")
    return SIM.cosine_topk(emb, row[0], k=10)


def _corpus_prep_neardup_oracle() -> str:
    from .duckhash import corpus_prep_neardup_sql

    return corpus_prep_neardup_sql().replace("{stop_sql}", _STOP_SQL)


@query("x7_corpus_prep_neardup", oracle=_corpus_prep_neardup_oracle())
def x7_corpus_prep_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone corpus pipeline with NEAR-dup collapse: quality gates
    -> repetition gate -> language allowlist -> exact dedup ->
    MinHash-LSH candidates -> exact-Jaccard verification -> connected-
    component collapse (keep min id) -> deterministic md5 split ->
    per-(lang, split) stats. This is x7_corpus_prep_full upgraded from
    exact-only to fuzzy dedup -- the pipeline a 100 TB pretraining
    corpus actually runs. Collapse cost tracks duplicate density (banded
    candidates, pairwise verification), never n^2. Hash-matched (r8, was
    the last unverified x7 stage): the XXH64-in-SQL MinHash collapse
    replays over the gated survivors in one DuckDB statement
    (plans/duckhash.py::corpus_prep_neardup_sql)."""
    d = load_table(spark, sf_dir, "documents")
    rep = _rep_with_stop(d)  # one token pass: rep metrics + stopword count
    filtered = (
        d.join(rep, "doc_id")
        .filter(
            F.col("n_tokens").between(20, 1000)
            & (F.col("n_stop") * 50 >= F.col("n_tokens"))
            & (F.col("top_token_ppm") < 500000)
            & F.col("lang").isin("en", "de", "fr", "es")
        )
        .select("doc_id", "lang", "text", "n_tokens")
    )
    # exact dedup first: shrinks the LSH input and anchors keep_id
    exact = filtered.groupBy("lang", "text").agg(
        F.min("doc_id").alias("doc_id"), F.max("n_tokens").alias("n_tokens")
    )
    pairs = DD.verified_neardup_pairs(exact, "doc_id", "text")
    kept = DD.collapse_neardups(exact, pairs.select("doc_a", "doc_b"), "doc_id")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    return (
        kept.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang", "split")
    )


def _hash_embed_clusters_oracle() -> str:
    ctes, final_c = _duck_kmeans_ctes(8, 2, include_v=False)
    return f"""
WITH {_DUCK_HASH_DENSE_V},
{ctes},
assigned AS (
  SELECT vec_id, cid AS cluster_id FROM (
    SELECT a.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.v', 'c.cv')} DESC, c.cid) AS rn
    FROM v a CROSS JOIN {final_c} c
  ) WHERE rn = 1
)
SELECT CAST(s.cluster_id AS INTEGER) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT d.lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
       CAST(MIN(s.vec_id) AS BIGINT) AS first_doc
FROM assigned s JOIN documents d ON d.doc_id = s.vec_id
GROUP BY s.cluster_id
"""


@query("x3_hash_embed_clusters", oracle=_hash_embed_clusters_oracle())
def x3_hash_embed_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised corpus organization with zero external models:
    feature-hash each doc into a 64-dim vector, train a k=8 codebook with
    the deterministic distributed k-means (content-addressed init,
    decimal-exact means), assign every doc to its nearest centroid as a
    pure per-row projection (codebook is a plan literal -- no join, no
    shuffle), and report per-cluster corpus stats. The "what is in my
    100 TB corpus" topic census: one embed shuffle + k-means's bounded
    iterations + one stats agg. Oracled (r7): the hash-embed dense CTE
    feeds the k-means CTE chain, so the whole census replays in DuckDB."""
    from ..operators.hashembed import feature_hash_embed
    from ..operators.kmeans import kmeans_fit

    d = load_table(spark, sf_dir, "documents")
    emb = feature_hash_embed(d, "doc_id", "text", dim=_FH_DIM).withColumnRenamed(
        "doc", "vec_id"
    )
    emb = emb.localCheckpoint(eager=True)  # k-means iterates over it
    centroids = kmeans_fit(emb, k=8, iterations=2)
    assigned = SIM.ivf_assignments(emb, centroids)
    return (
        assigned.join(
            d.select(F.col("doc_id").alias("vec_id"), "lang", "source"), "vec_id"
        )
        .groupBy(F.col("cluster_id").alias("cluster"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
            F.min("vec_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("cluster")
    )


# target pretraining mixture: ppm share of the token budget per source
_MIX_TARGET_PPM = {"src0": 400_000, "src1": 300_000, "src2": 200_000, "src3": 60_000, "src4": 40_000}
_MIX_BUDGET_TOKENS = 20_000
_MIX_SQL = " UNION ALL ".join(
    f"SELECT '{s}' AS source, CAST({p} AS BIGINT) AS target_ppm"
    for s, p in sorted(_MIX_TARGET_PPM.items())
)


@query(
    "x8_token_budget_mixture",
    oracle=f"""
    WITH avail AS (
      SELECT source,
             CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS available_tokens
      FROM documents GROUP BY source
    ), tgt AS ({_MIX_SQL})
    SELECT t.source,
           COALESCE(a.available_tokens, 0) AS available_tokens,
           t.target_ppm,
           CAST({_MIX_BUDGET_TOKENS} * t.target_ppm // 1000000 AS BIGINT)
               AS required_tokens,
           CAST(LEAST(
             1000000,
             ({_MIX_BUDGET_TOKENS} * t.target_ppm // 1000000) * 1000000
               // GREATEST(COALESCE(a.available_tokens, 0), 1)
           ) AS BIGINT) AS keep_rate_ppm
    FROM tgt t LEFT JOIN avail a ON t.source = a.source
    """,
)
def x8_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mixture planner: given a token budget and target ppm
    shares per source, compute each source's required tokens and the
    deterministic keep rate (capped at 1.0) against what the corpus
    actually has -- the arithmetic a data team runs before
    x8_mixture_sample_summary executes the sampling. Exact integer floor
    division end to end. At 100 TB: one per-source token-count aggregate;
    the target table is a literal."""
    d = load_table(spark, sf_dir, "documents")
    avail = d.groupBy("source").agg(
        F.sum(TX.token_count(F.col("text"))).cast("bigint").alias("available_tokens")
    )
    tgt = spark.createDataFrame(
        sorted(_MIX_TARGET_PPM.items()), "source string, target_ppm bigint"
    )
    required = F.floor(F.lit(_MIX_BUDGET_TOKENS) * F.col("target_ppm") / 1_000_000).cast(
        "bigint"
    )
    return (
        tgt.join(avail, "source", "left")
        .select(
            "source",
            F.coalesce(F.col("available_tokens"), F.lit(0)).alias("available_tokens"),
            "target_ppm",
            required.alias("required_tokens"),
            F.least(
                F.lit(1_000_000),
                F.floor(
                    required
                    * 1_000_000
                    / F.greatest(F.coalesce(F.col("available_tokens"), F.lit(0)), F.lit(1))
                ),
            )
            .cast("bigint")
            .alias("keep_rate_ppm"),
        )
    )


@query(
    "x5_ngram_novelty",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(string_split(text, ' ')[i:i+2], ' ') AS shingle
      FROM documents,
           LATERAL (SELECT unnest(generate_series(
             1, GREATEST(LEN(string_split(text, ' ')) - 2, 0))) AS i)
    ), df AS (
      SELECT shingle, COUNT(*) AS n_docs FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE d.n_docs = 1) AS BIGINT) AS n_unique,
           CAST(COUNT(*) FILTER (WHERE d.n_docs = 1) * 1000000 // COUNT(*)
                AS BIGINT) AS novelty_ppm
    FROM sh s JOIN df d ON s.shingle = d.shingle
    GROUP BY s.doc_id
    """,
)
def x5_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle novelty per document: the fraction of a doc's distinct
    3-gram shingles that appear in NO other document -- high novelty =
    original content, low = boilerplate assembled from corpus-common
    phrases (the content-quality complement of near-dup detection).
    At 100 TB: shingle explode -> document-frequency hash-agg -> join
    back on shingle -> per-doc aggregate; every shuffled row is a
    (shingle-hash, id) pair, and the DF table can be digest-keyed so the
    join carries 8-byte hashes, not strings."""
    d = load_table(spark, sf_dir, "documents")
    # r11: shingling is per-row HOF work evaluated on BOTH plan branches
    # (the DF count and the join side); spread the single-split scan so
    # each evaluation parallelizes (no-op on multi-split inputs)
    sh = DD.shingles(
        spread_input(d.select("doc_id", "text")), "text", 3
    ).select("doc_id", "shingle")
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("n_docs"))
    return (
        sh.join(df_counts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.count(F.when(F.col("n_docs") == 1, 1)).cast("bigint").alias("n_unique"),
            F.floor(
                F.count(F.when(F.col("n_docs") == 1, 1))
                * 1_000_000
                / F.count("*")
            )
            .cast("bigint")
            .alias("novelty_ppm"),
        )
    )


_TRUNC_DIM = 16


@query(
    "x3_truncated_dim_recall",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv,
             CAST(embedding[1:{_TRUNC_DIM}] AS DOUBLE[]) AS qt
      FROM embeddings WHERE vec_id = {_PROBE_VEC_ID}
    ), full_top AS (
      SELECT vec_id FROM embeddings, q
      WHERE embedding IS NOT NULL
      ORDER BY list_dot_product(CAST(embedding AS DOUBLE[]), qv)
               / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                       CAST(embedding AS DOUBLE[]))) DESC,
               vec_id
      LIMIT 10
    ), trunc_top AS (
      SELECT vec_id FROM embeddings, q
      WHERE embedding IS NOT NULL
      ORDER BY list_dot_product(CAST(embedding[1:{_TRUNC_DIM}] AS DOUBLE[]), qt)
               / sqrt(list_dot_product(CAST(embedding[1:{_TRUNC_DIM}] AS DOUBLE[]),
                                       CAST(embedding[1:{_TRUNC_DIM}] AS DOUBLE[]))) DESC,
               vec_id
      LIMIT 10
    )
    SELECT CAST({_TRUNC_DIM} AS BIGINT) AS trunc_dim,
           CAST(10 AS BIGINT) AS k,
           CAST((SELECT COUNT(*) FROM full_top f
                 JOIN trunc_top t ON f.vec_id = t.vec_id) AS BIGINT) AS hits,
           CAST((SELECT COUNT(*) FROM full_top f
                 JOIN trunc_top t ON f.vec_id = t.vec_id) * 1000000 // 10
                AS BIGINT) AS recall_ppm
    """,
)
def x3_truncated_dim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncated-dimension retrieval eval: how much of
    the exact top-10 survives when cosine runs on only the first 16 of 64
    dimensions -- the operating-point measurement behind dimension-
    truncated ANN (coarse search on a prefix, rerank on the full vector;
    prefix scan cost is dim/4). Both rankings order by (cos desc, vec_id)
    so ties resolve identically; the dot products are sequential
    left-to-right folds, bit-identical across engines. At 100 TB each
    ranking is one scan + TakeOrderedAndProject; the overlap join is 10x10
    rows."""
    from ..functions.vectors import dot

    emb = load_table(spark, sf_dir, "embeddings")
    q = _probe_vector(spark, sf_dir)

    def topk(vec_col, probe):
        # Mirror the oracle's expression EXACTLY: dot(vec, q)/sqrt(dot(vec,
        # vec)) -- no division by the constant probe norm.  Dividing by it is
        # rank-equivalent in exact arithmetic but not bit-identical in
        # float64, and ULP-near scores could flip top-10 membership.
        probe_arr = F.array(*[F.lit(float(x)) for x in probe])
        v = vec_col.cast("array<double>")
        return (
            emb.select("vec_id", (dot(v, probe_arr) / F.sqrt(dot(v, v))).alias("c"))
            .orderBy(F.col("c").desc(), "vec_id")
            .limit(10)
            .select("vec_id")
        )
    full_top = topk(F.col("embedding"), q)
    trunc_top = topk(F.slice(F.col("embedding"), 1, _TRUNC_DIM), q[:_TRUNC_DIM])
    hits = full_top.join(trunc_top, "vec_id").count()
    return spark.createDataFrame(
        [(_TRUNC_DIM, 10, hits, hits * 1_000_000 // 10)],
        "trunc_dim bigint, k bigint, hits bigint, recall_ppm bigint",
    )


@query(
    "x6_json_key_census",
    oracle="""
    WITH k AS (
      SELECT event_type, unnest(json_keys(props)) AS key FROM events
    )
    SELECT event_type, key,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM k GROUP BY event_type, key
    """,
)
def x6_json_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema discovery: which JSON keys actually occur in
    the props payload, per event type, with occurrence counts -- the
    census a pipeline runs before hardening a schema (keys that appear in
    0.01% of rows get a rescue column, not a typed one). Spark side parses
    once to a map and explodes the keys; one hash-agg, pure JVM."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return (
        ev.select("event_type", F.explode(F.map_keys(m)).alias("key"))
        .groupBy("event_type", "key")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )


def _semantic_dedup_oracle() -> str:
    ctes, final_c = _duck_kmeans_ctes(32, 3)
    return f"""
WITH RECURSIVE {ctes},
asg AS (
  SELECT vec_id, u, cid AS cluster_id FROM (
    SELECT a.vec_id,
           list_transform(a.v, x -> x / sqrt(list_dot_product(a.v, a.v))) AS u,
           c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.v', 'c.cv')} DESC, c.cid) AS rn
    FROM v a CROSS JOIN {final_c} c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE CAST(FLOOR(ROUND(list_dot_product(a.u, b.u), 4) * 10000) AS BIGINT)
        >= 9500
),
edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(n, r) AS (
  SELECT vec_id, vec_id FROM v
  UNION
  SELECT reach.n, e.t FROM reach JOIN edges e ON reach.r = e.s
),
labels AS (SELECT n AS vec_id, MIN(r) AS root FROM reach GROUP BY n)
SELECT e.vec_id FROM embeddings e LEFT JOIN labels l ON e.vec_id = l.vec_id
WHERE l.vec_id IS NULL OR l.root = l.vec_id
"""


@query("x3_semantic_dedup", oracle=_semantic_dedup_oracle())
def x3_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embedding corpus: cluster
    the space, score cosine only within clusters, collapse connected
    near-dup groups keeping the minimum id. Returns the surviving vector
    ids -- the corpus filter a pretraining pipeline applies after
    exact/fuzzy text dedup to remove SEMANTIC duplicates (same content,
    different words). Deterministic: content-addressed init, decimal
    centroid sums, fixed-point scores. Oracled (r7): the k-means CTE
    chain + within-cluster fixed-point pairs + a RECURSIVE transitive
    closure (min reachable id per component) replay the collapse in SQL;
    the fixture's near-orthogonal embeddings produce zero pairs at 0.95,
    and the planted-duplicate tests exercise the collapsing regime."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        SIM.semantic_dedup(emb, k=32, iterations=3, threshold=0.95)
        .select("vec_id")
        .orderBy("vec_id")
    )


@query(
    "x8_training_order",
    oracle="""
    WITH b AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bkt
      FROM documents
    ), r AS (
      SELECT doc_id, bkt,
             ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY h, doc_id) AS rk
      FROM b
    ), off AS (
      SELECT bkt,
             SUM(n) OVER (ORDER BY bkt
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off
      FROM (SELECT bkt, COUNT(*) AS n FROM b GROUP BY bkt)
    )
    SELECT r.doc_id, CAST(r.bkt AS BIGINT) AS bucket,
           CAST(COALESCE(off.off, 0) + r.rk AS BIGINT) AS position
    FROM r JOIN off ON r.bkt = off.bkt
    """,
)
def x8_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global sort:
    every document gets a stable pseudo-random position (reproducible
    epoch-0 data order, same under re-runs and re-partitioning). Two-phase:
    md5 prefix -> 256 buckets (parallel per-bucket row_number windows),
    then position = bucket offset + within-bucket rank, where offsets come
    from a 256-row running-sum broadcast back over the rows. A naive
    ROW_NUMBER() OVER (ORDER BY md5) funnels 100 TB through ONE task; this
    plan's only global structure is the 256-row offset table."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hexv = "0123456789abcdef"
    h = F.md5(F.col("doc_id").cast("string"))
    bkt = (
        (F.instr(F.lit(hexv), F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(F.lit(hexv), F.substring(h, 2, 1)) - 1)
    )
    b = docs.select("doc_id", h.alias("h"), bkt.alias("bkt"))
    w = Window.partitionBy("bkt").orderBy("h", "doc_id")
    r = b.select("doc_id", "bkt", F.row_number().over(w).alias("rk"))
    counts = b.groupBy("bkt").agg(F.count("*").alias("n"))
    woff = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    off = counts.select(
        F.col("bkt").alias("obkt"), F.sum("n").over(woff).alias("off")
    )
    return (
        r.join(F.broadcast(off), r.bkt == off.obkt)
        .select(
            "doc_id",
            F.col("bkt").cast("bigint").alias("bucket"),
            (F.coalesce(F.col("off"), F.lit(0)) + F.col("rk"))
            .cast("bigint")
            .alias("position"),
        )
    )


_LOGREG_ITERS = 40
_LOGREG_LR = 4.0


def _duck_logreg_sql(iterations: int = _LOGREG_ITERS, lr: float = _LOGREG_LR) -> str:
    """Replay operators/logreg.logreg_fit(link="hard") as one DuckDB
    statement: the hard-sigmoid link is built only from exactly-rounded
    IEEE ops (*, +, /, min/max), the per-row gradient terms are cast
    double->DECIMAL(30,12) through the VARCHAR round-trip (the pinned
    portable route, see _duck_kmeans_ctes), their SUM is exact and
    associative, and the weight update w - lr*(g/n) repeats the trainer's
    driver-side float math step for step. Each iteration is an (r, g, w)
    CTE triple; the final SELECT replays logreg_score + the per-source
    agreement rollup."""
    stop = _STOP_SQL
    teacher = f"""FLOOR(
      (0.5 * LEAST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 200.0, 1.0)
       + 0.5 * LEAST(
           CAST(LEN(list_filter(string_split(text, ' '), t -> t IN {stop})) AS DOUBLE)
           / GREATEST(CAST(LEN(string_split(text, ' ')) AS DOUBLE) * 0.05, 1.0),
           1.0)) * 1000000.0) >= 600000"""
    z = "(((w0 * f0 + w1 * f1) + w2 * f2) + w3 * 1.0)"
    # CASE chain, not GREATEST/LEAST: NULL-propagates like the Spark
    # _hard_sigmoid (a NULL z must yield a NULL score, not 1.0). The
    # pre-clamp value c is computed ONCE in a nested subquery -- inlining
    # it three times into the CASE tripled the polynomial work per row
    # and the sf0.1 oracle time
    score = "CASE WHEN c < 0.0 THEN 0.0 WHEN c > 1.0 THEN 1.0 ELSE c END"
    c_from_feats = (
        f"SELECT f0, f1, f2, y, 0.5 + 0.25 * {z} AS c "
        f"FROM feats CROSS JOIN w{{t}}_"
    )
    dec = "DECIMAL(30,12)"
    parts = [
        # MATERIALIZED: feats is referenced once per iteration; inlined it
        # re-tokenizes the corpus AND re-opens the parquet 40x (EMFILE)
        # y: NOTE (ADVICE r8) -- NULL text does NOT yield a NULL teacher:
        # LEAST/GREATEST *skip* NULL arguments in BOTH engines (Spark
        # least/greatest, DuckDB LEAST -- verified on 1.0), so
        # quality_score_ppm(NULL) collapses to 1000000 and teacher is 1.
        # The two-branch CASE is kept only so that if a future edit makes
        # the teacher expression genuinely NULL-able (e.g. NULL-strict
        # clamps), y degrades to NULL on both sides instead of silently
        # training such rows as negatives.
        f"""feats AS MATERIALIZED (
  SELECT source,
         CAST(LEN(string_split(text, ' ')) AS DOUBLE) / 64.0 - 1.0 AS f0,
         CAST(LEN(list_filter(string_split(text, ' '), t -> t IN {stop})) AS DOUBLE)
           / CAST(LEN(string_split(text, ' ')) AS DOUBLE) * 5.0 - 1.0 AS f1,
         CAST(n_chars AS DOUBLE) / 1000.0 - 0.5 AS f2,
         CASE WHEN {teacher} THEN 1.0 WHEN NOT ({teacher}) THEN 0.0 END AS y
  FROM documents)""",
        "nn AS (SELECT COUNT(*) AS n FROM feats)",
        "w0_ AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)",
    ]
    for t in range(iterations):
        parts.append(f"""r{t} AS (
  SELECT f0, f1, f2, {score} - y AS resid
  FROM ({c_from_feats.format(t=t)}))""")
        sums = ", ".join(
            f"SUM(CAST(CAST(resid * {fj} AS VARCHAR) AS {dec})) AS g{j}"
            for j, fj in enumerate(["f0", "f1", "f2", "1.0"])
        )
        parts.append(f"g{t} AS (SELECT {sums} FROM r{t})")
        upd = ", ".join(
            f"w{j} - {lr!r} * (CAST(CAST(g{j} AS VARCHAR) AS DOUBLE) / n) AS w{j}"
            for j in range(4)
        )
        # MATERIALIZED: w{t}_ is referenced twice (r{t} and w{t+1}_);
        # plain CTEs inline by substitution, doubling the expression tree
        # per iteration -- 2^iterations planner blowup
        parts.append(
            f"w{t + 1}_ AS MATERIALIZED "
            f"(SELECT {upd} FROM w{t}_ CROSS JOIN g{t} CROSS JOIN nn)"
        )
    return f"""
WITH {','.join(parts)},
scored AS (
  SELECT source, y, {score} AS score FROM (
    SELECT source, y, 0.5 + 0.25 * {z} AS c
    FROM feats CROSS JOIN w{iterations}_
  )
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_teacher_pos,
       CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_model_pos,
       CAST(SUM(CASE WHEN (score >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree
FROM scored GROUP BY source
"""


@query("x5_quality_classifier", oracle=_duck_logreg_sql())
def x5_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable quality gate: distill the heuristic quality score
    (`functions/text.py::quality_score_ppm`, a nonlinear least/greatest
    composite) into a linear classifier over cheap per-doc features
    (scaled token count, stopword ratio, scaled length) trained IN the
    engine (`operators/logreg.py`: decimal gradient sums, zero RNG).
    The real-world pattern: an expensive labeler (LLM judge, human
    ratings) labels once; a linear model over cheap features applies the
    gate at 100 TB for the cost of one codegen'd scan. Output: per-source
    teacher/model agreement counts.

    Oracled since r8 (was rows-only): with the exactly-rounded
    hard-sigmoid link (link="hard") and transcendental-free features the
    whole 40-iteration GD trajectory is pure IEEE + decimal arithmetic,
    so `_duck_logreg_sql` unrolls it into a DuckDB CTE chain that
    hash-matches end to end -- the same conversion `_duck_kmeans_ctes`
    made for Lloyd iterations."""
    from ..operators.logreg import logreg_fit, logreg_score

    d = load_table(spark, sf_dir, "documents")
    # features are centered/scaled with FIXED literal constants (never
    # data-derived statistics) so training stays deterministic and the
    # fitted model applies unchanged to new corpus batches; every feature
    # is transcendental-free so each per-row value is a correctly-rounded
    # IEEE expression any engine reproduces bit-exactly
    n_tok = TX.token_count(F.col("text")).cast("double")
    n_stop = TX.marker_score(F.col("text"), TX.STOPWORDS).cast("double")
    feats = d.select(
        "doc_id",
        "source",
        (n_tok / F.lit(64.0) - F.lit(1.0)).alias("f_tok"),
        (n_stop / n_tok * F.lit(5.0) - F.lit(1.0)).alias("f_stop"),
        (F.col("n_chars").cast("double") / F.lit(1000.0) - F.lit(0.5)).alias("f_len"),
        (TX.quality_score_ppm(F.col("text")) >= F.lit(600000))
        .cast("int")
        .alias("teacher"),
    )
    w = logreg_fit(
        feats,
        ["f_tok", "f_stop", "f_len"],
        "teacher",
        iterations=_LOGREG_ITERS,
        lr=_LOGREG_LR,
        link="hard",
    )
    scored = logreg_score(feats, w, ["f_tok", "f_stop", "f_len"], link="hard")
    model_pos = (F.col("score") >= F.lit(0.5)).cast("int")
    return (
        scored.withColumn("model", model_pos)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("teacher").cast("bigint").alias("n_teacher_pos"),
            F.sum("model").cast("bigint").alias("n_model_pos"),
            F.sum((F.col("teacher") == F.col("model")).cast("int"))
            .cast("bigint")
            .alias("n_agree"),
        )
    )


@query(
    "x3_int8_quantize",
    oracle="""
    WITH x AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             GREATEST(list_max(list_transform(v, e -> abs(e))) / 127.0,
                      1e-30) AS scale
      FROM x
    )
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           CAST(list_max(list_transform(v,
                e -> abs(floor(e / scale + 0.5)))) AS BIGINT) AS max_abs_code,
           CAST(FLOOR(
             list_reduce(list_transform(v,
               e -> (e - floor(e / scale + 0.5) * scale)
                  * (e - floor(e / scale + 0.5) * scale)), (a, b) -> a + b)
             / GREATEST(list_reduce(list_transform(v, e -> e * e),
                                    (a, b) -> a + b), 1e-30)
             * 1000000.0) AS BIGINT) AS err_ppm
    FROM s
    """,
)
def x3_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding table: per-vector
    scale = max|x|/127, codes = floor(x/scale + 0.5) in [-127, 127],
    reported as per-vector reconstruction-error ppm -- the 4x storage
    compression an embedding store applies before ANN indexing at 100 TB
    (codes + one float scale per vector replace float32 dims). Pure
    higher-order-function expressions, zero shuffle, zero Python; floor-
    based rounding (round() half-even vs half-up differs across engines,
    floor of identical IEEE operands never does). The scale is
    materialized as its own column first: referencing it inside the
    transform lambda would re-evaluate the O(dim) array_max per ELEMENT
    (expressions in functions/vectors.py::int8_quantize_stats,
    property-tested for code and error bounds)."""
    from ..functions.vectors import int8_quantize_stats

    return int8_quantize_stats(load_table(spark, sf_dir, "embeddings"))


@query(
    "x8_rate_cap_user_hour",
    oracle="""
    SELECT event_id, user_id, rk FROM (
      SELECT event_id, user_id,
             ROW_NUMBER() OVER (
               -- CASE wrap: DuckDB 1.0 mis-infers date_trunc as
               -- non-nullable and hash-partitions its NULLs by garbage
               -- (see plans/relational.py window_hourly_delta)
               PARTITION BY user_id,
                            CASE WHEN ts IS NULL THEN NULL
                                 ELSE date_trunc('hour', ts) END
               ORDER BY ts, event_id) AS rk
      FROM events) WHERE rk <= 5
    """,
)
def x8_rate_cap_user_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frequency capping: keep at most k=5 events per (user, hour),
    earliest-first -- the politeness/anti-flood cap a crawl or event
    pipeline applies per origin per time bucket (distinct from
    x8_source_cap's global per-domain cap: the key here is
    (entity, time bucket), so hot entities are bounded per WINDOW, not
    overall). The composite key is high-cardinality, so the ranking
    window parallelizes; ties cannot exist ((ts, event_id) is unique)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", F.date_trunc("hour", F.col("ts"))).orderBy(
        "ts", "event_id"
    )
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@query(
    "x5_bigram_lift",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), uni AS (
      SELECT UNNEST(t) AS w FROM toks
    ), ucnt AS (
      SELECT w, COUNT(*) AS c FROM uni GROUP BY w
    ), tot AS (
      SELECT COUNT(*) AS n FROM uni
    ), bi AS (
      SELECT UNNEST(list_transform(generate_series(1, LEN(t) - 1),
                    i -> t[i] || ' ' || t[i+1])) AS bg
      FROM toks
    ), bcnt AS (
      SELECT bg, COUNT(*) AS c12 FROM bi GROUP BY bg
    )
    SELECT bg, c12,
           CAST(FLOOR(CAST(c12 AS DECIMAL(38,0)) * tot.n * 1000000
                      / (CAST(u1.c AS DECIMAL(38,0)) * u2.c)) AS BIGINT)
             AS lift_ppm
    FROM bcnt, tot
    JOIN ucnt u1 ON u1.w = string_split(bg, ' ')[1]
    JOIN ucnt u2 ON u2.w = string_split(bg, ' ')[2]
    ORDER BY c12 DESC, bg LIMIT 20
    """,
)
def x5_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: lift (observed/expected co-occurrence ratio) of
    the corpus's top-20 bigrams -- the PMI-style association signal that
    finds multi-word expressions for tokenizer vocab construction, kept
    in EXACT integer/decimal arithmetic (lift_ppm = c12*N*1e6/(c1*c2))
    instead of a log: libm log ulps differ across engines, integer ratios
    never do. Scale: two hash aggregates over exploded tokens (shuffle
    carries partial counts), unigram counts re-joined only against the 20
    surviving bigrams; the total-token count broadcasts as a 1-row side."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("t")
    )
    uni = docs.select(F.explode("t").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count("*").alias("c"))
    tot = uni.select(F.count("*").alias("n"))
    bi = docs.select(
        F.explode(
            F.transform(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("t"), i + 2)),
            )
        ).alias("bg")
    )
    top = (
        bi.groupBy("bg")
        .agg(F.count("*").alias("c12"))
        .orderBy(F.desc("c12"), "bg")
        .limit(20)
    )
    u1 = ucnt.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = ucnt.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        top.withColumn("w1", F.split(F.col("bg"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("bg"), " ").getItem(1))
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            "c12",
            F.floor(
                F.col("c12").cast("decimal(38,0)") * F.col("n") * F.lit(1000000)
                / (F.col("c1").cast("decimal(38,0)") * F.col("c2"))
            )
            .cast("bigint")
            .alias("lift_ppm"),
        )
    )


def _persisted_ivf_index(spark: SparkSession, sf_dir: str) -> str:
    """The embeddings corpus AS A DISK IVF INDEX (partitioned by
    cluster_id, codebook stored alongside): built once per fixture and
    probed thereafter -- the FAISS-IVF-on-object-store posture, where the
    index is maintained on disk and a probe's parquet scan is partition-
    pruned to n_probe lists before any compute. Cache keyed by the
    fixture file's identity; the build is deterministic (fixed codebook =
    first 8 vectors by id, deterministic argmax assignment), so cache and
    recompute are equivalent."""
    import os

    def build(staging: str) -> None:
        emb = load_table(spark, sf_dir, "embeddings")
        cents = [
            list(r[0])
            for r in emb.filter(F.col("vec_id") < 8)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        ]
        # the index symlink is RELATIVE (atomic.py _flip), so it survives
        # the staging dir's rename into the cache slot
        SIM.build_ivf_index(emb, cents, os.path.join(staging, "index"))

    return os.path.join(
        _fixture_cache(sf_dir, "embeddings", "ivf_index8", build), "index"
    )


@query("x3_ivf_indexed_topk", oracle=_IVF_FIXED_ORACLE)
def x3_ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k against the PERSISTED disk IVF index: rank the stored
    codebook driver-side, then scan ONLY the ``cluster_id IN probe``
    partition directories (partition pruning shrinks the read to
    n_probe/n_lists of the index bytes before any compute -- the shape
    that makes a 100 TB ANN probe an O(corpus/n_lists) operation).
    Results identical to the inline x3_ivf_topk for the same codebook
    (tests/test_ivf_index.py asserts equality and the pruned scan), so
    the two share one oracle (r7)."""
    idx = _persisted_ivf_index(spark, sf_dir)
    return SIM.ivf_topk_indexed(
        spark, idx, _probe_vector(spark, sf_dir), k=10, n_probe=3
    )


def _persisted_semantic_index(spark: SparkSession, sf_dir: str) -> str:
    """Corpus-only (vec_id % 10 != 0) disk IVF index for the incremental
    semantic-dedup probe -- the embedding analog of _persisted_corpus_sig:
    persisted state built once per fixture, probed per batch."""
    import os

    def build(staging: str) -> None:
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % 10 != 0
        )
        cents = [
            list(r[0])
            for r in emb.filter(F.col("vec_id") < 9)
            .orderBy("vec_id")
            .select("embedding")
            .collect()
        ][:8]
        SIM.build_ivf_index(emb, cents, os.path.join(staging, "index"))

    return os.path.join(
        _fixture_cache(sf_dir, "embeddings", "semantic_index8", build), "index"
    )


_SEM_INC_ORACLE = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE embedding IS NOT NULL
), cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS cv
  FROM v WHERE vec_id % 10 != 0 AND vec_id < 9
), asg AS (
  SELECT vec_id, is_batch, u, cid AS cluster_id FROM (
    SELECT a.vec_id, a.vec_id % 10 = 0 AS is_batch,
           list_transform(a.v, x -> x / sqrt(list_dot_product(a.v, a.v))) AS u,
           c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.v', 'c.cv')} DESC, c.cid) AS rn
    FROM v a CROSS JOIN cents c
  ) WHERE rn = 1
), pr AS (
  SELECT b.vec_id AS ia, c.vec_id AS ib, b.cluster_id, 'corpus' AS origin,
         CAST(FLOOR(ROUND(list_dot_product(b.u, c.u), 4) * 10000) AS BIGINT)
           AS cos_fp
  FROM asg b JOIN asg c ON b.cluster_id = c.cluster_id
  WHERE b.is_batch AND NOT c.is_batch
  UNION ALL
  SELECT b.vec_id, c.vec_id, b.cluster_id, 'batch',
         CAST(FLOOR(ROUND(list_dot_product(b.u, c.u), 4) * 10000) AS BIGINT)
  FROM asg b JOIN asg c ON b.cluster_id = c.cluster_id AND b.vec_id < c.vec_id
  WHERE b.is_batch AND c.is_batch
)
SELECT LEAST(ia, ib) AS id_a, GREATEST(ia, ib) AS id_b, cluster_id, origin, cos_fp
FROM pr WHERE cos_fp >= 3500
"""


@query("x3_semantic_dedup_incremental", oracle=_SEM_INC_ORACLE)
def x3_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup: treat vec_id % 10 == 0 as today's
    arriving embeddings and probe the corpus's PERSISTED disk IVF index --
    the batch assigns to the STORED codebook, the corpus read partition-
    prunes to the batch's clusters, and only batch-touching pairs are
    scored. O(batch) like x2_incremental_neardup, at the semantic level;
    equals the full-recompute restriction by construction
    (tests/test_ivf_index.py). Oracled (r7): the stored codebook is the
    fixed first-8 corpus vectors, so assignment + unit-vector dots +
    fixed-point scores replay exactly in DuckDB. Threshold 0.35 is
    fixture-calibrated: the synthetic embeddings are near-orthogonal
    (max pairwise cosine ~0.51, p99.9 ~0.38), so a production 0.9+ cut
    matches nothing here; the planted-duplicate tests exercise the
    high-threshold regime."""
    emb = load_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    idx = _persisted_semantic_index(spark, sf_dir)
    return (
        SIM.semantic_dedup_incremental(spark, idx, batch, threshold=0.35)
        .orderBy("id_a", "id_b")
    )


def _x7_semantic_oracle() -> str:
    ctes, final_c = _duck_kmeans_ctes(16, 2, include_v=False)
    return f"""
WITH RECURSIVE filtered AS (
  SELECT doc_id, lang, text,
         LEN(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE LEN(string_split(text, ' ')) BETWEEN 20 AND 1000
    AND LEN(list_filter(string_split(text, ' '), t -> t IN {_STOP_SQL})) * 50
        >= LEN(string_split(text, ' '))
    AND lang IN ('en', 'de', 'fr', 'es')
),
deduped AS (
  SELECT lang, text, MIN(doc_id) AS doc_id, MAX(n_tokens) AS n_tokens
  FROM filtered GROUP BY lang, text
),
v AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e
  WHERE e.vec_id IN (SELECT doc_id FROM deduped)
    AND e.embedding IS NOT NULL
),
{ctes},
asg AS (
  SELECT vec_id, u, cid AS cluster_id FROM (
    SELECT a.vec_id,
           list_transform(a.v, x -> x / sqrt(list_dot_product(a.v, a.v))) AS u,
           c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_duck_cos('a.v', 'c.cv')} DESC, c.cid) AS rn
    FROM v a CROSS JOIN {final_c} c
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM asg a JOIN asg b
    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE CAST(FLOOR(ROUND(list_dot_product(a.u, b.u), 4) * 10000) AS BIGINT)
        >= 3500
),
edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs UNION SELECT id_b, id_a FROM pairs
),
reach(n, r) AS (
  SELECT vec_id, vec_id FROM v
  UNION
  SELECT reach.n, e.t FROM reach JOIN edges e ON reach.r = e.s
),
kept AS (
  -- Survival rule mirroring the Spark pipeline exactly (r10, refined by
  -- the sf0.1 sweep): a doc must HAVE an embeddings row (the pipeline's
  -- left_semi -- at sf0.1 only 2000 of 5000 docs are embedded, the rest
  -- drop out before semantic dedup), but a row whose VECTOR is NULL
  -- survives dedup untouched (the NULL-vector policy keeps it out of
  -- the labels, and absence from every pair means it is never a loser).
  SELECT d.lang, d.n_tokens, d.doc_id
  FROM deduped d
  JOIN embeddings e ON e.vec_id = d.doc_id
  LEFT JOIN (SELECT n AS vec_id, MIN(r) AS root FROM reach GROUP BY n) l
    ON d.doc_id = l.vec_id
  WHERE l.vec_id IS NULL OR l.root = l.vec_id
),
split_assigned AS (
  SELECT lang, n_tokens, doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
              ELSE 'test' END AS split
  FROM kept
)
SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM split_assigned GROUP BY lang, split
"""


@query("x7_corpus_prep_semantic", oracle=_x7_semantic_oracle())
def x7_corpus_prep_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone corpus pipeline with SEMANTIC dedup: quality gates ->
    language allowlist -> exact dedup -> SemDeDup over the survivors'
    embeddings (k-means partition, within-cluster cosine, component
    collapse keeping min id) -> deterministic md5 split -> per-(lang,
    split) stats. This is x7_corpus_prep_neardup with the fuzzy-TEXT
    stage swapped for embedding-space dedup -- the variant that also
    removes paraphrases sharing no n-grams. Oracled (r7): the entire
    capstone -- including the trained k-means stage and the component
    collapse (RECURSIVE closure) -- replays in one DuckDB statement.
    Threshold 0.35 is fixture-calibrated (synthetic embeddings are
    near-orthogonal); the planted tests cover the production 0.9+
    regime."""
    d = load_table(spark, sf_dir, "documents")
    n_stop = TX.marker_score(F.col("text"), TX.STOPWORDS)
    filtered = (
        d.withColumn("n_tokens", TX.token_count(F.col("text")))
        .withColumn("n_stop", n_stop)
        .filter(
            F.col("n_tokens").between(20, 1000)
            & (F.col("n_stop") * 50 >= F.col("n_tokens"))
            & F.col("lang").isin("en", "de", "fr", "es")
        )
        .select("doc_id", "lang", "text", "n_tokens")
    )
    exact = filtered.groupBy("lang", "text").agg(
        F.min("doc_id").alias("doc_id"), F.max("n_tokens").alias("n_tokens")
    )
    emb = load_table(spark, sf_dir, "embeddings").join(
        exact.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    emb = emb.localCheckpoint(eager=True)  # k-means iterates over it
    kept_vecs = SIM.semantic_dedup(
        emb, k=16, iterations=2, threshold=0.35
    ).select(F.col("vec_id").alias("doc_id"))
    # survivor ids are O(corpus) -- a plain semi join (AQE may still
    # broadcast at small scale), never a broadcast hint
    kept = exact.join(kept_vecs, "doc_id", "left_semi")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(b < "cd", "train").when(b < "e6", "val").otherwise("test")
    return (
        kept.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang", "split")
    )


_UPSAMPLE_W = {"src0": (2, 128), "src1": (0, 128), "src2": (3, 0)}  # (whole, frac/256)


@query(
    "x8_epoch_upsample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
                         WHEN 'src2' THEN 3 ELSE 1 END AS whole,
             CASE source WHEN 'src0' THEN 128 WHEN 'src1' THEN 128
                         WHEN 'src2' THEN 0 ELSE 0 END AS frac256,
             (strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
               AS bucket
      FROM documents
    ), c AS (
      SELECT source,
             whole + CASE WHEN bucket < frac256 THEN 1 ELSE 0 END AS n_copies
      FROM w
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_copies) AS BIGINT) AS total_copies,
           CAST(SUM(CASE WHEN n_copies = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM c GROUP BY source
    """,
)
def x8_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch upsampling / source re-weighting: a mixing recipe assigns each
    source an epoch weight (src0 2.5x, src1 0.5x, src2 3x, rest 1x) and
    every document is replicated floor(w) times plus one more for a
    deterministic md5-bucket fraction of documents -- the standard
    pretraining mixing op for weights ABOVE 1 (complementing
    x8_mixture_sample_summary's keep-rates below 1). The engine-side
    operator is sequence+explode per doc (row multiplication, no shuffle);
    this census reports per-source doc counts, total emitted copies, and
    drops. Deterministic: the fractional copy keys on md5(doc_id) hex
    chars 3-4, stable under re-runs and corpus growth."""
    d = load_table(spark, sf_dir, "documents")
    whole = F.lit(1)
    frac = F.lit(0)
    for src, (wh, fr) in _UPSAMPLE_W.items():
        whole = F.when(F.col("source") == src, F.lit(wh)).otherwise(whole)
        frac = F.when(F.col("source") == src, F.lit(fr)).otherwise(frac)
    hexv = "0123456789abcdef"
    h = F.md5(F.col("doc_id").cast("string"))
    bucket = (
        (F.instr(F.lit(hexv), F.substring(h, 3, 1)) - 1) * 16
        + (F.instr(F.lit(hexv), F.substring(h, 4, 1)) - 1)
    )
    n_copies = whole + F.when(bucket < frac, 1).otherwise(0)
    # the real operator: one output row per copy, engine-side explode.
    # Spark's sequence(1, 0) DESCENDS to [1, 0] rather than being empty,
    # so 0-copy docs must map to an explicit empty array or they would
    # emit two phantom copies each. The census counts the ACTUAL exploded
    # rows, so the explode itself is what the oracle verifies.
    copy_seq = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    copies = d.select("source", F.explode(copy_seq).alias("copy"))
    emitted = copies.groupBy("source").agg(
        F.count("*").cast("bigint").alias("total_copies")
    )
    per_doc = d.select("source", n_copies.alias("n_copies"))
    stats = per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("n_copies") == 0).cast("int"))
        .cast("bigint")
        .alias("n_dropped"),
    )
    # eqNullSafe (r10 NULL tier): source is a nullable grouping key -- a
    # plain-equality join dropped the NULL-source group's emitted count
    # and reported 0 copies for rows that were in fact replicated.
    return (
        stats.join(
            emitted.withColumnRenamed("source", "__e_src"),
            stats["source"].eqNullSafe(F.col("__e_src")),
            "left",
        )
        .select(
            "source",
            "n_docs",
            F.coalesce("total_copies", F.lit(0)).cast("bigint").alias("total_copies"),
            "n_dropped",
        )
    )


@query(
    "x5_vocab_growth",
    oracle="""
    WITH tk AS (
      SELECT (strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) // 2
               AS decile,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ), first_seen AS (
      SELECT tok, MIN(decile) AS d FROM tk GROUP BY tok
    ), per AS (
      SELECT d, COUNT(*) AS n_new FROM first_seen GROUP BY d
    )
    SELECT CAST(d AS INTEGER) AS decile,
           CAST(n_new AS BIGINT) AS n_new_tokens,
           CAST(SUM(n_new) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS vocab_size
    FROM per
    """,
)
def x5_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: the corpus splits into 8
    deterministic md5 slices and each token attributes to the slice where
    it FIRST appears, giving new-token counts and cumulative vocabulary
    per slice -- the curve that says whether more data still buys new
    vocabulary (tokenizer sizing / dedup health). One explode + one
    min-aggregate; the cumulative sum windows over 8 rows, so nothing
    global touches row-scale data. Stable under re-runs and growth: slice
    assignment is content-addressed, not positional."""
    from pyspark.sql import Window

    hexv = "0123456789abcdef"
    decile = F.floor(
        (F.instr(F.lit(hexv), F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)) - 1)
        / F.lit(2)
    ).cast("int")
    tk = (
        load_table(spark, sf_dir, "documents")
        .select(decile.alias("decile"), F.explode(F.split("text", " ")).alias("tok"))
    )
    first_seen = tk.groupBy("tok").agg(F.min("decile").alias("d"))
    per = first_seen.groupBy("d").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per.select(
        F.col("d").cast("int").alias("decile"),
        F.col("n_new").cast("bigint").alias("n_new_tokens"),
        F.sum("n_new").over(w).cast("bigint").alias("vocab_size"),
    )


# NFD-decomposed suffixes (combining accents) cycled by doc_id so the NFC
# pass has real composition work; the empty suffix keeps a no-op class.
_NFD_SUFFIXES = [" café menu", " über fast", " mañana plan", ""]
_NFD_SQL_LIST = "[" + ", ".join(
    "'" + s.replace("'", "''") + "'" for s in _NFD_SUFFIXES
) + "]"


@query(
    "x5_unicode_nfc",
    oracle=f"""
    WITH dec AS (
      SELECT doc_id,
             text || ({_NFD_SQL_LIST})[CAST(doc_id % 4 AS INTEGER) + 1] AS s
      FROM documents)
    SELECT doc_id,
           CAST(length(s) AS INTEGER) AS raw_chars,
           CAST(length(nfc_normalize(s)) AS INTEGER) AS nfc_chars,
           nfc_normalize(s) <> s AS changed,
           md5(nfc_normalize(s)) AS nfc_md5
    FROM dec
    """,
)
def x5_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Unicode NFC normalization, cross-library verified: each doc
    is decorated with an NFD-decomposed suffix (combining acute/diaeresis/
    tilde), the engine normalizes with Python's unicodedata (UAX #15)
    over Arrow mapInPandas, and the oracle re-normalizes independently
    with DuckDB's nfc_normalize -- the md5 of the normalized UTF-8 bytes
    must agree byte-for-byte between two unrelated Unicode
    implementations. The curation step every multilingual corpus needs
    before dedup (NFC vs NFD variants of the same text would otherwise
    hash apart)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.element_at(
                F.array(*[F.lit(s) for s in _NFD_SUFFIXES]),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
        ).alias("decorated"),
    )
    return TX.unicode_nfc_profile(d)


_BLOCKLIST = ["slow", "merge batch", "hash value", "does-not-occur-xyz"]
_BLOCK_SQL_LIST = "[" + ", ".join("'" + p + "'" for p in _BLOCKLIST) + "]"


@query(
    "x5_blocklist_hits",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(list_filter({_BLOCK_SQL_LIST},
                                p -> contains(text, p))) AS INTEGER)
             AS n_hits,
           LEN(list_filter({_BLOCK_SQL_LIST},
                           p -> contains(text, p))) > 0 AS blocked
    FROM documents
    """,
)
def x5_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pattern blocklist screening (the unsafe-content / boilerplate
    gate of a curation pipeline): per doc, how many of the broadcast
    blocklist's substrings occur, and whether the doc is blocked. Pure
    higher-order array expression -- the pattern set rides the plan as a
    literal (no join, no shuffle, whole-stage codegen) and the filter
    runs at scan speed; at a real 100 TB scale the same shape holds until
    the pattern set outgrows a literal, at which point it becomes a
    broadcast join against an Aho-Corasick-style matcher."""
    d = load_table(spark, sf_dir, "documents")
    hits = F.filter(
        F.array(*[F.lit(p) for p in _BLOCKLIST]),
        lambda p: F.col("text").contains(p),
    )
    return d.select(
        "doc_id",
        F.size(hits).cast("int").alias("n_hits"),
        (F.size(hits) > 0).alias("blocked"),
    )


def _duck_bpe_train_sql(num_merges: int = 24, min_pair_count: int = 2) -> str:
    """CTE chain replaying operators/bpe.bpe_train (r8; the r7 verdict's
    stretch goal -- previously believed to defeat SQL unrolling because
    each iteration REWRITES the segmentation, a fold not an aggregate).

    The unlock: Spark's ``_merge_expr`` fold -- scan left to right,
    fusing every non-overlapping adjacent (a, b) -- is exactly what SQL
    REPLACE does over a string, provided symbol boundaries cannot be
    consumed by an adjacent match. Wrapping every symbol individually as
    ``\\x1f<sym>\\x1e`` makes occurrences of ``\\x1fa\\x1e\\x1fb\\x1e``
    character-disjoint, so REPLACE(seg, that, ``\\x1fab\\x1e``) is
    bit-equivalent to the fold (a freshly fused symbol can't left-match
    again in the same pass on either engine: 'ab' != 'a'). Control-char
    delimiters never appear in the corpus or the </w> marker.

    Per unrolled iteration: symbols re-derived by regex, adjacent pairs
    via list_zip against the shifted list, exact integer pair counts,
    argmax by (total DESC, left, right) -- Spark and DuckDB both compare
    strings by binary codepoint -- and a LEFT JOIN ON TRUE rewrite so an
    early stop (best < min_pair_count -> empty argmax) leaves the
    segmentation unchanged and emits no merge row, exactly like the
    operator's break."""
    parts, _ = _duck_bpe_ctes(num_merges, min_pair_count)
    union = " UNION ALL ".join(
        f"SELECT {i} AS it, l, r, total FROM b{i}" for i in range(num_merges)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY it) - 1 AS INTEGER) AS rank,
       l AS "left", r AS "right", total AS pair_count
FROM ({union})"""
    )


_BPE_D1, _BPE_D2 = "\x1f", "\x1e"  # symbol open/close sentinels
_BPE_WS = "[ \\t\\n\\x0b\\f\\r]+"  # the operator's ASCII class (bpe.py)


def _duck_bpe_ctes(num_merges: int, min_pair_count: int):
    """The shared training CTE chain; returns (parts, wrap_word_sql)
    where wrap_word_sql is a format template turning a word expression
    into its sentinel-wrapped initial segmentation."""
    d1, d2 = _BPE_D1, _BPE_D2
    ws = _BPE_WS
    sym_pat = f"{d1}([^{d2}]*){d2}"
    parts = [f"""w AS MATERIALIZED (
  SELECT word, CAST(SUM(cnt) AS BIGINT) AS n FROM (
    SELECT UNNEST(regexp_split_to_array(text, '{ws}')) AS word,
           1 AS cnt
    FROM documents
  ) WHERE word <> '' GROUP BY word
),
seg0 AS MATERIALIZED (
  SELECT n,
         '{d1}' || array_to_string(
           list_transform(range(1, length(word) + 1),
                          i -> substring(word, i, 1)),
           '{d2}{d1}') || '{d2}' || '{d1}</w>{d2}' AS s
  FROM w
)"""]
    for i in range(num_merges):
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(n) AS BIGINT) AS total FROM (
    SELECT n, UNNEST(list_zip(syms, syms[2:len(syms)])) AS pr
    FROM (SELECT n, regexp_extract_all(s, '{sym_pat}', 1) AS syms
          FROM seg{i})
  ) WHERE pr[2] IS NOT NULL GROUP BY pr[1], pr[2]
),
b{i} AS MATERIALIZED (
  SELECT l, r, total FROM p{i} WHERE total >= {min_pair_count}
  ORDER BY total DESC, l ASC, r ASC LIMIT 1
),
seg{i + 1} AS MATERIALIZED (
  SELECT n,
         CASE WHEN b.l IS NULL THEN s
              ELSE REPLACE(s, '{d1}' || b.l || '{d2}{d1}' || b.r || '{d2}',
                           '{d1}' || b.l || b.r || '{d2}')
         END AS s
  FROM seg{i} LEFT JOIN b{i} b ON TRUE
)""")
    wrap_word = (
        f"'{d1}' || array_to_string("
        f"list_transform(range(1, length({{w}}) + 1), "
        f"i -> substring({{w}}, i, 1)), '{d2}{d1}') || '{d2}{d1}</w>{d2}'"
    )
    return parts, wrap_word


def _duck_bpe_tokenize_sql(num_merges: int = 24, min_pair_count: int = 2) -> str:
    """CTE chain replaying operators/bpe.bpe_apply over the merges the
    train chain just learned: the whole document becomes ONE
    sentinel-wrapped symbol stream (word boundaries need no guard: a
    learned merge's LEFT symbol can never contain '</w>' -- word-final
    symbols have no right neighbor at train time -- so no merge matches
    across a boundary), then the 24 merges apply IN RANK ORDER as the
    same wrapped-REPLACE used in training.

    Rank-order application equals the operator's lowest-rank-first loop:
    a rank-r fusion can only create pairs involving its fused symbol,
    and any merge with that symbol as a component was learned AFTER r,
    so sweeping ranks 0..23 once never misses a lower-rank opportunity.
    (Caveat: the argument assumes no fused STRING is derivable from two
    different merge paths -- impossible over the fixture vocabulary; the
    pytest additionally pins the apply loop against an independent
    pure-Python reference.)"""
    d1, d2 = _BPE_D1, _BPE_D2
    parts, wrap_word = _duck_bpe_ctes(num_merges, min_pair_count)
    parts.append(f"""t0 AS MATERIALIZED (
  SELECT doc_id,
         array_to_string(list_transform(
           list_filter(regexp_split_to_array(text, '{_BPE_WS}'),
                       x -> x <> ''),
           w -> {wrap_word.format(w='w')}), '') AS s
  FROM documents
)""")
    for i in range(num_merges):
        parts.append(f"""t{i + 1} AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN b.l IS NULL THEN s
              ELSE REPLACE(s, '{d1}' || b.l || '{d2}{d1}' || b.r || '{d2}',
                           '{d1}' || b.l || b.r || '{d2}')
         END AS s
  FROM t{i} LEFT JOIN b{i} b ON TRUE
)""")
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT doc_id,
       CAST(length(s) - length(REPLACE(s, '{d2}', '')) AS INTEGER)
         AS n_tokens,
       md5(CASE WHEN length(s) < 2 THEN ''
                ELSE REPLACE(substring(s, 2, length(s) - 2), '{d2}{d1}', ' ')
           END) AS tokens_md5
FROM t{num_merges}"""
    )


@query("x5_bpe_train", oracle=_duck_bpe_train_sql(24))
def x5_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich 2016) over the corpus
    -- the learned merge table, rank-ordered. One corpus explode+count
    shuffle compresses the text to its word vocabulary; each of the 24
    merge rounds is a small vocab-only pair-count aggregate plus a 1-row
    argmax (bounded control data) and a shuffle-free fold rewrite, so at
    100 TB the per-iteration cost is O(distinct words), never O(corpus).
    Hash-matched (r8, previously rows-only): the merge fold unrolls into
    DuckDB as sentinel-wrapped string REPLACE per iteration
    (_duck_bpe_train_sql); the classic-corpus pytest additionally pins it
    against an independent pure-Python reference implementation."""
    from ..operators.bpe import bpe_merges_df, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    return bpe_merges_df(spark, bpe_train(docs, num_merges=24))


@query("x5_bpe_tokenize", oracle=_duck_bpe_tokenize_sql(24))
def x5_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the BPE merges learned from it: per doc,
    the subword token count and the md5 of the token stream (any rank or
    fusion bug changes the hash). Ranks broadcast as a closure literal;
    the Arrow tokenizer memoizes per distinct word, so cost tracks
    vocabulary, not tokens. The end-to-end tokenizer-training shape a
    training-data pipeline runs before packing (cf. x8_pack_sequences).
    Hash-matched (r8, was rows-only): train chain + rank-order
    wrapped-REPLACE apply chain (_duck_bpe_tokenize_sql)."""
    from ..operators.bpe import bpe_apply, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=24)
    return bpe_apply(docs, merges)


# ---------------------------------------------------------------------------
# X5 -- n-gram LM training + stupid-backoff scoring (CCNet-style filter)
# ---------------------------------------------------------------------------

# Shared oracle scaffolding: train bigram/unigram counts on 90% of the
# corpus (doc_id % 10 <> 0), score the held-out 10% transition by
# transition with exact-integer stupid-backoff INVERSE probabilities
# (operators/ngramlm.py module doc: logs are libm-unportable, integer
# ratios never are; 1/alpha = 1/0.4 = 2.5 exactly).
_LM_ORACLE_CTES = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    uni AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT UNNEST(t) AS w FROM toks WHERE doc_id % 10 <> 0
      ) GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
    bi AS (
      SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
             COUNT(*) AS c12
      FROM (
        SELECT UNNEST([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
        FROM toks WHERE doc_id % 10 <> 0
      ) GROUP BY 1, 2
    ),
    held AS (
      SELECT doc_id, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
      FROM (
        SELECT doc_id,
               UNNEST([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS bg
        FROM toks WHERE doc_id % 10 = 0
      )
    ),
    scored AS (
      SELECT s.doc_id,
             CASE WHEN b.c12 IS NOT NULL THEN 0
                  WHEN u2.c IS NOT NULL THEN 1 ELSE 2 END AS tier,
             CASE WHEN b.c12 IS NOT NULL THEN (1000000 * u1.c) // b.c12
                  WHEN u2.c IS NOT NULL THEN (2500000 * n) // u2.c
                  ELSE 2500000 * n END AS inv_ppm
      FROM held s
      LEFT JOIN bi b ON b.w1 = s.w1 AND b.w2 = s.w2
      LEFT JOIN uni u1 ON u1.w = s.w1
      LEFT JOIN uni u2 ON u2.w = s.w2
      CROSS JOIN tot
    ),
    per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_trans,
             CAST(SUM(CASE WHEN tier >= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_backoff,
             CAST(SUM(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
             CAST(SUM(inv_ppm) AS BIGINT) AS sum_inv_ppm,
             CAST(SUM(inv_ppm) AS BIGINT) // COUNT(*) AS amip,
             MAX(inv_ppm) AS max_inv_ppm
      FROM scored GROUP BY doc_id
    )
"""


def _lm_split(spark: SparkSession, sf_dir: str):
    """(train_docs, heldout_docs) — the 90/10 doc_id split both LM
    queries and their oracles use."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 10 != 0), d.filter(F.col("doc_id") % 10 == 0)


@query(
    "x5_lm_score_heldout",
    oracle=_LM_ORACLE_CTES + "\n    SELECT * FROM per_doc",
)
def x5_lm_score_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL distributed language-model quality scoring (the CCNet move,
    Wenzek 2020): train bigram+unigram counts on 90% of the corpus, score
    every held-out document with stupid backoff (Brants 2007). Per doc:
    transition count, backoff/OOV counts, and AMIP -- the exact-integer
    perplexity analog (mean inverse transition probability in ppm; see
    operators/ngramlm.py for why not log-perplexity). Scale: training is
    two map-side-combinable hash aggregates; scoring is stream x model
    joins on vocabulary keys (model side unique-keyed -- no
    amplification; Zipf-hot probe keys are AQE-split hash-join skew)."""
    from ..operators import ngramlm as LM

    train, held = _lm_split(spark, sf_dir)
    uni, bi, total = LM.train_bigram_lm(train)
    return LM.score_documents(held, uni, bi, total)


@query(
    "x5_lm_perplexity_buckets",
    oracle=_LM_ORACLE_CTES
    + """
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_trans) AS BIGINT) AS sum_trans,
           CAST(SUM(n_backoff) AS BIGINT) AS sum_backoff,
           CAST(SUM(n_oov) AS BIGINT) AS sum_oov,
           MIN(amip) AS min_amip,
           MAX(amip) AS max_amip
    FROM (SELECT *, NTILE(3) OVER (ORDER BY amip, doc_id) AS bucket
          FROM per_doc)
    GROUP BY bucket
    """,
)
def x5_lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus partition: tercile the held-out
    docs by LM score (AMIP ascending = most-fluent first; ties broken by
    doc_id for a total order) and summarize each bucket. NTILE over a
    fully-specified order is engine-portable. Scale: the windowed sort
    runs over the PER-DOC score table (one row per doc, not per token);
    at 100 TB one computes the two AMIP cutoffs with approx_percentile
    and buckets by comparison instead -- same buckets, no global sort."""
    from pyspark.sql import Window

    from ..operators import ngramlm as LM

    train, held = _lm_split(spark, sf_dir)
    uni, bi, total = LM.train_bigram_lm(train)
    per_doc = LM.score_documents(held, uni, bi, total)
    w = Window.orderBy("amip", "doc_id")
    return (
        per_doc.withColumn("bucket", F.ntile(3).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_trans").alias("sum_trans"),
            F.sum("n_backoff").alias("sum_backoff"),
            F.sum("n_oov").alias("sum_oov"),
            F.min("amip").alias("min_amip"),
            F.max("amip").alias("max_amip"),
        )
    )


@query(
    "x5_lm_trigram_score",
    oracle=_LM_ORACLE_CTES
    + """
    , tri AS (
      SELECT split_part(tg, ' ', 1) AS w1, split_part(tg, ' ', 2) AS w2,
             split_part(tg, ' ', 3) AS w3, COUNT(*) AS c123
      FROM (
        SELECT UNNEST([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS tg
        FROM toks WHERE doc_id % 10 <> 0
      ) GROUP BY 1, 2, 3
    ),
    held3 AS (
      SELECT doc_id, split_part(tg, ' ', 1) AS w1,
             split_part(tg, ' ', 2) AS w2, split_part(tg, ' ', 3) AS w3
      FROM (
        SELECT doc_id,
               UNNEST([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       FOR i IN range(1, len(t) - 1)]) AS tg
        FROM toks WHERE doc_id % 10 = 0
      )
    ),
    scored3 AS (
      SELECT s.doc_id,
             CASE WHEN tr.c123 IS NOT NULL THEN 0
                  WHEN b23.c12 IS NOT NULL THEN 1
                  WHEN u3.c IS NOT NULL THEN 2 ELSE 3 END AS tier,
             CASE WHEN tr.c123 IS NOT NULL THEN (1000000 * ctx.c12) // tr.c123
                  WHEN b23.c12 IS NOT NULL THEN (2500000 * u2.c) // b23.c12
                  WHEN u3.c IS NOT NULL THEN (6250000 * n) // u3.c
                  ELSE 6250000 * n END AS inv_ppm
      FROM held3 s
      LEFT JOIN tri tr
        ON tr.w1 = s.w1 AND tr.w2 = s.w2 AND tr.w3 = s.w3
      LEFT JOIN bi ctx ON ctx.w1 = s.w1 AND ctx.w2 = s.w2
      LEFT JOIN bi b23 ON b23.w1 = s.w2 AND b23.w2 = s.w3
      LEFT JOIN uni u2 ON u2.w = s.w2
      LEFT JOIN uni u3 ON u3.w = s.w3
      CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_trans,
           CAST(SUM(CASE WHEN tier = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
           CAST(SUM(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bi_backoff,
           CAST(SUM(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_uni_backoff,
           CAST(SUM(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           CAST(SUM(inv_ppm) AS BIGINT) AS sum_inv_ppm,
           CAST(SUM(inv_ppm) AS BIGINT) // COUNT(*) AS amip,
           MAX(inv_ppm) AS max_inv_ppm
    FROM scored3 GROUP BY doc_id
    """,
)
def x5_lm_trigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL recursive stupid-backoff chain (Brants 2007): trigram hit
    -> bigram backoff (x 1/alpha) -> unigram backoff (x 1/alpha^2) -> OOV,
    all in exact integer ppm (2.5 and 6.25 are exact). Same 90/10 split
    as x5_lm_score_heldout; positions 3..n scored. Scale: the trigram
    count table is the big one (|distinct trigrams| ~ corpus tokens), so
    its scoring join shuffles stream-vs-model on (w1,w2,w3) rather than
    broadcasting; the bigram/unigram sides still broadcast. A trigram
    hit's numerator is the CONTEXT bigram count c(w1 w2) -- present by
    construction whenever the trigram is."""
    from ..operators import ngramlm as LM

    train, held = _lm_split(spark, sf_dir)
    uni, bi, tri, total = LM.train_trigram_lm(train)
    return LM.score_documents_trigram(held, uni, bi, tri, total)


def _persisted_lm_model(spark: SparkSession, sf_dir: str) -> str:
    """The trained bigram LM AS DISK STATE (uni/bi/total parquet under
    one cache slot) -- the production posture: a pipeline trains the
    count tables once, persists them beside the corpus, and every
    arriving batch probes the stored model (the LM analog of
    _persisted_corpus_sig / _persisted_ivf_index). Counts are exact
    integers, so persisted and recomputed models are identical."""
    import os

    from ..operators import ngramlm as LM

    def build(staging: str) -> None:
        train = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        uni, bi, total = LM.train_bigram_lm(train)
        uni.write.parquet(os.path.join(staging, "uni"))
        bi.write.parquet(os.path.join(staging, "bi"))
        total.write.parquet(os.path.join(staging, "total"))

    return _fixture_cache(sf_dir, "documents", "lm_bigram_v1", build)


@query(
    "x5_lm_score_incremental",
    oracle=_LM_ORACLE_CTES + "\n    SELECT * FROM per_doc",
)
def x5_lm_score_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score the arriving batch against the PERSISTED LM: the count
    tables come off disk (built once per fixture), so the per-batch cost
    is O(batch tokens) joins against stored vocabulary tables -- no
    touch of the historical corpus, mirroring x2_incremental_neardup's
    persisted-signature-index shape at the language-model level.
    Identical output to x5_lm_score_heldout (exact integer counts make
    the persisted model equal the inline one), which is exactly what the
    shared oracle asserts."""
    import os

    from ..operators import ngramlm as LM

    path = _persisted_lm_model(spark, sf_dir)
    uni = spark.read.parquet(os.path.join(path, "uni"))
    bi = spark.read.parquet(os.path.join(path, "bi"))
    total = spark.read.parquet(os.path.join(path, "total"))
    _, held = _lm_split(spark, sf_dir)
    return LM.score_documents(held, uni, bi, total)

"""Spark-ML BucketedRandomProjectionLSH replayed in DuckDB SQL (r8).

The last "Spark-ML internals" rows-only queries (x3_lsh_neardup_pairs,
x3_neardup_collapse) hinge on ONE engine-internal artifact: the model's
random unit projection vectors. Those are a pure function of (seed=42,
dim=64, numHashTables=4) -- data-independent -- so they are extracted
once from a fitted model and frozen here as literals;
tests/test_mllsh.py refits the model and asserts the vectors (and the
resulting buckets) still match, so a Spark-ML upgrade that changes the
generator fails the pin instead of silently corrupting the oracle.

Everything else is plain arithmetic both engines perform identically:
p=2 normalization (forward-order sum of squares, correctly-rounded
sqrt), bucket_j = floor(dot(u, r_j) / bucketLength) with the forward
BLAS.dot fold (DuckDB's list_reduce seeds with the first element;
0.0 + x1 == x1), candidates on any equal (table, bucket), exact
euclidean re-distance with the strict `< threshold` filter
approxSimilarityJoin applies, and the engine's ROUND/DECIMAL output
normalization already proven by the x3 cosine oracles.
"""

from __future__ import annotations

SEED = 42
DIM = 64
NUM_TABLES = 4
BUCKET_LENGTH = 0.5

# model.randUnitVectors for BucketedRandomProjectionLSH(seed=42,
# numHashTables=4) fit on 64-dim input -- frozen, pinned by test_mllsh
UNIT_VECTORS: list[list[float]] = [
    [0.12949674375780473, 0.10426463032006292, -0.10771877038736019, -0.1255372363345624,
     0.031864015961875526, 0.07763903148140297, -0.09267625761376243, -0.15838508708815516,
     -0.02165389051618035, 0.16854269109352538, 0.09098491965165977, -0.013780063771881217,
     0.15995718784720656, -0.07260502199283608, -0.13717864034381758, 0.040117573088542115,
     -0.05560766029690286, 0.062454079998983995, -0.1364876173085817, 0.036404539477744795,
     0.17590650082725473, 0.049731132116372166, 0.054615194300076435, 0.17233239373966974,
     -0.03139385289904706, -0.009519024250218314, 0.1424166108604675, -0.03688726820688779,
     -0.019651834133742857, -0.21077117424649872, 0.16146554421004417, -0.15465212141720716,
     -0.2228011893040183, -0.10417242087441117, -0.2890542789985285, -0.18495762435445184,
     -0.013835841572937869, 0.1461959233590042, -0.030521449505394982, 0.029200581252854782,
     -0.036279601655707094, -0.2005551336051944, -0.05482524727370144, -0.057835009365983805,
     0.1266353384984892, -0.004643580505872421, -0.1256144906681653, 0.21119488292759514,
     0.1299317417234659, -0.12005833484317877, 0.12163713866691228, -0.21906770558940117,
     0.03413749349242529, 0.02807014081433207, 0.15946395092753893, -0.17239926149026796,
     0.03072450601327282, 0.06364796961267483, -0.0600848460661747, 0.06112732611580623,
     0.25088844927734233, -0.07177726126717898, -0.21355986809913746, 0.04383816738170152],
    [0.04324546763126772, -0.1196250007447754, -0.000355742170688643, -0.06290591868245525,
     -0.07273002664444873, -0.0025350541717712822, 0.21857258132453325, -0.14693412707906917,
     0.07881307914343753, -0.020660480606120326, 0.0880343533187672, 0.16282531161891542,
     0.11732429428317515, 0.02942823915355396, 0.1220668317446316, -0.09813315096329371,
     0.10664634497642195, -0.03370424478078597, -0.10137999150787967, -0.24747202128264886,
     -0.24704059522100943, -0.07652882574249704, -0.05428342382724887, 0.03297680839243599,
     -0.06382884375871065, 0.059223190811845725, -0.059273205519043574, 0.006057363702502043,
     0.09351308498819277, -0.03607765734181544, 0.010717326609066756, 0.1671127197096646,
     0.10133632225224352, 0.22856203619428414, 0.019371121326215757, -0.13201596955909142,
     0.026644357112041522, 0.11895237041886508, 0.2006419009478108, -0.18627509281145743,
     -0.25310124524861277, 0.181641915258207, -0.07428222129311543, 0.098827609066886,
     0.2088636922985201, 0.1497187960249646, -0.02549389751561777, -0.2992261327735093,
     0.058379038344302144, 0.08717337513955836, -0.09887300181280123, 0.15919954423297916,
     0.23621567316506964, 0.008946170086847385, 0.1718864885541727, -0.07733534461311735,
     0.10204751223628504, 0.05543424240252225, -0.06225994690770243, 0.054967533676602995,
     0.0879992390575857, 0.11509781648299505, 0.03937942153452649, 0.04267392826482056],
    [0.2253599547352401, 0.084686016900039, -0.12090235717915984, 0.012037035560567483,
     0.05653929989547702, -0.19784366335303277, 0.15157652606891173, -0.07726288997430494,
     0.09069712513868437, -0.01850775179851565, 0.09420127205578385, -0.044324398614280294,
     -0.01062930981041057, -0.06194936947753676, 0.03574121958713461, -0.11595951529739637,
     -0.06624457677123273, 0.2712366777191197, 0.01533153186863178, 0.18713711661424884,
     0.04465499294074913, 0.08888672766398283, 0.0959456780978348, -0.07089928799994677,
     -0.23457091437136127, 0.009604915537812436, 0.019456711376994573, -0.10214125471448683,
     -0.21790520325684198, 0.16383454757654273, 0.055456209262321005, 0.16443921269983677,
     0.037453954195909266, 0.12401790285189035, 0.08866502795089151, -0.02938251183534179,
     0.04390435464347258, 0.10202408760518072, 0.18064985547214535, 0.13747465326312658,
     0.045180519164631894, 0.14098454107711914, 0.0033389589485273265, -0.0812388597453255,
     -0.0017409007440788824, -0.13338295982400739, -0.0028185053398772997, 0.19979634198148805,
     0.13939946082109098, -0.12874306733279453, 0.029588120684531684, 0.15535201312812244,
     0.01059987575708014, -0.13304607224460271, 0.18034472263476178, 0.040046209069542905,
     -0.05070562271716691, -0.20676253064762004, 0.11012487642391115, -0.10545618963525344,
     0.19875023092077387, 0.09380610937437693, 0.13795962125376615, 0.2927722551070435],
    [-0.06374135683995162, -0.09219503246981259, 0.20387147163340155, -0.10935797479905664,
     -0.04308987473913211, -0.22053735363025692, -0.0689505866185994, -0.335906687103947,
     0.039147854997285396, -0.1496523981120987, -0.22241719602183366, 0.010556593479734708,
     -0.17237743213626663, 0.09042793042560178, -0.16716014790388486, 0.1623874130871556,
     0.0016294745422463736, 0.0852497427913705, -0.17153256310120862, 0.10578917251323942,
     0.0793227971835568, 0.016029777279764824, 0.05042081026847254, -0.07556934199188059,
     0.05626682220005956, -0.10333901194035604, 0.008307604126977912, -0.09633777979600622,
     0.1532688478369975, 0.11940703413743275, 0.16071269411711286, -0.009202061603050597,
     -0.07346227785473011, 0.1364132505370998, 0.12256128954494584, -0.08972364033338956,
     0.11501214463815192, -0.328871752830656, 0.054044983219077775, 0.052742933259140166,
     0.10928698480434651, -0.045185470946430495, 0.13894898075688086, -0.030477763874640906,
     0.020215754742539182, 0.08675717574067274, 0.047838716967836085, 0.012605032955128678,
     -0.16082285233359414, -0.03444399726472531, -0.07829696607501378, -0.01900287098000823,
     0.244327756207043, 0.23932680858694025, -0.10052570582133381, -0.01990727013443709,
     0.01781187785973467, -0.1183833051902047, 0.02475355910216522, 0.0938850567409529,
     -0.05664336305195141, -0.023485688576799755, 0.10434324461021213, 0.17995762924893127]
]


def _vec_lit(v: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in v) + "]"


def _dot(u: str, lit: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({u}, {lit}), "
        f"p -> p[1] * p[2]), (a, b) -> a + b)"
    )


def _normalized_cte(src: str = "embeddings") -> str:
    return f"""
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM {src}
     WHERE embedding IS NOT NULL),
nn AS (
  SELECT vec_id, raw,
         sqrt(list_reduce(list_transform(raw, x -> x * x), (a, b) -> a + b))
           AS nrm
  FROM v
),
n AS (SELECT vec_id, list_transform(raw, x -> x / nrm) AS u FROM nn),
bk AS (
  SELECT vec_id, u,
         {", ".join(
             f"CAST(FLOOR({_dot('u', _vec_lit(v))} / {BUCKET_LENGTH}) AS BIGINT) AS b{j}"
             for j, v in enumerate(UNIT_VECTORS))}
  FROM n
),
bands AS ({" UNION ALL ".join(
    f"SELECT vec_id, {j} AS tbl, b{j} AS bucket FROM bk"
    for j in range(NUM_TABLES))}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bands a JOIN bands b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)"""


def brp_pairs_sql(threshold_euclidean: float = 0.9) -> str:
    """Oracle for x3_lsh_neardup_pairs: candidates + exact euclidean on
    the normalized vectors (strict < threshold), cosine reported as
    1 - d^2/2 at 4 decimals."""
    return f"""
WITH {_normalized_cte()},
d AS (
  SELECT c.id_a, c.id_b,
         sqrt(list_reduce(list_transform(list_zip(na.u, nb.u),
                p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)) AS dist
  FROM cand c JOIN n na ON c.id_a = na.vec_id
              JOIN n nb ON c.id_b = nb.vec_id
)
SELECT id_a, id_b,
       CAST(CAST(ROUND(1 - dist * dist / 2, 4) AS DECIMAL(18,4)) AS DOUBLE)
         AS cos_sim_approx
FROM d WHERE dist < {threshold_euclidean}"""


def _capped_ctes(bucket_length: float, max_bucket_size: int) -> str:
    """CTE chain for the CAPPED native BRP path (r11, VERDICT task 3):
    parametrized bucket length (the finer 0.02 default spreads an
    isotropic cloud across ~150 buckets/table instead of ~2), bucket
    counts, the cap filter, then candidates from surviving band rows
    only -- the exact mirror of operators/similarity.py
    brp_neardup_pairs_capped."""
    return f"""
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS raw FROM embeddings
     WHERE embedding IS NOT NULL),
nn AS (
  SELECT vec_id, raw,
         sqrt(list_reduce(list_transform(raw, x -> x * x), (a, b) -> a + b))
           AS nrm
  FROM v
),
n AS (SELECT vec_id, list_transform(raw, x -> x / nrm) AS u FROM nn),
bk AS MATERIALIZED (
  SELECT vec_id, u,
         {", ".join(
             f"CAST(FLOOR({_dot('u', _vec_lit(v))} / {bucket_length}) AS BIGINT) AS b{j}"
             for j, v in enumerate(UNIT_VECTORS))}
  FROM n
),
bands AS MATERIALIZED ({" UNION ALL ".join(
    f"SELECT vec_id, {j} AS tbl, b{j} AS bucket FROM bk"
    for j in range(NUM_TABLES))}),
bc AS (SELECT tbl, bucket, COUNT(*) AS c FROM bands GROUP BY tbl, bucket),
kept AS (
  SELECT bands.vec_id, bands.tbl, bands.bucket
  FROM bands JOIN bc USING (tbl, bucket) WHERE bc.c <= {max_bucket_size}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM kept a JOIN kept b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)"""


def brp_pairs_capped_sql(
    threshold_euclidean: float = 0.9,
    bucket_length: float = 0.02,
    max_bucket_size: int = 128,
) -> str:
    """Oracle for x3_brp_pairs_bucket_capped: capped candidates + exact
    euclidean re-distance on normalized vectors (strict < threshold),
    cosine reported as 1 - d^2/2 at 4 decimals."""
    return f"""
WITH {_capped_ctes(bucket_length, max_bucket_size)},
d AS (
  SELECT c.id_a, c.id_b,
         sqrt(list_reduce(list_transform(list_zip(na.u, nb.u),
                p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)) AS dist
  FROM cand c JOIN n na ON c.id_a = na.vec_id
              JOIN n nb ON c.id_b = nb.vec_id
)
SELECT id_a, id_b,
       CAST(CAST(ROUND(1 - dist * dist / 2, 4) AS DECIMAL(18,4)) AS DOUBLE)
         AS cos_sim_approx
FROM d WHERE dist < {threshold_euclidean}"""


def brp_bucket_profile_sql(bucket_length: float = 0.02) -> str:
    """Oracle for x3_brp_bucket_skew_profile: the (bucket_size,
    n_buckets) histogram of the native BRP band table -- the drop
    accounting that makes the cap first-class instead of silent."""
    return f"""
WITH {_capped_ctes(bucket_length, 1)}
SELECT CAST(c AS BIGINT) AS bucket_size, CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM bc GROUP BY c"""


def brp_collapse_sql(
    cos_threshold: float = 0.9, threshold_euclidean: float = 0.5
) -> str:
    """Oracle for x3_neardup_collapse: LSH candidates (tighter euclidean
    gate) -> EXACT cosine on the RAW vectors >= threshold -> RECURSIVE
    min-id closure -> surviving (vec_id, label)."""
    cos = (
        "list_dot_product(va.raw, vb.raw) / "
        "(sqrt(list_dot_product(va.raw, va.raw)) * "
        "sqrt(list_dot_product(vb.raw, vb.raw)))"
    )
    return f"""
WITH RECURSIVE {_normalized_cte()},
d AS (
  SELECT c.id_a, c.id_b,
         sqrt(list_reduce(list_transform(list_zip(na.u, nb.u),
                p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)) AS dist
  FROM cand c JOIN n na ON c.id_a = na.vec_id
              JOIN n nb ON c.id_b = nb.vec_id
),
lsh AS (SELECT id_a, id_b FROM d WHERE dist < {threshold_euclidean}),
ver AS (
  SELECT l.id_a, l.id_b
  FROM lsh l JOIN v va ON l.id_a = va.vec_id
             JOIN v vb ON l.id_b = vb.vec_id
  WHERE ROUND({cos}, 4) >= {cos_threshold}
),
edges AS (
  SELECT id_a AS s, id_b AS t FROM ver UNION SELECT id_b, id_a FROM ver
),
reach(nd, r) AS (
  SELECT vec_id, vec_id FROM v
  UNION
  SELECT reach.nd, e.t FROM reach JOIN edges e ON reach.r = e.s
),
labels AS (SELECT nd, MIN(r) AS root FROM reach GROUP BY nd)
SELECT e.vec_id, e.label
FROM embeddings e LEFT JOIN labels l ON e.vec_id = l.nd
WHERE l.nd IS NULL OR l.root = l.nd"""

"""Multimodal-column queries (SURVEY section 2.11 X4): the mapInPandas
decode/frame-sample paths, oracle-checked -- the stub codec's arithmetic is
replicated in SQL, so the Arrow batch plumbing itself is what gets verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.multimodal import (
    decode_media,
    extract_features,
    media_from_documents,
    resize_media,
    sample_frames,
)
from .registry import query


@query(
    "x4_multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(64 + strlen(text) % 192 AS INTEGER) AS width,
           CAST(64 + (strlen(text) * 7) % 192 AS INTEGER) AS height,
           CAST((64 + strlen(text) % 192) * 1000000
                // (64 + (strlen(text) * 7) % 192) AS BIGINT) AS aspect_ppm
    FROM documents
    """,
)
def x4_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(media_from_documents(docs))


@query(
    "x4_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(UNNEST(generate_series(0, strlen(text) % 4)) AS INTEGER) AS frame_idx
    FROM documents
    """,
)
def x4_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(media_from_documents(docs)).select("media_id", "frame_idx")


@query(
    "x4_resize_fit_box",
    oracle="""
    SELECT media_id, width, height, out_width, out_height,
           CAST(out_width AS BIGINT) * out_height * 3 AS out_bytes
    FROM (
      -- CASE: duck GREATEST IGNORES NULLs (returns 1 for a NULL dim);
      -- the engine's NULL geometry must stay NULL (r10 NULL tier)
      SELECT media_id, width, height,
             CASE WHEN width IS NULL THEN NULL
                  ELSE GREATEST(1, CAST(FLOOR(width * scale) AS INTEGER))
             END AS out_width,
             CASE WHEN height IS NULL THEN NULL
                  ELSE GREATEST(1, CAST(FLOOR(height * scale) AS INTEGER))
             END AS out_height
      FROM (
        SELECT media_id, width, height,
               LEAST(224.0 / width, 224.0 / height) AS scale
        FROM (
          SELECT doc_id AS media_id,
                 CAST(64 + strlen(text) % 192 AS INTEGER) AS width,
                 CAST(64 + (strlen(text) * 7) % 192 AS INTEGER) AS height
          FROM documents
        )
      )
    )
    """,
)
def x4_resize_fit_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize geometry over the mapInPandas path; the
    oracle replays the stub's exact double arithmetic (identical IEEE
    operands -> identical floor on both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_media(media_from_documents(docs))


@query(
    "x4_feature_extract",
    oracle="""
    SELECT doc_id AS media_id,
           list_transform(range(0, 8), i ->
             CAST((strlen(text) * 31 + i * 7) % 1000 AS DOUBLE) / 1000.0)
             AS feature
    FROM documents
    """,
)
def x4_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature vectors from blobs. Hash-matched (r8, was rows-only): the
    extractor arithmetic is integer mod + one exact double division, and
    list-typed outputs compare fine under the multiset harness -- both
    engines surface plain Python lists."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(media_from_documents(docs))


@query(
    "x4_audio_frame_energy",
    oracle="""
    -- BYTE-wise replay (r10, found by the Unicode tier): the stub PCM
    -- decode reads UTF-8 BYTES as samples; ord(substr(...)) read CODE
    -- POINTS and overflowed INT32 squaring an emoji. hex(encode(text))
    -- exposes the true byte stream (two hex digits per byte).
    WITH b AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents),
    w AS (
      SELECT media_id, hx, n, unnest(range(0, GREATEST(n, 1), 256)) AS w0
      FROM b)
    SELECT media_id, CAST(w0 // 256 AS INT) AS window_idx,
           CAST(CASE WHEN n IS NULL THEN NULL
                     ELSE LEAST(256, n - w0) END AS INT) AS n_samples,
           CAST(COALESCE(list_sum(list_transform(
                  range(1, CAST(CASE WHEN n IS NULL THEN 0
                                ELSE LEAST(256, n - w0) END AS BIGINT) + 1),
                  i -> ((strpos('0123456789ABCDEF',
                                substr(hx, CAST(2*(w0+i)-1 AS INT), 1)) - 1) * 16
                        + (strpos('0123456789ABCDEF',
                                  substr(hx, CAST(2*(w0+i) AS INT), 1)) - 1))
                       * ((strpos('0123456789ABCDEF',
                                  substr(hx, CAST(2*(w0+i)-1 AS INT), 1)) - 1) * 16
                          + (strpos('0123456789ABCDEF',
                                    substr(hx, CAST(2*(w0+i) AS INT), 1)) - 1)))),
                0) AS BIGINT) AS energy
    FROM w
    """,
)
def x4_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio energy over the stub PCM decode (8-bit samples =
    blob bytes; the fixture text is ASCII so the oracle's codepoint
    arithmetic replays the byte arithmetic exactly). Row-multiplying
    mapInPandas with a numpy-vectorized inner loop and exact integer
    output -- the VAD/silence-gate shape of an audio corpus pipeline."""
    from ..functions.multimodal import audio_frame_energy, audio_from_documents

    docs = load_table(spark, sf_dir, "documents")
    return audio_frame_energy(audio_from_documents(docs))


def _duck_multimodal_pipeline_sql() -> str:
    """DuckDB replay of the full pipeline (r8, was rows-only): the
    feature extractor's arithmetic ((n_bytes*31 + i*7) % 1000 / 1000.0)
    as a list_transform, then the proven k-means CTE recipe
    (plans/llm.py::_duck_kmeans_ctes, k=4 x 2 iterations over the
    8-dim features), argmin re-assignment, and the exact decimal
    fixed-point distance sum."""
    from .llm import _duck_kmeans_ctes, _duck_sq_dist

    ctes, final_c = _duck_kmeans_ctes(k=4, iterations=2, dim=8,
                                      include_v=False)
    sqd = _duck_sq_dist("a.v", "c.cv")
    return f"""
WITH v AS (
  -- undecodable (NULL-blob) media are dropped before clustering (r10
  -- NULL tier) -- their features have no position in the space; the
  -- Spark side applies the same gate
  SELECT doc_id AS vec_id,
         list_transform(range(0, 8), i ->
           CAST((strlen(text) * 31 + i * 7) % 1000 AS DOUBLE) / 1000.0) AS v
  FROM documents
  WHERE text IS NOT NULL
),
{ctes},
assigned AS (
  SELECT vec_id, cluster_id, sqd FROM (
    SELECT a.vec_id, c.cid AS cluster_id, {sqd} AS sqd,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {sqd} ASC, c.cid) AS rn
    FROM v a CROSS JOIN {final_c} c
  ) WHERE rn = 1
)
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_media,
       MIN(vec_id) AS first_media,
       CAST(FLOOR(SUM(CAST(CAST(sqd AS VARCHAR) AS DECIMAL(28,10))) * 1000)
            AS BIGINT) AS total_sqdist_e3
FROM assigned GROUP BY cluster_id
"""


@query("x4_multimodal_pipeline", oracle=_duck_multimodal_pipeline_sql())
def x4_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal flow in one plan: blob -> decode (stub codec)
    -> feature extraction -> k-means feature clustering -> per-cluster
    media stats. The Arrow mapInPandas stages chain without a shuffle;
    the only exchange is the final cluster aggregation. Hash-matched
    (r8): the k-means stage replays in DuckDB via the CTE-unrolling
    recipe that oracled the IVF/SemDeDup family in r7."""
    from ..functions.multimodal import extract_features, media_from_documents
    from ..operators import kmeans as KM

    docs = load_table(spark, sf_dir, "documents")
    # undecodable (NULL-blob) media are dropped before clustering -- their
    # features have no position in the space (mirrors the oracle's
    # WHERE text IS NOT NULL)
    feats = extract_features(
        media_from_documents(docs.filter(F.col("text").isNotNull()))
    )
    cents = KM.kmeans_fit(feats, "media_id", "feature", k=4, iterations=2)
    assigned = KM._with_assignment(
        feats.select("media_id", F.col("feature").alias("v")), "v", cents
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_media"),
            F.min("media_id").alias("first_media"),
            F.floor(F.sum(F.col("sq_dist").cast("decimal(28,10)")) * 1000)
            .cast("bigint")
            .alias("total_sqdist_e3"),
        )
    )


@query(
    "x4_decode_arrow",
    oracle="""
    SELECT doc_id AS media_id, 'image' AS kind,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(64 + strlen(text) % 192 AS INTEGER) AS width,
           CAST(64 + (strlen(text) * 7) % 192 AS INTEGER) AS height,
           CAST((64 + strlen(text) % 192) * 1000000
                // (64 + (strlen(text) * 7) % 192) AS BIGINT) AS aspect_ppm
    FROM documents
    """,
)
def x4_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow twin of x4_multimodal_decode (same oracle): pyarrow
    RecordBatch compute kernels end to end, no Arrow<->pandas hop."""
    from ..functions.multimodal import decode_media_arrow

    docs = load_table(spark, sf_dir, "documents")
    return decode_media_arrow(media_from_documents(docs))


@query(
    "x4_wav_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(2 AS INTEGER) AS sample_width,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(64 + doc_id % 64 AS BIGINT) AS n_frames,
           CAST(list_max(list_transform(range(0, CAST(64 + doc_id % 64 AS INTEGER)),
                i -> ABS((((doc_id * 31 + i * 7) % 256) - 128) * 256)))
                AS INTEGER) AS peak,
           CAST(list_sum(list_transform(range(0, CAST(64 + doc_id % 64 AS INTEGER)),
                i -> ((((doc_id * 31 + i * 7) % 256) - 128) * 256)
                   * ((((doc_id * 31 + i * 7) % 256) - 128) * 256)))
                AS BIGINT) AS energy
    FROM documents
    """,
)
def x4_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec end-to-end (VERDICT r2 item 7): synthesize genuine
    RIFF/WAV blobs (one per doc_id), decode them with stdlib ``wave`` --
    real header parse, real PCM16 frames -- and report exact integer signal
    stats. The waveform is a deterministic integer function of media_id, so
    the oracle re-derives n_frames/peak/energy arithmetically in SQL: any
    defect in the container round-trip (header fields, endianness, frame
    count, sample decode) hash-fails here."""
    from ..functions.multimodal import synth_decode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # r11: fused synth+decode -- one Arrow stage instead of two chained
    # MapInPandas (guide section 4; see functions/multimodal._synth_decode)
    return synth_decode_wav(docs)


@query(
    "x4_pgm_decode",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             8 + doc_id % 9 AS w,
             8 + (doc_id * 3) % 9 AS h,
             flatten(list_transform(
               range(0, CAST(8 + (doc_id * 3) % 9 AS INTEGER)),
               y -> list_transform(
                 range(0, CAST(8 + doc_id % 9 AS INTEGER)),
                 x -> (doc_id * 31 + y * 17 + x * 7) % 256))) AS p
      FROM documents)
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(255 AS INTEGER) AS maxval,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_sum(p) AS BIGINT) AS pixel_sum,
           CAST(list_max(p) AS INTEGER) AS pixel_max
    FROM px
    """,
)
def x4_pgm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end: synthesize genuine netpbm P5 (binary
    PGM) blobs -- a real image format, header + raw pixel payload -- then
    parse the header and pixel bytes back and report exact integer pixel
    stats. The pixel grid is a deterministic integer function of media_id,
    so the oracle re-derives width/height/sum/max arithmetically: any
    defect in the container round-trip (header layout, offset math, pixel
    order) hash-fails here. The image twin of x4_wav_decode."""
    from ..functions.multimodal import synth_decode_pgm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return synth_decode_pgm(docs)  # r11: fused synth+decode, one Arrow stage


@query(
    "x4_pgm_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(4 AS INTEGER) AS out_width,
           CAST(4 AS INTEGER) AS out_height,
           CAST(list_sum(flatten(list_transform(range(0, 4),
             y -> list_transform(range(0, 4),
               x -> (doc_id * 31
                     + ((y * (8 + (doc_id * 3) % 9)) // 4) * 17
                     + ((x * (8 + doc_id % 9)) // 4) * 7) % 256))))
             AS BIGINT) AS pixel_sum
    FROM documents
    """,
)
def x4_pgm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: nearest-neighbor resample of genuine decoded PGM
    pixels to 4x4 (src index = floor(out_index * src_dim / out_dim)),
    verified by the resampled image's exact pixel checksum -- the oracle
    replays the same index arithmetic on the synthesized pixel function."""
    from ..functions.multimodal import pgm_media, resize_pgm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return resize_pgm(pgm_media(docs), out_w=4, out_h=4)


@query(
    "x4_y4m_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             2 * (2 + doc_id % 4) AS w,
             2 * (2 + (doc_id * 3) % 4) AS h,
             3 + doc_id % 6 AS n
      FROM documents
    ), yp AS (
      SELECT doc_id, w, h, n,
        flatten(flatten(list_transform(range(0, CAST(n AS INTEGER)), t ->
          list_transform(range(0, CAST(h AS INTEGER)), y ->
            list_transform(range(0, CAST(w AS INTEGER)), x ->
              (doc_id * 31 + t * 13 + y * 17 + x * 7) % 256))))) AS yv,
        flatten(flatten(list_transform(range(0, CAST(n AS INTEGER)), t ->
          list_transform(range(0, CAST(h // 2 AS INTEGER)), cy ->
            list_transform(range(0, CAST(w // 2 AS INTEGER)), cx ->
              (doc_id * 7 + t * 11 + cy * 5 + cx * 3) % 256
              + (doc_id * 13 + t * 3 + cy * 7 + cx * 11) % 256))))) AS uvv
      FROM d)
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(n AS INTEGER) AS n_frames,
           CAST(list_sum(yv) AS BIGINT) AS y_sum,
           CAST(list_sum(uvv) AS BIGINT) AS uv_sum,
           CAST(list_max(yv) AS INTEGER) AS y_max
    FROM yp
    """,
)
def x4_y4m_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video codec end-to-end: synthesize genuine YUV4MPEG2 (.y4m)
    streams -- a real public video container: text stream header, FRAME
    markers, raw planar C420 payload -- then parse the container back and
    report exact integer plane stats. The planes are deterministic integer
    functions of (media_id, frame, y, x), so the oracle re-derives every
    sum arithmetically: any header/frame-offset/plane-order bug
    hash-fails. Completes the real-codec trio (WAV audio, PGM image,
    Y4M video)."""
    from ..functions.multimodal import synth_decode_y4m

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return synth_decode_y4m(docs)  # r11: fused synth+decode, one Arrow stage


@query(
    "x4_y4m_frame_sample",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             2 * (2 + doc_id % 4) AS w,
             2 * (2 + (doc_id * 3) % 4) AS h,
             3 + doc_id % 6 AS n
      FROM documents
    ), t AS (
      SELECT doc_id, w, h,
             UNNEST(range(0, CAST(n AS INTEGER), 2)) AS t
      FROM d)
    SELECT doc_id AS media_id,
           CAST(t AS INTEGER) AS frame_idx,
           CAST(list_sum(flatten(list_transform(range(0, CAST(h AS INTEGER)),
             y -> list_transform(range(0, CAST(w AS INTEGER)),
               x -> (doc_id * 31 + t * 13 + y * 17 + x * 7) % 256))))
             AS BIGINT) AS y_sum
    FROM t
    """,
)
def x4_y4m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL keyframe extraction: decode only every 2nd frame of each real
    .y4m stream and emit one row per kept frame with its exact luma sum --
    the frame-sampling stage of a video training pipeline, on genuine
    container bytes (row-multiplying mapInPandas)."""
    from ..functions.multimodal import sample_y4m_frames, y4m_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return sample_y4m_frames(y4m_media(docs), stride=2)


@query(
    "x4_png_decode",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             9 + doc_id % 8 AS w,
             9 + (doc_id * 5) % 8 AS h,
             flatten(list_transform(
               range(0, CAST(9 + (doc_id * 5) % 8 AS INTEGER)),
               y -> list_transform(
                 range(0, CAST(9 + doc_id % 8 AS INTEGER)),
                 x -> (doc_id * 31 + y * 17 + x * 7) % 256))) AS p
      FROM documents)
    SELECT doc_id AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(8 AS INTEGER) AS bit_depth,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_sum(p) AS BIGINT) AS pixel_sum,
           CAST(list_max(p) AS INTEGER) AS pixel_max
    FROM px
    """,
)
def x4_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image codec end-to-end: synthesize genuine PNG files
    (zlib-deflated scanlines whose filter type CYCLES per row, CRC'd
    chunks) and decode them back with a real chunk walk + inflate +
    unfilter of all five PNG filter types -- no imaging library, stdlib
    zlib only. The pixel grid is a deterministic integer function of
    media_id, so the oracle re-derives every stat arithmetically: any
    chunk/CRC/inflate/unfilter bug hash-fails. Upgrades the compressed-
    image path from stubbed to real alongside WAV, PGM, and Y4M."""
    from ..functions.multimodal import synth_decode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return synth_decode_png(docs)  # r11: fused synth+decode, one Arrow stage


@query(
    "x4_image_ahash",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             8 + doc_id % 9 AS w,
             8 + (doc_id * 3) % 9 AS h
      FROM documents
    ), s AS (
      SELECT doc_id,
             flatten(list_transform(range(0, 8), i ->
               list_transform(range(0, 8), j ->
                 (doc_id * 31 + ((i * h) // 8) * 17 + ((j * w) // 8) * 7)
                 % 256))) AS sv
      FROM d
    ), t AS (
      SELECT doc_id, sv, list_sum(sv) AS total FROM s
    )
    SELECT doc_id AS media_id,
           CAST(list_sum(list_transform(range(0, 32), k ->
             CASE WHEN sv[CAST(k AS INTEGER) + 33] * 64 > total
                  THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT)
             AS hash_hi,
           CAST(list_sum(list_transform(range(0, 32), k ->
             CASE WHEN sv[CAST(k AS INTEGER) + 1] * 64 > total
                  THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT)
             AS hash_lo
    FROM t
    """,
)
def x4_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hash over REAL decoded pixels: the image analog of
    SimHash for near-duplicate IMAGE detection (the image-corpus dedup
    step). Each genuine PGM file decodes and hashes to 64 bits via a fixed
    8x8 nearest-neighbor sample grid thresholded at the grid mean -- exact
    integer arithmetic end-to-end, so unlike DCT pHash the hash itself is
    cross-engine oracle-checked (any decode OR hash bug fails). Pairing at
    hamming <= k uses the same pigeonhole banding as SimHash text dedup
    (locality + banding tested with planted noisy copies)."""
    from ..functions.multimodal import image_ahash, pgm_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return image_ahash(pgm_media(docs))


@query(
    "x4_audio_fingerprint",
    oracle="""
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
    ), e AS (
      SELECT doc_id,
        list_transform(range(0, 16), k ->
          list_sum(list_transform(
            range(CAST(k * n // 16 AS INTEGER),
                  CAST((k + 1) * n // 16 AS INTEGER)),
            i -> CAST(((doc_id * 31 + i * 7) % 256 - 128) * 256 AS BIGINT)
                 * (((doc_id * 31 + i * 7) % 256 - 128) * 256)))) AS ek
      FROM d
    ), t AS (
      SELECT doc_id, ek, list_sum(ek) AS total FROM e
    )
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS n_windows,
           CAST(list_sum(list_transform(range(0, 16), k ->
             CASE WHEN ek[CAST(k AS INTEGER) + 1] * 16 > total
                  THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT)
             AS fingerprint
    FROM t
    """,
)
def x4_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup fingerprint over REAL decoded PCM: each genuine WAV
    decodes (RIFF header + int16 frames) into a 16-bit windowed-energy
    signature -- bit k set when window k's exact integer energy exceeds
    the per-window average. The audio analog of x4_image_ahash, with the
    same property: the fingerprint is pure integer arithmetic, so the
    DuckDB oracle re-derives every bit and any decode OR windowing bug
    hash-fails. Banding the bits gives the bounded near-dup join."""
    from ..functions.multimodal import audio_fingerprint, wav_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return audio_fingerprint(wav_media(docs))


@query(
    "x7_multimodal_dedup_census",
    oracle="""
    WITH img AS (
      SELECT doc_id,
             8 + doc_id % 9 AS w,
             8 + (doc_id * 3) % 9 AS h
      FROM documents
    ), img_s AS (
      SELECT doc_id,
             flatten(list_transform(range(0, 8), i ->
               list_transform(range(0, 8), j ->
                 (doc_id * 31 + ((i * h) // 8) * 17 + ((j * w) // 8) * 7)
                 % 256))) AS sv
      FROM img
    ), img_sig AS (
      SELECT 'image' AS kind, doc_id,
             CAST(list_sum(list_transform(range(0, 32), k ->
               CASE WHEN sv[CAST(k AS INTEGER) + 33] * 64 > list_sum(sv)
                    THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS VARCHAR)
             || ':' ||
             CAST(list_sum(list_transform(range(0, 32), k ->
               CASE WHEN sv[CAST(k AS INTEGER) + 1] * 64 > list_sum(sv)
                    THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS VARCHAR)
               AS sig
      FROM img_s
    ), aud AS (
      SELECT doc_id, 64 + doc_id % 64 AS n FROM documents
    ), aud_e AS (
      SELECT doc_id,
        list_transform(range(0, 16), k ->
          list_sum(list_transform(
            range(CAST(k * n // 16 AS INTEGER),
                  CAST((k + 1) * n // 16 AS INTEGER)),
            i -> CAST(((doc_id * 31 + i * 7) % 256 - 128) * 256 AS BIGINT)
                 * (((doc_id * 31 + i * 7) % 256 - 128) * 256)))) AS ek
      FROM aud
    ), aud_sig AS (
      SELECT 'audio' AS kind, doc_id,
             CAST(list_sum(list_transform(range(0, 16), k ->
               CASE WHEN ek[CAST(k AS INTEGER) + 1] * 16 > list_sum(ek)
                    THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS VARCHAR)
               AS sig
      FROM aud_e
    ), txt_sig AS (
      SELECT 'text' AS kind, doc_id,
             CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ' '),
                   t -> CAST(LENGTH(t) * 17 + ascii(t[1:1]) AS BIGINT))),
               (acc, v) -> (acc * 31 + v) % 1000000007) AS VARCHAR) AS sig
      FROM documents
    ), allsig AS (
      SELECT kind, doc_id, sig FROM img_sig
      UNION ALL SELECT kind, doc_id, sig FROM aud_sig
      UNION ALL SELECT kind, doc_id, sig FROM txt_sig
    ), groups AS (
      SELECT kind, sig, COUNT(*) AS grp FROM allsig GROUP BY kind, sig
    )
    SELECT kind,
           CAST(SUM(grp) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS BIGINT) AS n_signatures,
           CAST(MAX(grp) AS BIGINT) AS max_group
    FROM groups GROUP BY kind
    """,
)
def x7_multimodal_dedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup census: ONE pipeline computes the modality-
    appropriate content signature for every item -- perceptual aHash for
    images, windowed-energy fingerprint for audio, rolling-hash
    fingerprint for text, each over the REAL codec path -- and reports
    per-modality collision structure (items, distinct signatures, largest
    collision group). The triage step before collapsing a mixed 100 TB
    media corpus; every signature is exact integer arithmetic, so the
    whole census is DuckDB-oracle-checked end-to-end."""
    from ..functions import text as TX
    from ..functions.multimodal import (
        audio_fingerprint,
        image_ahash,
        pgm_media,
        wav_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select("doc_id")
    img = image_ahash(pgm_media(ids)).select(
        F.lit("image").alias("kind"),
        F.concat_ws(
            ":", F.col("hash_hi").cast("string"), F.col("hash_lo").cast("string")
        ).alias("sig"),
    )
    aud = audio_fingerprint(wav_media(ids)).select(
        F.lit("audio").alias("kind"),
        F.col("fingerprint").cast("string").alias("sig"),
    )
    txt = docs.select(
        F.lit("text").alias("kind"),
        TX.doc_fingerprint(F.col("text")).cast("string").alias("sig"),
    )
    groups = (
        img.unionByName(aud)
        .unionByName(txt)
        .groupBy("kind", "sig")
        .agg(F.count("*").alias("grp"))
    )
    return groups.groupBy("kind").agg(
        F.sum("grp").cast("bigint").alias("n_items"),
        F.count("*").cast("bigint").alias("n_signatures"),
        F.max("grp").cast("bigint").alias("max_group"),
    )


@query(
    "x4_video_motion",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             2 * (2 + doc_id % 4) AS w,
             2 * (2 + (doc_id * 3) % 4) AS h,
             3 + doc_id % 6 AS n
      FROM documents
    ), t AS (
      SELECT doc_id, w, h,
             UNNEST(range(1, CAST(n AS INTEGER))) AS t
      FROM d)
    SELECT doc_id AS media_id,
           CAST(t AS INTEGER) AS frame_idx,
           CAST(list_sum(flatten(list_transform(range(0, CAST(h AS INTEGER)),
             y -> list_transform(range(0, CAST(w AS INTEGER)),
               x -> abs((doc_id * 31 + t * 13 + y * 17 + x * 7) % 256
                        - (doc_id * 31 + (t - 1) * 13 + y * 17 + x * 7)
                          % 256)))))
             AS BIGINT) AS luma_delta
    FROM t
    """,
)
def x4_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Motion-energy analysis over REAL decoded video: for every frame
    after the first, the exact integer sum of |Y_t - Y_{t-1}| over the
    luma plane -- the scene-cut / static-clip signal a video training
    pipeline filters on. Decodes genuine .y4m containers frame by frame;
    the oracle re-derives each delta arithmetically, so any frame-offset
    or plane-order bug hash-fails."""
    from ..functions.multimodal import y4m_frame_motion, y4m_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return y4m_frame_motion(y4m_media(docs))


@query(
    "x4_jpeg_decode",
    oracle="""
    WITH d AS (
      SELECT doc_id AS mid,
             16 + doc_id % 17 AS w,
             16 + (doc_id * 5) % 17 AS h
      FROM documents
    ), px AS (
      SELECT mid, w, h,
             flatten(list_transform(range(0, CAST(h AS INTEGER)), y ->
               list_transform(range(0, CAST(w AS INTEGER)), x ->
                 (32 + (mid * 31 + (y // 8) * 17 + (x // 8) * 7) % 160)
                 + (CASE WHEN (x % 4) IN (0, 3) THEN 1 ELSE -1 END)
                   * (CASE WHEN (y % 4) IN (0, 3) THEN 1 ELSE -1 END)
                   * ((mid + 3 * (x // 8) + 5 * (y // 8)) % 17)))) AS p
      FROM d)
    SELECT mid AS media_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(list_sum(p) AS BIGINT) AS pixel_sum,
           CAST(list_min(p) AS INTEGER) AS pixel_min,
           CAST(list_max(p) AS INTEGER) AS pixel_max,
           CAST(list_sum(list_transform(range(0, CAST(w * h AS INTEGER)),
             i -> p[CAST(i AS INTEGER) + 1] * (1 + i % 251))) AS BIGINT)
             AS wsum
    FROM px
    """,
)
def x4_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-image codec end-to-end, stdlib-only: synthesize genuine
    baseline JFIF streams (canonical-Huffman entropy coding with byte
    stuffing, zigzag, DC prediction, quant table of 8s) and decode them
    back with a full marker walk + Huffman decode + dequant + IDCT +
    edge-block crop -- no imaging library. Each 8x8 block is a constant
    level plus the (4,4) DCT basis (the only non-DC basis with rational
    +-1/2 cosines), so quantization is exactly lossless BY CONSTRUCTION
    and the oracle re-derives every pixel arithmetically: the
    position-weighted checksum pins each pixel to its (x, y), so any
    Huffman/marker/dequant/IDCT/crop bug hash-fails. Closes the last X4
    modality gap (JPEG-class lossy formats; cf. decode_png for the
    lossless sibling)."""
    from ..functions.multimodal import synth_decode_jpeg

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return synth_decode_jpeg(docs)  # r11: fused synth+decode, one Arrow stage


@query(
    "x4_jpeg_dc_thumbnail",
    oracle="""
    WITH d AS (
      SELECT doc_id AS mid,
             (16 + doc_id % 17 + 7) // 8 AS bw,
             (16 + (doc_id * 5) % 17 + 7) // 8 AS bh
      FROM documents
    ), px AS (
      SELECT mid, bw, bh,
             flatten(list_transform(range(0, CAST(bh AS INTEGER)), by ->
               list_transform(range(0, CAST(bw AS INTEGER)), bx ->
                 32 + (mid * 31 + by * 17 + bx * 7) % 160))) AS p
      FROM d)
    SELECT mid AS media_id,
           CAST(bw AS INTEGER) AS width,
           CAST(bh AS INTEGER) AS height,
           CAST(bw * bh AS BIGINT) AS n_pixels,
           CAST(list_sum(p) AS BIGINT) AS pixel_sum,
           CAST(list_min(p) AS INTEGER) AS pixel_min,
           CAST(list_max(p) AS INTEGER) AS pixel_max,
           CAST(list_sum(list_transform(range(0, CAST(bw * bh AS INTEGER)),
             i -> p[CAST(i AS INTEGER) + 1] * (1 + i % 251))) AS BIGINT)
             AS wsum
    FROM px
    """,
)
def x4_jpeg_dc_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JPEG DC-only fast path, the production thumbnail/triage trick:
    Huffman-decode each block just far enough to keep its DC term and
    SKIP the AC coefficients (no dequant matrix, no IDCT), reconstructing
    an 8x-downscaled image one pixel per block -- ~64x less inverse-
    transform work per image than a full decode, which is what makes
    corpus-scale visual triage affordable. On the DCT-representable
    fixtures each block's mean IS its c parameter (the checkerboard term
    integrates to zero), so the oracle re-derives every thumbnail pixel
    arithmetically and the position-weighted checksum pins the grid."""
    from ..functions.multimodal import decode_jpeg_thumbnail, jpeg_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_thumbnail(jpeg_media(docs))


# shared by x4_jpeg_color_decode and x4_jpeg_progressive_decode: the
# progressive fixtures carry the SAME quantized coefficients as the
# baseline color fixtures, so both decoders must reproduce the same
# arithmetically re-derived RGB grid
_JPEG_COLOR_ORACLE = """
    WITH d AS (
      SELECT doc_id AS mid,
             16 + doc_id % 17 AS w,
             16 + (doc_id * 5) % 17 AS h
      FROM documents
    ), pix AS (
      SELECT mid, w, h, UNNEST(range(0, CAST(w * h AS BIGINT))) AS i
      FROM d
    ), co AS (
      SELECT mid, w, h, i, i % w AS x, i // w AS y
      FROM pix
    ), sg AS (
      SELECT mid, w, h, i, x, y,
             CASE WHEN (x % 4) IN (0, 3) THEN 1 ELSE -1 END AS sx,
             CASE WHEN (y % 4) IN (0, 3) THEN 1 ELSE -1 END AS sy,
             x // 2 AS cx, y // 2 AS cy
      FROM co
    ), sg2 AS (
      SELECT mid, w, h, i, x, y, sx, sy, cx, cy,
             CASE WHEN (cx % 4) IN (0, 3) THEN 1 ELSE -1 END AS scx,
             CASE WHEN (cy % 4) IN (0, 3) THEN 1 ELSE -1 END AS scy,
             cx // 8 AS mbx, cy // 8 AS mby
      FROM sg
    ), pl AS (
      SELECT mid, w, h, i,
             (32 + (mid * 31 + (y // 8) * 17 + (x // 8) * 7) % 160)
               + sx * sy * ((mid + 3 * (x // 8) + 5 * (y // 8)) % 17) AS yv,
             2 * (48 + (mid * 13 + mby * 11 + mbx * 19) % 72)
               + scx * scy * 2 * ((mid + 7 * mbx + 3 * mby) % 8) - 128 AS cbd,
             2 * (44 + (mid * 17 + mby * 7 + mbx * 13) % 76)
               + scx * scy * 2 * ((mid + 5 * mbx + 7 * mby) % 8) - 128 AS crd
      FROM sg2
    ), rgb AS (
      SELECT mid, w, h, i,
             LEAST(255, GREATEST(0, yv
               + (91881 * crd + 32768 + 2147483648) // 65536 - 32768)) AS r,
             LEAST(255, GREATEST(0, yv
               + (-22554 * cbd - 46802 * crd + 32768 + 2147483648) // 65536
               - 32768)) AS g,
             LEAST(255, GREATEST(0, yv
               + (116130 * cbd + 32768 + 2147483648) // 65536 - 32768)) AS b
      FROM pl
    )
    SELECT mid AS media_id,
           CAST(MIN(w) AS INTEGER) AS width,
           CAST(MIN(h) AS INTEGER) AS height,
           CAST(MIN(w) * MIN(h) AS BIGINT) AS n_pixels,
           CAST(SUM(r) AS BIGINT) AS r_sum,
           CAST(SUM(g) AS BIGINT) AS g_sum,
           CAST(SUM(b) AS BIGINT) AS b_sum,
           CAST(LEAST(MIN(r), MIN(g), MIN(b)) AS INTEGER) AS chan_min,
           CAST(GREATEST(MAX(r), MAX(g), MAX(b)) AS INTEGER) AS chan_max,
           CAST(SUM(r * (1 + i % 251)) AS BIGINT) AS wsum_r,
           CAST(SUM(g * (1 + i % 251)) AS BIGINT) AS wsum_g,
           CAST(SUM(b * (1 + i % 251)) AS BIGINT) AS wsum_b
    FROM rgb
    GROUP BY mid
    """


@query("x4_jpeg_color_decode", oracle=_JPEG_COLOR_ORACLE)
def x4_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production image format, end-to-end in stdlib: synthesize real
    3-component YCbCr baseline JFIF streams with 4:2:0 subsampling
    (interleaved MCUs: 4 luma blocks + Cb + Cr, per-component
    Huffman/quant tables, three DC predictors) and decode them back --
    marker walk, per-component entropy decode, dequant, IDCT, chroma
    upsample by replication, fixed-point YCbCr->RGB. Per channel each
    block is a constant plus the (4,4) DCT basis and the chroma params
    are even (so the quant table of 16s divides exactly): quantization
    is lossless BY CONSTRUCTION per channel, and the oracle re-derives
    every RGB value arithmetically -- per-pixel Y/Cb/Cr synthesis plus
    the SAME 2^16 fixed-point conversion -- so any MCU-interleave,
    table-selection, predictor, upsample, or conversion bug hash-fails
    on the per-channel position-weighted checksums. Closes the r4
    grayscale-only gap (VERDICT r4 item 1)."""
    from ..functions.multimodal import synth_decode_jpeg_color

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return synth_decode_jpeg_color(docs)  # r11: fused synth+decode


@query("x4_jpeg_progressive_decode", oracle=_JPEG_COLOR_ORACLE)
def x4_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (SOF2) JPEG -- the other half of real-world JPEG
    (large web images are overwhelmingly progressive). Synthesizes real
    11-scan progressive 4:2:0 color streams (interleaved DC first +
    refinement, per-component AC spectral bands with EOBn run codes, AC
    successive-approximation refinement with correction bits per T.81
    G.1.2.3) and decodes them back through the multi-scan coefficient
    accumulator. The fixtures carry the SAME quantized coefficients as
    the baseline color fixtures, so the decode is losslessly pinned and
    the oracle is literally the x4_jpeg_color_decode oracle: any
    scan-sequencing, EOB-run, refinement-bit, predictor, or band bug
    hash-fails on the per-channel position-weighted checksums."""
    from ..functions.multimodal import synth_decode_jpeg_progressive

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return synth_decode_jpeg_progressive(docs)  # r11: fused synth+decode

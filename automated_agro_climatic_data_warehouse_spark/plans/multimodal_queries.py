"""Multimodal binary-column queries (north-star extension).

Both queries are fully oracle-checked. mm_feature_extract's features run
through the REAL Arrow mapInPandas decode path; the stub features are
md5-digest chunks scaled by 2^-32 (exact dyadic doubles), which DuckDB
reproduces with hex slicing — so the oracle verifies the whole
binary→Arrow→Python→features pipeline value-for-value. The crc32
checksum column (no DuckDB equivalent) is pinned by
tests/test_multimodal.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.multimodal import (
    documents_as_media,
    extract_features,
    resize_pool,
    sample_frames,
)
from ..sources import fan_out, load_table
from .registry import query


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           'text/plain' AS media_type
    FROM read_parquet('{sf}/documents.parquet')
    """,
    tags=("multimodal",),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads: byte length + digest —
    the schema/partitioning plumbing for image/audio columns, exercised on
    utf-8 payloads (no codecs in this container)."""
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.length("payload").alias("n_bytes"),
        F.md5(F.col("payload")).alias("digest"),
        "media_type",
    )


_FEATURE_SQL = ", ".join(
    f"CAST('0x' || substr(md5(text), {1 + 8 * i}, 8) AS BIGINT)"
    f" / 4294967296.0 AS f{i}"
    for i in range(4)
)


@query(
    "mm_feature_extract",
    oracle=f"""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           {_FEATURE_SQL}
    FROM read_parquet('{{sf}}/documents.parquet')
    """,
    tags=("multimodal", "pandas-udf"),
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode→feature-extract over binary payloads
    (operators/multimodal.py). Stubbed decode (deterministic md5-chunk
    features — exact dyadic doubles, so the oracle compares values, not
    just rows); plan shape identical to a real codec integration."""
    media = documents_as_media(fan_out(load_table(spark, sf_dir, "documents")))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(4)],
    )


@query(
    "mm_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS payload, text
      FROM read_parquet('{sf}/documents.parquet')
    ), meta AS (
      SELECT media_id, text,
             1 + octet_length(payload) % 240 AS n_frames
      FROM media
    )
    SELECT media_id, n_frames,
           CAST(idx AS INTEGER) AS frame_idx,
           md5(text || ':' || CAST(idx AS VARCHAR)) AS frame_md5
    FROM meta,
         unnest(generate_series(0, n_frames - 1,
                                CAST(ceil(n_frames / 8.0) AS BIGINT))) AS t(idx)
    """,
    tags=("multimodal", "pandas-udf", "video"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style strided frame sampling (operators/multimodal.py
    sample_frames): per-payload frame count from metadata, ≤8 evenly
    strided frames emitted as one row each through the Arrow mapInPandas
    fan-out. The frame 'grab' is the deterministic digest stub, so the
    oracle verifies ids, counts, stride arithmetic, and digests
    value-for-value."""
    media = documents_as_media(fan_out(load_table(spark, sf_dir, "documents")))
    return sample_frames(media)


@query(
    "mm_resize_pool",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, encode(text) AS payload
      FROM read_parquet('{sf}/documents.parquet')
    ), s AS (
      SELECT media_id, to_hex(payload) AS h,
             CAST(floor(sqrt(octet_length(payload))) AS BIGINT) AS side
      FROM m
    ), px AS (
      SELECT media_id, side, h, unnest(range(side * side)) AS i
      FROM s WHERE side >= 4
    ), b AS (
      SELECT media_id,
             ((i // side) * 4 // side) * 4 + ((i % side) * 4 // side) AS block,
             CAST(('0x' || substr(h, CAST(2 * i + 1 AS INT), 2)) AS BIGINT)
               AS byte
      FROM px
    )
    SELECT media_id, block, avg(byte) AS mean_px
    FROM b GROUP BY media_id, block
    """,
    tags=("multimodal", "pandas-udf", "image"),
)
def mm_resize_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-pool image 'resize' through the Arrow mapInPandas path
    (operators/multimodal.py resize_pool): payload bytes as a square
    uint8 grid pooled to 4x4 block means. Pooling is exact arithmetic
    (integer sums / exact counts), so the oracle replays the numpy path
    value-for-value via hex byte extraction — the decode stand-in is
    simulated, the resize math and the binary->Arrow->numpy plumbing are
    real. A codec integration swaps frombuffer for a PIL decode in the
    same signature."""
    media = documents_as_media(fan_out(load_table(spark, sf_dir, "documents")))
    return resize_pool(media)


@query(
    "mm_phash_dedup",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id, encode(text) AS payload
      FROM read_parquet('{sf}/documents.parquet')
      UNION ALL
      SELECT -(doc_id + 1), encode('X' || substr(text, 2))
      FROM read_parquet('{sf}/documents.parquet') WHERE doc_id % 10 = 0
    ), s AS (
      SELECT media_id, to_hex(payload) AS h,
             CAST(floor(sqrt(octet_length(payload))) AS BIGINT) AS side
      FROM m
    ), px AS (
      SELECT media_id, side, h, unnest(range(side * side)) AS i
      FROM s WHERE side >= 4
    ), b AS (
      SELECT media_id,
             ((i // side) * 4 // side) * 4 + ((i % side) * 4 // side) AS block,
             CAST(('0x' || substr(h, CAST(2 * i + 1 AS INT), 2)) AS BIGINT)
               AS byte
      FROM px
    ), blocks AS (
      SELECT media_id, block,
             CAST(sum(byte) AS BIGINT) AS bsum,
             CAST(count(*) AS BIGINT) AS bn
      FROM b GROUP BY media_id, block
    ), tot AS (
      SELECT media_id, CAST(sum(bsum) AS BIGINT) AS ts,
             CAST(sum(bn) AS BIGINT) AS tn
      FROM blocks GROUP BY media_id
    ), ph AS (
      SELECT blocks.media_id,
             CAST(sum(CASE WHEN bsum * tn > ts * bn
                      THEN CAST(1 AS BIGINT) << block ELSE 0 END)
                  AS BIGINT) AS phash
      FROM blocks JOIN tot ON tot.media_id = blocks.media_id
      GROUP BY blocks.media_id
    )
    SELECT phash, CAST(count(*) AS BIGINT) AS n_media,
           min(media_id) AS canonical_id,
           md5(string_agg(CAST(media_id AS VARCHAR), ',' ORDER BY media_id))
             AS member_digest
    FROM ph GROUP BY phash HAVING count(*) > 1
    """,
    tags=("multimodal", "dedup-exact", "phash"),
)
def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) dedup over binary media: payloads pool to
    a 4×4 block grid and bit b sets iff block b's mean exceeds the
    image mean — visually-near-identical payloads (here: injected
    copies with ONE byte flipped, shifting one block mean by ~1/12th of
    a pixel) collapse onto the SAME 16-bit hash even though their
    md5/bytes differ, which is exactly what byte-exact dedup cannot do.
    The bit derivation is the cross-multiplied INTEGER comparison
    bsum·N > S·bn — no division anywhere, so the fingerprint is
    engine-exact by construction. Plan: pixel expansion is a narrow
    codegen'd explode; two bounded re-aggregations (media×16 blocks,
    then media); the dup report is one groupBy on the hash — the same
    single-shuffle shape as exact dedup, applied to perceptual
    identity. Scale: a 64-bit phash (8×8 grid) + banded hamming join
    (dedup_simhash64_hamming's geometry) is the drop-in for
    tolerance > 0."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    mutated = docs.filter(F.col("doc_id") % 10 == 0).select(
        (-(F.col("doc_id") + 1)).alias("media_id"),
        F.encode(
            F.concat(F.lit("X"), F.substring("text", 2, 1_000_000)), "utf-8"
        ).alias("payload"),
    )
    m = fan_out(base.unionByName(mutated))
    s = m.select(
        "media_id",
        F.hex("payload").alias("h"),
        F.floor(F.sqrt(F.length("payload"))).cast("bigint").alias("side"),
    ).filter(F.col("side") >= 4)
    px = s.select(
        "media_id",
        "side",
        "h",
        F.explode(F.sequence(F.lit(0), F.col("side") * F.col("side") - 1)).alias(
            "i"
        ),
    )
    blk = (
        ((F.col("i") / F.col("side")).cast("bigint") * 4 / F.col("side")).cast(
            "bigint"
        )
        * 4
        + ((F.col("i") % F.col("side")) * 4 / F.col("side")).cast("bigint")
    )
    byte = F.conv(
        F.substring(F.col("h"), (2 * F.col("i") + 1).cast("int"), 2), 16, 10
    ).cast("bigint")
    blocks = (
        px.select("media_id", blk.alias("block"), byte.alias("byte"))
        .groupBy("media_id", "block")
        .agg(
            F.sum("byte").cast("bigint").alias("bsum"),
            F.count(F.lit(1)).cast("bigint").alias("bn"),
        )
    )
    tot = blocks.groupBy(F.col("media_id").alias("t_mid")).agg(
        F.sum("bsum").cast("bigint").alias("ts"),
        F.sum("bn").cast("bigint").alias("tn"),
    )
    ph = (
        blocks.join(tot, F.col("t_mid") == F.col("media_id"))
        .groupBy("media_id")
        .agg(
            F.sum(
                F.when(
                    F.col("bsum") * F.col("tn") > F.col("ts") * F.col("bn"),
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT), CAST(block AS INT))"
                    ),
                ).otherwise(F.lit(0).cast("bigint"))
            )
            .cast("bigint")
            .alias("phash")
        )
    )
    return (
        ph.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.min("media_id").alias("canonical_id"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.array_sort(F.collect_list(F.col("media_id"))).cast(
                        "array<string>"
                    ),
                )
            ).alias("member_digest"),
        )
        .filter(F.col("n_media") > 1)
    )


@query(
    "mm_audio_energy",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS payload
      FROM read_parquet('{sf}/documents.parquet')
    ), hx AS (
      SELECT media_id, to_hex(payload) AS h, octet_length(payload) AS n
      FROM media
    ), bytes AS (
      SELECT media_id, t.i - 1 AS off,
             CAST(('0x' || substr(h, 2 * t.i - 1, 2)) AS BIGINT) - 128 AS s
      FROM hx, UNNEST(generate_series(1, least(n, 512))) AS t(i)
    )
    SELECT media_id, CAST(off // 64 AS INTEGER) AS win_idx,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS INTEGER) AS peak
    FROM bytes GROUP BY media_id, win_idx
    """,
    tags=("multimodal", "audio", "dsp"),
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed loudness/silence primitives over raw audio-style bytes
    (operators/multimodal.audio_window_energy): PCM-u8 samples, 64-byte
    analysis windows (first 8), per-window energy Σ(b−128)² and peak —
    the pre-codec triage an audio ingest runs (drop silence, flag
    clipping) on the REAL Arrow mapInPandas path with numpy
    vectorization; exact int64 output lets DuckDB replay the whole
    bytes→windows→DSP chain from hex slices. Narrow stage: scales with
    input splits, bytes never leave executors, no shuffle before the
    per-window rows."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.multimodal import audio_window_energy

    return audio_window_energy(
        fan_out(documents_as_media(docs).select("media_id", "payload"))
    )


@query(
    "mm_scene_cuts",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS payload
      FROM read_parquet('{sf}/documents.parquet')
    ), hx AS (
      SELECT media_id, to_hex(payload) AS h, octet_length(payload) AS n
      FROM media
    ), bytes AS (
      SELECT media_id, t.i - 1 AS off,
             CAST(('0x' || substr(h, 2 * t.i - 1, 2)) AS BIGINT) - 128 AS s
      FROM hx, UNNEST(generate_series(1, least(n, 512))) AS t(i)
    ), win AS (
      SELECT media_id, CAST(off // 64 AS INTEGER) AS win_idx,
             CAST(sum(s * s) AS BIGINT) AS energy
      FROM bytes GROUP BY media_id, win_idx
    ), lagged AS (
      SELECT media_id, win_idx, energy,
             energy - lag(energy) OVER (PARTITION BY media_id
                                        ORDER BY win_idx) AS delta
      FROM win
    )
    SELECT media_id, win_idx, energy, CAST(delta AS BIGINT) AS delta,
           (abs(delta) > 20000) AS is_cut
    FROM lagged
    """,
    tags=("multimodal", "video", "scene-detection"),
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over frame-energy series — the shot-boundary
    primitive of a video curation pipeline (sample frames, score each,
    cut where consecutive scores jump). The per-window energies come
    from the REAL binary path (operators/multimodal.audio_window_energy:
    Arrow mapInPandas, numpy-vectorized, payloads never leave
    executors — a real codec swaps into the same signature); the
    boundary detector is then pure DataFrame algebra: one LAG window
    partitioned per media (frame counts are capped per payload, so
    partitions are bounded), delta in exact int64, and a fixed jump
    threshold (20000 ≈ a quarter of a typical window's energy here —
    the tuning knob a real pipeline calibrates per codec). First
    window of each media has NULL delta → NULL/false cut on both
    engines. Scale: narrow decode stage + one media-keyed shuffle,
    nothing global."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.multimodal import audio_window_energy

    win = audio_window_energy(
        fan_out(documents_as_media(docs).select("media_id", "payload"))
    ).select("media_id", "win_idx", "energy")
    w = W.partitionBy("media_id").orderBy("win_idx")
    lagged = win.select(
        "media_id",
        "win_idx",
        "energy",
        (F.col("energy") - F.lag("energy").over(w))
        .cast("bigint")
        .alias("delta"),
    )
    return lagged.select(
        "media_id",
        "win_idx",
        "energy",
        "delta",
        (F.abs(F.col("delta")) > 20000).alias("is_cut"),
    )

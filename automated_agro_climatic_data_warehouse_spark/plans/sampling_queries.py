"""Deterministic sampling operators (north-star extension — the sampling
legs a training-data pipeline needs: uniform corpus downsampling,
per-source stratified rates, and train/val/test splits).

All three use HASH-based selection, not rand(): md5 of the stable row key
gives a uniform value in [0, 2^32), and `hash % 100 < rate` keeps an
exact, engine-reproducible, re-run-stable subset. That determinism is the
point at 100 TB — a re-run (or a different engine) selects the SAME rows,
so samples are idempotent, auditable, and joinable across pipeline
stages. rand()-based sampling has none of those properties (and Spark's
`sample()` is per-partition-seeded, so even its reproducibility breaks
under repartitioning).

Every operator is a narrow map + filter: no shuffle, fully pushdown-
friendly, embarrassingly parallel — the cheapest possible 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import hash32
from ..sources import load_table
from .registry import query


def _pct(c: Column, salt: str) -> Column:
    """Deterministic uniform value in [0, 100) from a row key."""
    return hash32(F.concat(F.lit(salt + ":"), c.cast("string"))) % 100


def _pct_sql(expr: str, salt: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({expr} AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 100"
    )


@query(
    "sample_uniform_hash",
    oracle=f"""
    SELECT doc_id, source FROM read_parquet('{{sf}}/documents.parquet')
    WHERE {_pct_sql('doc_id', 'u')} < 10
    """,
    tags=("sampling",),
)
def sample_uniform_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic uniform sample by doc_id hash."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "source").filter(
        _pct(F.col("doc_id"), "u") < 10
    )


_STRATA_SQL = """CASE WHEN source IN ('src0', 'src1') THEN 60
         WHEN source IN ('src2', 'src3', 'src4') THEN 25
         ELSE 5 END"""


def _strata_rate(source: Column) -> Column:
    return (
        F.when(source.isin("src0", "src1"), 60)
        .when(source.isin("src2", "src3", "src4"), 25)
        .otherwise(5)
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, source FROM read_parquet('{{sf}}/documents.parquet')
      WHERE {_pct_sql('doc_id', 's')} < {_STRATA_SQL}
    )
    SELECT source, count(*) AS n_kept FROM kept GROUP BY source
    """,
    tags=("sampling", "stratified"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-source rates (up-weight scarce
    high-quality sources, down-weight bulk ones — the training-data mixing
    primitive). Rate lookup is a literal CASE: stays in codegen, no join.
    Emits per-source kept counts (≈ rate × stratum size)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        _pct(F.col("doc_id"), "s") < _strata_rate(F.col("source"))
    )
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


@query(
    "split_train_val_test",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             CASE WHEN {_pct_sql('doc_id', 'split')} < 80 THEN 'train'
                  WHEN {_pct_sql('doc_id', 'split')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM read_parquet('{{sf}}/documents.parquet')
    )
    SELECT split, count(*) AS n_docs FROM assigned GROUP BY split
    """,
    tags=("sampling", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by hash range.
    Hash-range (not modulo-class) splits compose: a later 'train' subsample
    re-hashes with a different salt, so split membership and subsampling
    stay independent."""
    docs = load_table(spark, sf_dir, "documents")
    p = _pct(F.col("doc_id"), "split")
    split = (
        F.when(p < 80, "train").when(p < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source AS cs, count(*) AS n_s
      FROM read_parquet('{{sf}}/documents.parquet') GROUP BY cs
    ), m AS (SELECT min(n_s) AS min_n FROM counts),
    rates AS (
      SELECT cs, n_s,
             CAST(floor(sqrt(CAST(m.min_n AS DOUBLE) / n_s) * 1048576)
                  AS BIGINT) AS keep_q
      FROM counts, m
    )
    SELECT d.doc_id, d.source, r.keep_q
    FROM read_parquet('{{sf}}/documents.parquet') d
    JOIN rates r ON r.cs = d.source
    WHERE CAST(('0x' || substr(md5('t:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 1048576 < r.keep_q
    """,
    tags=("sampling", "mixing", "pipeline"),
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source re-mixing (alpha = 0.5): keep-rate per
    source ∝ n_s^(alpha-1) = 1/sqrt(n_s), normalized so the RAREST
    source keeps 100% — the standard rebalancing that upweights
    low-resource sources/languages in a training mix without
    duplicating rows. Unlike `sample_stratified` the rates are COMPUTED
    FROM THE DATA (one vocabulary-of-sources groupBy, broadcast back),
    so the operator adapts as the corpus mix drifts. Selection is the
    same deterministic hash-threshold integer compare as every sampler
    here; the rate itself is bit-portable because sqrt is
    correctly-rounded IEEE on both engines and min_n/n_s, ·2^20, floor
    are all exact — no ln/pow in sight. Scale: two narrow passes + one
    broadcast join; no fact-sized shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy(F.col("source").alias("cs")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    m = counts.agg(F.min("n_s").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(m)).select(
        "cs",
        "n_s",
        F.floor(
            F.sqrt(F.col("min_n").cast("double") / F.col("n_s"))
            * F.lit(1048576)
        )
        .cast("bigint")
        .alias("keep_q"),
    )
    thresh = (
        hash32(F.concat(F.lit("t:"), F.col("doc_id").cast("string"))) % 1048576
    )
    return (
        docs.join(F.broadcast(rates), F.col("cs") == F.col("source"))
        .filter(thresh < F.col("keep_q"))
        .select("doc_id", "source", "keep_q")
    )


@query(
    "sample_importance_weighted",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en' THEN 4 WHEN lang = 'es' THEN 3
                  WHEN lang = 'de' THEN 2 ELSE 1 END AS w
      FROM read_parquet('{{sf}}/documents.parquet')
    )
    SELECT doc_id, lang, CAST(w AS BIGINT) AS w,
           CAST(w AS BIGINT) AS p_num, CAST(4 AS BIGINT) AS p_den
    FROM d
    WHERE {_pct_sql('doc_id', 'imp')} < w * 25
    """,
    tags=("sampling", "importance"),
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted subsampling: inclusion probability ∝ a
    per-row importance weight (here a language prior, w/4 for w in
    1..4), with the weight's Horvitz-Thompson correction (p_num/p_den)
    emitted alongside so downstream aggregates can reweight by 1/p and
    stay unbiased — the sampler a quality-aware training mix uses when
    keep-everything is unaffordable but rare-and-valuable rows must
    survive more often. Selection is the same deterministic
    hash-threshold integer compare as every sampler in this module
    (reproducible at any parallelism, no RNG state); entirely map-side,
    zero shuffles, and the weight column is pure expression arithmetic
    so Catalyst fuses the whole thing into the scan's codegen stage."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        F.when(F.col("lang") == "en", 4)
        .when(F.col("lang") == "es", 3)
        .when(F.col("lang") == "de", 2)
        .otherwise(1)
    )
    return (
        docs.select("doc_id", "lang", w.cast("bigint").alias("w"))
        .filter(_pct(F.col("doc_id"), "imp") < F.col("w") * 25)
        .select(
            "doc_id",
            "lang",
            "w",
            F.col("w").alias("p_num"),
            F.lit(4).cast("bigint").alias("p_den"),
        )
    )

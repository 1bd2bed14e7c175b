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

"""CDC / snapshot-diff queries (extension: recover explicit change sets
from the reference's snapshot-upsert world — the input SCD2 and
incremental consumers actually want).

Synthetic "today" snapshot derived deterministically from orders:
- every 500th order re-keyed to -(key+1) → inserts (and deletes of
  the original keys; strictly-negative keys are disjoint from the
  0..6M·sf key space at ANY scale factor, unlike a fixed additive
  offset — and unlike plain negation, which is a no-op for key 0)
- every 7th order's totalprice bumped     → updates
- everything else unchanged               → absent from the diff
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import ROW_FINGERPRINT_SQL, snapshot_diff
from ..sources import load_table
from .registry import query

_VALUE_COLS = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
               "o_orderpriority"]

_NEW_SNAPSHOT_SQL = """
      SELECT CASE WHEN o_orderkey % 500 = 0 THEN -(o_orderkey + 1)
                  ELSE o_orderkey END AS o_orderkey,
             o_custkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM read_parquet('{sf}/orders.parquet')
"""


def _new_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.when(F.col("o_orderkey") % 500 == 0, -(F.col("o_orderkey") + 1))
        .otherwise(F.col("o_orderkey"))
        .alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )


_FP = ROW_FINGERPRINT_SQL(_VALUE_COLS)

_CDC_ORACLE = f"""
    WITH old AS (
      SELECT o_orderkey, {_FP} AS old_fp
      FROM read_parquet('{{sf}}/orders.parquet')
    ), new AS (
      SELECT o_orderkey, {_FP} AS new_fp
      FROM ({_NEW_SNAPSHOT_SQL.strip()})
    )
    SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.old_fp IS NULL THEN 'insert'
                WHEN new.new_fp IS NULL THEN 'delete'
                WHEN old.old_fp <> new.new_fp THEN 'update' END AS change_type
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE (old.old_fp IS NULL OR new.new_fp IS NULL OR old.old_fp <> new.new_fp)
    """


@query("cdc_snapshot_diff", oracle=_CDC_ORACLE, tags=("cdc", "J7", "S11"))
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit change set between two snapshots (operators/cdc.py): one
    full-outer join on the key, update detection via a single map-side
    row fingerprint. Feeds SCD2 and partition-selective rewrites.
    Fingerprint backend: same SPARK_GRAFT_DEDUP_HASH switch as the dedup
    family — md5 (default, oracle parity) or xxhash64 (production)."""
    import os

    backend = os.environ.get("SPARK_GRAFT_DEDUP_HASH", "md5")
    old = load_table(spark, sf_dir, "orders")
    new = _new_snapshot(spark, sf_dir)
    return snapshot_diff(old, new, keys=["o_orderkey"], backend=backend)

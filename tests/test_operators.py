"""Behavioral unit tests for upsert/SCD2 operators — the edge cases the
oracle queries don't isolate (within-batch last-writer-wins, null-safe
change detection, repeated application idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators import (
    insert_if_absent,
    scd2_apply,
    upsert,
)


def test_upsert_last_writer_wins(spark):
    target = spark.createDataFrame([(1, "a", 10.0)], "k int, v string, x double")
    updates = spark.createDataFrame(
        [(1, "b", 1.0), (1, "c", 2.0), (2, "d", 3.0)], "k int, v string, x double"
    )
    out = upsert(target, updates, ["k"], order_by=["x"]).orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, "c"), (2, "d")]  # x=2.0 wins for k=1


def test_upsert_column_selective(spark):
    target = spark.createDataFrame([(1, "keep", 10.0)], "k int, v string, x double")
    updates = spark.createDataFrame([(1, "clobber", 99.0)], "k int, v string, x double")
    row = upsert(target, updates, ["k"], update_cols=["x"]).collect()[0]
    assert row.v == "keep" and row.x == 99.0


def test_upsert_idempotent_reapply(spark):
    target = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, x double")
    updates = spark.createDataFrame([(2, 21.0), (3, 30.0)], "k int, x double")
    once = upsert(target, updates, ["k"])
    twice = upsert(once, updates, ["k"])
    assert sorted((r.k, r.x) for r in twice.collect()) == [(1, 10.0), (2, 21.0), (3, 30.0)]


def test_insert_if_absent(spark):
    existing = spark.createDataFrame([("h1",)], "key_hash string")
    incoming = spark.createDataFrame([("h1", 1), ("h2", 2)], "key_hash string, v int")
    out = insert_if_absent(existing, incoming, "key_hash").collect()
    assert [(r.key_hash, r.v) for r in out] == [("h2", 2)]


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "nk string, attr string, effective_date date, expiration_date date, is_current boolean"
    )


def test_scd2_change_closes_and_inserts(spark):
    import datetime as dt

    dim = _dim(spark, [("k1", "old", dt.date(2024, 1, 1), None, True),
                       ("k2", "same", dt.date(2024, 1, 1), None, True)])
    incoming = spark.createDataFrame(
        [("k1", "new"), ("k2", "same"), ("k3", "brand")], "nk string, attr string"
    )
    out = scd2_apply(dim, incoming, "nk", ["attr"], "2024-06-01")
    rows = {(r.nk, r.attr, r.is_current): r for r in out.collect()}
    assert len(rows) == 4
    closed = rows[("k1", "old", False)]
    assert str(closed.expiration_date) == "2024-06-01"
    assert ("k1", "new", True) in rows
    assert ("k2", "same", True) in rows  # unchanged: single current row
    assert ("k3", "brand", True) in rows  # new key inserted


def test_scd2_null_safe_change_detection(spark):
    import datetime as dt

    dim = _dim(spark, [("k1", None, dt.date(2024, 1, 1), None, True)])
    incoming = spark.createDataFrame([("k1", "filled")], "nk string, attr string")
    out = scd2_apply(dim, incoming, "nk", ["attr"], "2024-06-01").collect()
    states = {(r.attr, r.is_current) for r in out}
    assert states == {(None, False), ("filled", True)}


def test_scd2_noop_batch(spark):
    import datetime as dt

    dim = _dim(spark, [("k1", "v", dt.date(2024, 1, 1), None, True)])
    incoming = spark.createDataFrame([("k1", "v")], "nk string, attr string")
    out = scd2_apply(dim, incoming, "nk", ["attr"], "2024-06-01").collect()
    assert len(out) == 1 and out[0].is_current


def test_quality_compiler_fires_on_injected_violations(spark, sf_dir):
    """Guard against a compiler that trivially reports zero: inject known
    violations and assert the exact counts come back."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.operators.quality import (
        DEFAULT_RULES,
        run_rules,
    )
    from automated_agro_climatic_data_warehouse_spark.sources import load_tables

    tables = load_tables(spark, sf_dir)
    li = tables["lineitem"]
    n_bad_qty = li.filter(F.col("l_orderkey") % 100 == 0).count()
    n_bad_flag = li.filter(F.col("l_orderkey") % 200 == 0).count()
    tables["lineitem"] = li.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 100 == 0, F.lit(999.0)).otherwise(F.col("l_quantity")),
    ).withColumn(
        "l_returnflag",
        F.when(F.col("l_orderkey") % 200 == 0, F.lit("Z")).otherwise(F.col("l_returnflag")),
    )
    res = {r.rule_name: r.violation_count
           for r in run_rules(spark, DEFAULT_RULES, tables).collect()}
    assert res["lineitem_quantity_range"] == n_bad_qty
    assert res["lineitem_flag_enum"] == n_bad_flag
    assert res["orders_status_enum"] == 0


def test_hof_single_transform_matches_exploded_hash(spark):
    """Engine-trust guard for the HOF patterns we rely on: a SINGLE
    `F.transform` lambda must hash identically to the exploded row-wise
    computation. (Spark 4.1.2 silently mis-binds MULTIPLE structurally
    identical transform lambdas that differ only in a captured literal —
    see operators/dedup.py minhash_signatures docstring — so the
    codebase only ever puts one such lambda in a projection; this test
    pins the correctness of the shape we do use.)"""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, ["abc", "def", "ghi"])], "id int, arr array<string>")
    single = df.select(
        F.transform("arr", lambda s: F.xxhash64(F.lit(1), s)).alias("h")
    ).collect()[0].h
    exploded = [
        r.h
        for r in df.select(F.explode("arr").alias("s"))
        .select(F.xxhash64(F.lit(1), F.col("s")).alias("h"))
        .collect()
    ]
    assert list(single) == exploded

"""Source-format robustness: CSV round-trip with malformed-row handling.

The engine's primary at-rest format is parquet; CSV is the interchange
format users bring. The contract pinned here: a schema'd CSV read
round-trips values exactly, and PERMISSIVE mode quarantines a malformed
row into _corrupt_record without killing the load (the same
one-bad-record-never-kills-the-load posture as s16's JSON recovery).
"""

from __future__ import annotations


def test_csv_round_trip_and_permissive_corrupt_row(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    csv_dir = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(csv_dir)

    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = spark.read.option("header", True).schema(schema).csv(csv_dir)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }

    # inject a malformed row (non-numeric key, wrong arity)
    bad = tmp_path / "nation_csv" / "zz_bad.csv"
    bad.write_text("n_nationkey,n_name,n_regionkey\nnot_a_number,X\n")
    schema_c = schema.add("_corrupt_record", T.StringType())
    permissive = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema_c)
        .csv(csv_dir)
        .cache()
    )
    good = permissive.filter(F.col("_corrupt_record").isNull())
    quarantined = permissive.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == src.count()
    assert quarantined.count() == 1
    assert "not_a_number" in quarantined.collect()[0]._corrupt_record


def test_jsonlines_round_trip_and_permissive_corrupt_line(spark, tmp_path):
    """JSON-lines: schema'd reads round-trip exactly; PERMISSIVE mode
    quarantines a syntactically-broken line (same posture as the CSV
    twin above and s16's JSON payload recovery)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    jdir = str(tmp_path / "region_json")
    src.write.json(jdir)

    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).json(jdir)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }

    bad = tmp_path / "region_json" / "zz_bad.json"
    bad.write_text('{"r_regionkey": 99, "r_name": "BROKEN"\n')
    schema_c = schema.add("_corrupt_record", T.StringType())
    permissive = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema_c)
        .json(jdir)
        .cache()
    )
    assert permissive.filter(F.col("_corrupt_record").isNull()).count() == src.count()
    quarantined = permissive.filter(F.col("_corrupt_record").isNotNull())
    assert quarantined.count() == 1


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC is Spark's other built-in columnar at-rest format (Hive
    estates bring it the way warehouses bring parquet). Contract: a
    full-fidelity round-trip of typed columns INCLUDING decimals and
    dates, and filter pushdown reaching the ORC scan (searchable
    argument), so migrating a parquet pipeline to ORC input keeps both
    values and scan pruning."""
    from pyspark.sql import functions as F

    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orc_dir = str(tmp_path / "orders_orc")
    src.write.orc(orc_dir)
    back = spark.read.orc(orc_dir)
    assert back.schema == src.schema
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }
    plan = (
        back.filter(F.col("o_orderkey") == 1)
        .select("o_orderkey", "o_totalprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pushed filter + column pruning must reach the ORC scan
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split(
        "PushedFilters"
    )[1][:120]
    assert "ReadSchema" in plan


def test_parquet_codec_zstd_roundtrip_smaller(spark, tmp_path):
    """Storage efficiency is a first-order cost at 100 TB: zstd
    compresses harder than the snappy default at similar scan speed.
    Contract: per-write codec override round-trips exactly, and on this
    text-heavy table zstd output is strictly smaller than snappy."""
    import pathlib

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sizes = {}
    for codec in ("snappy", "zstd"):
        out = str(tmp_path / codec)
        src.write.option("compression", codec).parquet(out)
        back = spark.read.parquet(out)
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in src.collect()
        }
        sizes[codec] = sum(
            f.stat().st_size
            for f in pathlib.Path(out).glob("*.parquet")
        )
    assert sizes["zstd"] < sizes["snappy"], sizes


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Long-lived tables grow columns: files written before a column
    existed must read as NULL for it, and the union schema must appear
    only when asked (mergeSchema) — the contract that lets a 100 TB
    table evolve in place without rewriting history."""
    from pyspark.sql import functions as F

    old = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit("v1").alias("payload")
    )
    new = spark.range(5, 10).select(
        F.col("id").alias("k"),
        F.lit("v2").alias("payload"),
        F.lit(42).alias("added_metric"),
    )
    out = str(tmp_path / "evolving")
    old.write.parquet(out)
    new.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"k", "payload", "added_metric"}
    rows = {r.k: r.added_metric for r in merged.collect()}
    assert all(rows[k] is None for k in range(5))
    assert all(rows[k] == 42 for k in range(5, 10))

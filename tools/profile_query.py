"""Per-job/per-stage profile of one registry query (guide §1: measure
first). Runs the query at $SPARK_GRAFT_SF_DIR with the event log on,
then parses the log to attribute wall-clock to jobs and stages —
the local[N] stand-in for the Spark UI's stage page.

Usage: python tools/profile_query.py <query> [more queries...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default all cores)
       PROFILE_WARM=0     skip the sf0.001 warm-up pass
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

EVDIR = "/tmp/spark-events-profile"


def get_profiling_spark():
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_DEDUP_HASH", "xxhash64")
    from automated_agro_climatic_data_warehouse_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    from pyspark.sql import SparkSession

    builder_patch = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
    }
    # reuse the factory's config by building through it, then asserting the
    # event log landed (getOrCreate would ignore new confs on a live session)
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    os.environ["_PROFILE_EXTRA"] = json.dumps(builder_patch)
    import automated_agro_climatic_data_warehouse_spark.session as sess

    orig = sess.get_spark

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        # this box has no zstd binary/module to read a compressed log back
        .config("spark.eventLog.compress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    _ = orig  # keep the factory import alive for parity of confs
    return spark


def profile(names: list[str]) -> None:
    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
    from automated_agro_climatic_data_warehouse_spark.session import (
        drop_checkpoint_blocks,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_profiling_spark()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        if os.environ.get("PROFILE_WARM", "1") != "0":
            QUERIES[name].spark_fn(spark, warm_dir).count()
            drop_checkpoint_blocks(spark)
        spark.sparkContext.setJobDescription(f"TIMED::{name}")
        t0 = time.time()
        n = QUERIES[name].spark_fn(spark, sf_dir).count()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        drop_checkpoint_blocks(spark)
        print(f"\n=== {name}: {n} rows, wall {wall:.2f}s ===")
    spark.stop()
    time.sleep(1.0)
    report(names)


def report(names: list[str]) -> None:
    logs = glob.glob(EVDIR + "/*")
    assert logs, "no event log written"
    path = max(logs, key=os.path.getmtime)
    if os.path.isdir(path):
        inner = [p for p in glob.glob(path + "/*") if "events" in os.path.basename(p)]
        assert inner, f"no events file under {path}"
        path = max(inner, key=os.path.getmtime)
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if path.endswith(".zstd"):
        import io
        import subprocess

        raw_bytes = subprocess.run(
            ["zstd", "-dc", path], capture_output=True, check=True
        ).stdout
        fh_ctx = io.StringIO(raw_bytes.decode("utf-8", "replace"))
    else:
        fh_ctx = open(path)
    with fh_ctx as fh:
        for raw in fh:
            try:
                ev = json.loads(raw)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                t0 = si.get("Submission Time")
                t1 = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "ms": (t1 - t0) if (t0 and t1) else 0,
                    "tasks": si.get("Number of Tasks", 0),
                }
    for name in names:
        tagged = [
            j for j in jobs.values() if j.get("desc") == f"TIMED::{name}"
        ]
        total_ms = sum(j.get("t1", j["t0"]) - j["t0"] for j in tagged)
        print(f"\n##### {name}: {len(tagged)} jobs, {total_ms/1000:.2f}s in jobs")
        for j in sorted(tagged, key=lambda j: j["t0"]):
            dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000
            sts = [
                (stages[s]["ms"], stages[s]["tasks"], stages[s]["name"])
                for s in j["stages"]
                if s in stages
            ]
            sts.sort(reverse=True)
            head = "; ".join(
                f"{ms}ms/{tk}t {nm.split(' at ')[0][:60]}" for ms, tk, nm in sts[:4]
            )
            print(f"  job {dur:6.2f}s  [{head}]")


if __name__ == "__main__":
    qnames = [a for a in sys.argv[1:] if not a.startswith("-")]
    profile(qnames)

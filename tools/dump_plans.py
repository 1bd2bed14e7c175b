"""Dump `.explain("formatted")` output for named queries to files.

Usage:
    python tools/dump_plans.py <repo_root> <sf_dir> <out_dir> <suffix> <q1> [q2 ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. <repo_root> is
prepended to sys.path so the tool can run against a git worktree of an
older commit (for "_before" plans) as well as against HEAD.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo_root)

    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
    from automated_agro_climatic_data_warehouse_spark.session import get_spark

    spark = get_spark("dump_plans")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name].spark_fn(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()

"""DuckDB-oracle comparison harness (local replica of the driver's gate).

Compares a Spark result against its DuckDB oracle: row count, column-name
set, and order-insensitive value multiset with columns sorted by name —
the same contract the driver applies at sf0.01.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from .sources import TABLES


def _norm(v):
    """Normalize a cell to an engine-agnostic canonical form."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(row[i]) for i in order) for row in rows)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark, spec, sf_dir: str, con=None) -> list[str]:
    """Run one QuerySpec both ways; return a list of problems (empty = OK)."""
    sdf = spec.spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return []  # rows-only check: spark side ran without error
    con = con or duckdb_conn(sf_dir)
    ores = con.execute(spec.oracle.replace("{sf}", sf_dir))
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    problems = []
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if sorted(scols) != sorted(ocols):
        problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
    if not problems:
        sm, om = multiset(srows, scols), multiset(orows, ocols)
        if sm != om:
            for a, b in zip(sm, om):
                if a != b:
                    problems.append(f"first diff: spark={a!r} oracle={b!r}")
                    break
            else:
                problems.append("value multiset differs")
    return problems

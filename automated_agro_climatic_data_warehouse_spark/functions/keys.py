"""Deterministic key functions (SURVEY §2.8 F1-F3).

The reference mints SERIAL surrogate keys whose values depend on insertion
order (db/init/01-schema.sql:13,58,...) — non-reproducible across runs. We
use its own natural-key hashing idea (etl/transform/transformers.py:77-79)
for *every* key, so any run at any parallelism produces identical keys —
a requirement for order-insensitive correctness hashing and for idempotent
re-runs at 100 TB (no coordination, no sequence bottleneck).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def location_hash(lat: Column, lon: Column) -> Column:
    """MD5 natural key over 6-decimal-formatted coordinates.

    Format parity with the reference (`md5(f"{lat:.6f},{lon:.6f}")`,
    etl/transform/transformers.py:77-79) matters: the hash IS the join key.
    """
    return F.md5(F.format_string("%.6f,%.6f", lat, lon))


def natural_key(*cols: Column | str) -> Column:
    """MD5 over ':'-joined column values — generic dimension natural key."""
    return F.md5(F.concat_ws(":", *cols))


def idempotency_key(entity_type: Column | str, entity_key: Column | str) -> Column:
    """SHA-256 over 'type:key' (reference etl/utils/database.py:51-52)."""
    et = F.lit(entity_type) if isinstance(entity_type, str) else entity_type
    return F.sha2(F.concat_ws(":", et, entity_key), 256)


def date_key(d: Column) -> Column:
    """DATE → YYYYMMDD int (reference etl/transform/transformers.py:42)."""
    return F.date_format(d, "yyyyMMdd").cast("int")


def date_key_decode(k: Column) -> Column:
    """YYYYMMDD int → DATE (reference tests/test_workflows.py:300-301)."""
    return F.to_date(k.cast("string"), "yyyyMMdd")

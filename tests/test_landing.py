"""Landing-layer: retry policy behavior (S9) — no real HTTP anywhere."""

from __future__ import annotations

import pytest

from automated_agro_climatic_data_warehouse_spark.sources.landing import (
    RetryPolicy,
    fetch_with_retry,
)


def test_retry_succeeds_after_failures():
    calls, sleeps = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionError("503")
        return {"ok": True}

    out = fetch_with_retry(flaky, RetryPolicy(), sleep=sleeps.append)
    assert out == {"ok": True}
    assert len(calls) == 3
    assert sleeps == [1.0, 2.0]  # 2^0, 2^1 — reference backoff shape


def test_retry_exhausts_and_raises():
    def always_down():
        raise ConnectionError("503")

    with pytest.raises(ConnectionError):
        fetch_with_retry(always_down, RetryPolicy(max_attempts=2), sleep=lambda s: None)


def test_malformed_payloads_yield_nulls(spark):
    """Bad/missing JSON degrades to NULL columns, never a task crash
    (reference soil_api.py:94-99 logs-and-continues)."""
    from automated_agro_climatic_data_warehouse_spark.sources.landing import (
        parse_soil_payload,
    )

    bad = spark.createDataFrame(
        [(1, '{"properties": {"layers": []}}'), (2, "not json at all"), (3, None)],
        "id int, payload string",
    )
    rows = parse_soil_payload(bad).collect()
    assert len(rows) == 3
    assert all(r.clay_0_5cm is None and r.ph_0_5cm is None for r in rows)

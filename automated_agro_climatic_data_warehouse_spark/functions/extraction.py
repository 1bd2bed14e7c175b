"""Regex entity extraction (SURVEY §2.8 F18-F21, §2.9) + confidence (A7).

The reference's NLP extractor (etl/transform/nlp_extractor.py:36-58) keeps
4 ordered regex patterns per entity and returns the first match whose value
passes a validity gate. Natively: `coalesce` of gated `regexp_extract`
casts, in pattern-priority order — pure JVM expressions.

Known semantic divergence (SURVEY §7.4): when an earlier pattern matches
with an INVALID value, the reference keeps scanning later occurrences of
the same pattern; the coalesce form instead falls through to the next
pattern. `extract_requirements_udf` below provides the exact-fidelity
Pandas-UDF path for when that matters.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUM = r"([0-9]+(?:\.[0-9]+)?)"

# pattern groups, priority-ordered (reference nlp_extractor.py:36-58).
# Written fresh in the RE2 ∩ Java common dialect ((?i) inline flag works in
# both engines).
TEMP_RANGE_PATTERNS = [
    rf"(?i)temperatures? (?:of |between )?{NUM}\s*(?:°C|C)? (?:to|and|-) {NUM}\s*(?:°C|C)",
    rf"(?i)optimal temperature range {NUM}\s*-\s*{NUM}",
    rf"(?i){NUM}\s*°C\s*(?:to|-)\s*{NUM}\s*°C",
]
WATER_PATTERNS = [
    rf"(?i){NUM}\s*(?:to|-|and)\s*{NUM}\s*mm (?:of water )?(?:per|/|a) day",
    rf"(?i)about {NUM}\s*-\s*{NUM}\s*mm per day",
    rf"(?i){NUM}\s*mm (?:of water )?(?:per|/|a) day",
]
SUN_PATTERNS = [
    rf"(?i)(?:full )?sun(?:light)? (?:exposure )?of {NUM}\s*(?:to|-|and)\s*{NUM}\s*(?:hours|hrs)",
    rf"(?i){NUM}\s*(?:to|-)\s*{NUM}\s*(?:hours|hrs) (?:of )?(?:sun|light|daylight)",
    rf"(?i){NUM}\s*(?:hours|hrs) of (?:sun|light)",
]
PH_PATTERNS = [
    rf"(?i)pH (?:of |between |range )?{NUM}\s*(?:to|and|-)\s*{NUM}",
    rf"(?i)pH {NUM}",
]

GATES = {
    "temp": (-10.0, 50.0),
    "water": (0.1, 50.0),
    "sun": (0.0, 24.0),
    "ph": (3.0, 9.0),
}


def _gated(text: Column, pattern: str, group: int, lo: float, hi: float) -> Column:
    v = F.regexp_extract(text, pattern, group)
    d = F.when(v == "", None).otherwise(v).cast("double")
    return F.when(d.between(lo, hi), d)


def extract_range(text: Column, patterns: list[str], gate: tuple[float, float]) -> tuple[Column, Column]:
    """First-valid-match (min, max) pair across priority-ordered two-group
    patterns. A pattern contributes only if BOTH ends pass the gate, so the
    coalesce can't pair group-1 of one pattern with group-2 of another."""
    lo, hi = gate
    mins, maxs = [], []
    for p in patterns:
        g1 = _gated(text, p, 1, lo, hi)
        g2 = _gated(text, p, 2, lo, hi)
        both = g1.isNotNull() & g2.isNotNull()
        mins.append(F.when(both, F.least(g1, g2)))
        maxs.append(F.when(both, F.greatest(g1, g2)))
    return F.coalesce(*mins), F.coalesce(*maxs)


def extract_temp_range(text: Column) -> tuple[Column, Column]:
    return extract_range(text, TEMP_RANGE_PATTERNS, GATES["temp"])


def extract_ph_range(text: Column) -> tuple[Column, Column]:
    """Two-group range pattern first; single-value 'pH 6.5' fallback maps
    to min=max (reference nlp_extractor.py:166-178)."""
    lo, hi = GATES["ph"]
    g1 = _gated(text, PH_PATTERNS[0], 1, lo, hi)
    g2 = _gated(text, PH_PATTERNS[0], 2, lo, hi)
    both = g1.isNotNull() & g2.isNotNull()
    single = _gated(text, PH_PATTERNS[1], 1, lo, hi)
    return (
        F.coalesce(F.when(both, F.least(g1, g2)), single),
        F.coalesce(F.when(both, F.greatest(g1, g2)), single),
    )


def extract_water_mm_day(text: Column) -> Column:
    """Midpoint of the matched range, or the single value (reference
    nlp_extractor.py:132-144)."""
    lo, hi = GATES["water"]
    rng_lo = _gated(text, WATER_PATTERNS[0], 1, lo, hi)
    rng_hi = _gated(text, WATER_PATTERNS[0], 2, lo, hi)
    about_lo = _gated(text, WATER_PATTERNS[1], 1, lo, hi)
    about_hi = _gated(text, WATER_PATTERNS[1], 2, lo, hi)
    single = _gated(text, WATER_PATTERNS[2], 1, lo, hi)
    return F.coalesce(
        (rng_lo + rng_hi) / 2.0, (about_lo + about_hi) / 2.0, single
    )


def extract_sunlight_hours(text: Column) -> Column:
    """Range midpoint, single value, else qualitative fallback
    ('full sun' → 6.0, 'partial shade' → 3.0; reference
    nlp_extractor.py:146-164)."""
    lo, hi = GATES["sun"]
    r1l = _gated(text, SUN_PATTERNS[0], 1, lo, hi)
    r1h = _gated(text, SUN_PATTERNS[0], 2, lo, hi)
    r2l = _gated(text, SUN_PATTERNS[1], 1, lo, hi)
    r2h = _gated(text, SUN_PATTERNS[1], 2, lo, hi)
    single = _gated(text, SUN_PATTERNS[2], 1, lo, hi)
    qualitative = F.when(
        F.lower(text).contains("full sun"), 6.0
    ).when(F.lower(text).contains("partial shade"), 3.0)
    return F.coalesce((r1l + r1h) / 2.0, (r2l + r2h) / 2.0, single, qualitative)


def confidence_score(
    temp_found: Column, water_found: Column, sun_found: Column, ph_found: Column,
    evidence_count: Column,
) -> Column:
    """Weighted confidence with capped evidence bonus (reference
    nlp_extractor.py:180-196): 0.3·temp + 0.3·water + 0.2·sun + 0.2·ph
    + min(0.05·evidence, 0.2), capped at 1.0."""
    b = lambda c: F.when(c, 1.0).otherwise(0.0)  # noqa: E731
    return F.least(
        F.lit(1.0),
        0.3 * b(temp_found)
        + 0.3 * b(water_found)
        + 0.2 * b(sun_found)
        + 0.2 * b(ph_found)
        + F.least(0.05 * evidence_count, F.lit(0.2)),
    )


# ------------------------------------------------- exact-fidelity UDF path

_REQ_SCHEMA = T.StructType(
    [
        T.StructField("temp_min_c", T.DoubleType()),
        T.StructField("temp_max_c", T.DoubleType()),
        T.StructField("water_mm_day", T.DoubleType()),
        T.StructField("sunlight_hours", T.DoubleType()),
        T.StructField("ph_min", T.DoubleType()),
        T.StructField("ph_max", T.DoubleType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)


def _first_valid_pair(text: str, patterns: list[str], lo: float, hi: float):
    """Reference semantics (nlp_extractor.py:117-130): scan each pattern's
    *every* occurrence in order; first occurrence whose values pass the
    gate wins."""
    for pat in patterns:
        for m in re.finditer(pat, text):
            vals = [float(g) for g in m.groups() if g is not None]
            if vals and all(lo <= v <= hi for v in vals):
                if len(vals) == 1:
                    return vals[0], vals[0]
                return min(vals), max(vals)
    return None, None


@F.pandas_udf(_REQ_SCHEMA)
def extract_requirements_udf(texts: pd.Series) -> pd.DataFrame:
    """Arrow-batched struct-returning extraction — the UDTF-like one-row →
    many-fields shape (SURVEY §2.9). Use when exact first-match-wins
    fidelity matters; the native coalesce path is the fast default."""
    rows = []
    for text in texts:
        text = text or ""
        tmin, tmax = _first_valid_pair(text, TEMP_RANGE_PATTERNS, *GATES["temp"])
        wlo, whi = _first_valid_pair(text, WATER_PATTERNS, *GATES["water"])
        water = (wlo + whi) / 2.0 if wlo is not None else None
        slo, shi = _first_valid_pair(text, SUN_PATTERNS, *GATES["sun"])
        sun = (slo + shi) / 2.0 if slo is not None else None
        if sun is None:
            low = text.lower()
            sun = 6.0 if "full sun" in low else (3.0 if "partial shade" in low else None)
        plo, phi = _first_valid_pair(text, PH_PATTERNS, *GATES["ph"])
        evidence = sum(x is not None for x in (tmin, water, sun, plo))
        conf = min(
            1.0,
            0.3 * (tmin is not None)
            + 0.3 * (water is not None)
            + 0.2 * (sun is not None)
            + 0.2 * (plo is not None)
            + min(0.05 * evidence, 0.2),
        )
        rows.append((tmin, tmax, water, sun, plo, phi, conf))
    return pd.DataFrame(rows, columns=[f.name for f in _REQ_SCHEMA.fields])

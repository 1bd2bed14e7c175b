"""Data-cleaning column functions (SURVEY §2.8 F5-F17).

Every reference cleaning routine (etl/transform/cleaners.py) re-expressed as
native Column expressions — JVM-side, whole-stage-codegen'd, no Python in
the hot path. The text-heavy ops (F13-F17) are chained regexp_replace;
patterns are written in the RE2 ∩ Java-regex common dialect so the same
pattern string runs identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- numerics


def clamp(c: Column, lo: float, hi: float) -> Column:
    """Clamp to [lo, hi] (reference `_clamp`, etl/transform/cleaners.py:526-530)."""
    return F.greatest(F.lit(float(lo)), F.least(F.lit(float(hi)), c))


def scrub_nan_inf(c: Column) -> Column:
    """NaN/±Inf → NULL (reference etl/transform/cleaners.py:415-426)."""
    return F.when(
        F.isnan(c) | (c == float("inf")) | (c == float("-inf")), F.lit(None)
    ).otherwise(c)


def fix_ph_scale(ph: Column) -> Column:
    """SoilGrids delivers pH ×10 (65 → 6.5). Descaling rule per the
    documented intent (etl/transform/cleaners.py:388-399): values in
    (14, 140] are treated as ×10-scaled.

    Divergence from reference noted in SURVEY §7.4: the reference's
    `ph_raw / 10 if ph_raw else None` drops a legitimate 0.0; we keep 0.0.
    """
    return F.when((ph > 14.0) & (ph <= 140.0), ph / 10.0).otherwise(ph)


def fahrenheit_to_celsius_if_needed(t: Column) -> Column:
    """Temps > 60 are assumed °F and converted (reference
    etl/transform/cleaners.py:401-413): (v-32)*5/9."""
    return F.when(t > 60.0, (t - 32.0) * 5.0 / 9.0).otherwise(t)


def fraction_to_percent(c: Column) -> Column:
    """0-1-scale fractions → 0-100 percents (reference cleaners.py:375-386).
    Values ≤ 1 are fraction-scaled; the 0/1 ambiguity resolves to percent
    only when any sibling column exceeds 1 — callers decide; this is the
    per-value rule."""
    return F.when((c >= 0.0) & (c <= 1.0), c * 100.0).otherwise(c)


def normalize_water_mm_day(v: Column) -> Column:
    """Water-requirement normalization to mm/day (reference
    cleaners.py:428-443): values < 2 are cm/day (×10); values > 20 are
    weekly totals (÷7)."""
    return (
        F.when(v < 2.0, v * 10.0)
        .when(v > 20.0, v / 7.0)
        .otherwise(v)
    )


def ordered_pair(a: Column, b: Column) -> tuple[Column, Column]:
    """Min/max swap repair (reference cleaners.py:280-283): returns
    (least, greatest) so max ≥ min always holds."""
    return F.least(a, b), F.greatest(a, b)


# ---------------------------------------------------------------- labeling

# crop-name canonicalization map (reference cleaners.py:445-479 keeps a
# ~20-entry synonym dict; representative entries, extensible)
CROP_SYNONYMS = {
    "corn": "Maize",
    "zea mays": "Maize",
    "maize": "Maize",
    "wheat": "Wheat",
    "triticum aestivum": "Wheat",
    "rice": "Rice",
    "oryza sativa": "Rice",
    "soybean": "Soybean",
    "soya": "Soybean",
    "glycine max": "Soybean",
    "potato": "Potato",
    "solanum tuberosum": "Potato",
}


def canonical_crop_name(name: Column) -> Column:
    """lower/strip → synonym map → initcap fallback (reference
    cleaners.py:445-479). The map is a literal MapType column — broadcast
    by value inside the plan, no join needed."""
    kv = []
    for k, v in CROP_SYNONYMS.items():
        kv.extend([F.lit(k), F.lit(v)])
    mapping = F.create_map(*kv)
    key = F.lower(F.trim(name))
    return F.coalesce(F.element_at(mapping, key), F.initcap(key))


def usda_texture(clay: Column, sand: Column, silt: Column) -> Column:
    """Simplified USDA texture-triangle classifier (reference
    cleaners.py:481-511 / soil_api.py:118-139): nested threshold rules over
    composition percents normalized to sum 100. Pure column arithmetic —
    no UDF.

    Divergence (SURVEY §7.4): the reference treats a legitimate 0.0
    component as missing (`if not all([clay, sand, silt])`); we only treat
    NULLs as missing."""
    total = clay + sand + silt
    n_clay = clay / total * 100.0
    n_sand = sand / total * 100.0
    n_silt = silt / total * 100.0
    return (
        F.when(clay.isNull() | sand.isNull() | silt.isNull(), F.lit(None))
        .when(n_clay >= 40.0, F.lit("Clay"))
        .when((n_sand >= 70.0) & (n_clay < 15.0), F.lit("Sand"))
        .when(n_silt >= 80.0, F.lit("Silt"))
        .when((n_clay >= 27.0) & (n_sand <= 45.0), F.lit("Clay Loam"))
        .when(n_sand >= 52.0, F.lit("Sandy Loam"))
        .when(n_silt >= 50.0, F.lit("Silt Loam"))
        .otherwise(F.lit("Loam"))
    )


# ------------------------------------------------------------------- text

# abbreviation expansion (reference cleaners.py:21-71 holds ~28 entries;
# representative agro subset). Longest-first ordering is load-bearing —
# 'approx.' must replace before 'approx'.
ABBREVIATIONS = [
    ("approx\\.", "approximately"),
    ("temp\\.", "temperature"),
    ("max\\.", "maximum"),
    ("min\\.", "minimum"),
    ("avg\\.", "average"),
    ("e\\.g\\.", "for example"),
    ("i\\.e\\.", "that is"),
]

UNIT_STANDARDIZATION = [
    ("\\bdeg\\s*C\\b", "°C"),
    ("\\bcentigrade\\b", "°C"),
    ("\\bmillimeters?\\b", "mm"),
    ("\\bcentimeters?\\b", "cm"),
    ("\\bhours?\\b", "hrs"),
]


def expand_abbreviations(text: Column) -> Column:
    """Ordered regexp_replace chain (reference cleaners.py:105-125)."""
    out = text
    for pat, repl in ABBREVIATIONS:
        out = F.regexp_replace(out, pat, repl)
    for pat, repl in UNIT_STANDARDIZATION:
        out = F.regexp_replace(out, pat, repl)
    return out


def strip_citations(text: Column) -> Column:
    """Remove [1,2]-style and (Author, 2020)-style citations and URLs
    (reference cleaners.py:127-143)."""
    out = F.regexp_replace(text, "\\[[0-9][0-9, ]*\\]", "")
    out = F.regexp_replace(out, "\\([A-Z][A-Za-z]+(?: et al\\.)?, [0-9]{4}\\)", "")
    out = F.regexp_replace(out, "https?://[^\\s]+", "")
    return out


NUMBER_WORDS = [
    ("zero", "0"), ("one", "1"), ("two", "2"), ("three", "3"), ("four", "4"),
    ("five", "5"), ("six", "6"), ("seven", "7"), ("eight", "8"), ("nine", "9"),
    ("ten", "10"), ("twenty", "20"), ("thirty", "30"),
]


def number_words_to_digits(text: Column) -> Column:
    """Word→digit replacement chain (reference cleaners.py:145-158)."""
    out = text
    for word, digit in NUMBER_WORDS:
        out = F.regexp_replace(out, f"\\b{word}\\b", digit)
    return out


def collapse_whitespace(text: Column) -> Column:
    """\\s+ → single space, trimmed (reference cleaners.py:160-163)."""
    return F.trim(F.regexp_replace(text, "\\s+", " "))


SENTENCE_SEP = "\u0001"  # boundary sentinel; never occurs in real text


def split_sentences(text: Column, min_len: int = 10) -> Column:
    """Sentence split keeping terminal punctuation, dropping fragments
    ≤ min_len chars (reference cleaners.py:177-183).

    RE2 (DuckDB) has no lookbehind, so instead of the reference's
    `(?<=[.!?])\\s+` we mark boundaries with a sentinel — identical
    semantics, portable dialect."""
    marked = F.regexp_replace(text, "([.!?])\\s+", "$1" + SENTENCE_SEP)
    return F.filter(
        F.split(marked, SENTENCE_SEP), lambda s: F.length(s) > min_len
    )

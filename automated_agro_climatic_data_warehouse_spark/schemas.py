"""Declared StructTypes for every warehouse table (SURVEY §1.1-1.2;
reference DDL db/init/01-schema.sql). No schema inference anywhere —
explicit types, PG DECIMAL(p,s) carried as DoubleType for engine parity
(SURVEY §7.4 decimal-vs-double risk) with the value ranges enforced by the
quality corpus instead of the storage type.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# dim_location — SCD2 (reference 01-schema.sql:12-26)
DIM_LOCATION = T.StructType([
    _f("location_key", T.LongType(), False),
    _f("location_hash", T.StringType(), False),  # md5 natural key (:21)
    _f("latitude", T.DoubleType(), False),
    _f("longitude", T.DoubleType(), False),
    _f("region_name", T.StringType()),
    _f("country_code", T.StringType()),
    _f("effective_date", T.DateType(), False),   # SCD2 (:22-24)
    _f("expiration_date", T.DateType()),
    _f("is_current", T.BooleanType(), False),
])

# dim_soil — SCD1 + JSON metadata (reference 01-schema.sql:33-50)
DIM_SOIL = T.StructType([
    _f("soil_key", T.LongType(), False),
    _f("location_key", T.LongType(), False),
    _f("extraction_date", T.DateType(), False),  # unique with location (:49)
    _f("soil_texture", T.StringType()),
    _f("clay_percent_0_5cm", T.DoubleType()),
    _f("sand_percent_0_5cm", T.DoubleType()),
    _f("silt_percent_0_5cm", T.DoubleType()),
    _f("ph_level_0_5cm", T.DoubleType()),
    _f("organic_carbon_0_5cm", T.DoubleType()),
    _f("metadata", T.StringType()),              # JSONB (:47) as JSON string
])

# dim_crop — NLP-extracted requirements (reference 01-schema.sql:57-84)
DIM_CROP = T.StructType([
    _f("crop_key", T.LongType(), False),
    _f("crop_name", T.StringType(), False),      # unique (:82-84)
    _f("optimal_temp_min_c", T.DoubleType()),
    _f("optimal_temp_max_c", T.DoubleType()),
    _f("water_requirement_mm_day", T.DoubleType()),
    _f("sunlight_hours", T.DoubleType()),
    _f("soil_ph_preference_min", T.DoubleType()),
    _f("soil_ph_preference_max", T.DoubleType()),
    _f("extraction_confidence", T.DoubleType()),
    _f("source_urls", T.ArrayType(T.StringType())),  # TEXT[] (:76)
])

# dim_date — generated calendar (reference 01-schema.sql:86-131);
# produced by sources/date_dim.py
DIM_DATE = T.StructType([
    _f("date_key", T.IntegerType(), False),      # YYYYMMDD (:87)
    _f("full_date", T.DateType(), False),
    _f("day_of_week", T.IntegerType()),
    _f("day_name", T.StringType()),
    _f("day_of_month", T.IntegerType()),
    _f("day_of_year", T.IntegerType()),
    _f("week_of_year", T.IntegerType()),
    _f("month_number", T.IntegerType()),
    _f("month_name", T.StringType()),
    _f("quarter", T.IntegerType()),
    _f("year", T.IntegerType()),
    _f("is_weekend", T.BooleanType()),
    _f("season_northern", T.StringType()),
    _f("season_southern", T.StringType()),
])

# fact_weather — daily time series, month-partitioned (reference
# 01-schema.sql:139-158; PG RANGE partitions become parquet
# partitionBy(year, month) with dynamic partition pruning)
FACT_WEATHER = T.StructType([
    _f("date_key", T.IntegerType(), False),
    _f("location_key", T.LongType(), False),
    _f("temp_max_c", T.DoubleType()),
    _f("temp_min_c", T.DoubleType()),
    _f("temp_mean_c", T.DoubleType()),
    _f("precipitation_mm", T.DoubleType()),
    _f("humidity_percent", T.DoubleType()),
    _f("wind_speed_ms", T.DoubleType()),
    _f("weather_code", T.IntegerType()),
    _f("batch_id", T.StringType()),
    _f("year", T.IntegerType(), False),   # partition cols
    _f("month", T.IntegerType(), False),
])

# fact_soil — point-in-time measurements (reference 01-schema.sql:187-200)
FACT_SOIL = T.StructType([
    _f("soil_fact_key", T.LongType(), False),
    _f("location_key", T.LongType(), False),
    _f("soil_key", T.LongType(), False),
    _f("measurement_date", T.DateType(), False),
    _f("moisture_percent", T.DoubleType()),
    _f("temperature_c", T.DoubleType()),
    _f("ph_measured", T.DoubleType()),
])

# fact_crop_suitability — derived scores (reference 01-schema.sql:203-221);
# produced by plans/suitability.py
FACT_CROP_SUITABILITY = T.StructType([
    _f("location_key", T.LongType(), False),
    _f("crop_name", T.StringType(), False),
    _f("temp_match", T.DoubleType()),
    _f("water_adequacy", T.DoubleType()),
    _f("soil_ph_match", T.DoubleType()),
    _f("overall_suitability", T.DoubleType()),
    _f("limiting_factor", T.StringType()),
    _f("recommendation_text", T.StringType()),
])

# control tables (reference 01-schema.sql:227-251); audit schema string
# lives in pipeline.py (AUDIT_SCHEMA)
IDEMPOTENCY_KEYS = T.StructType([
    _f("key_hash", T.StringType(), False),   # sha256 (:247)
    _f("entity_type", T.StringType()),
    _f("entity_key", T.StringType()),
])

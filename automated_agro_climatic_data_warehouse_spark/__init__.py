"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference agro-climatic data warehouse
(septimus51/Automated-Agro-Climatic-Data-Warehouse), re-expressed Spark-first.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, sane shuffle parts)
    sources/      testdata readers, date-dimension generator, landing parsers
    functions/    scalar Column-expression library (keys, cleaning, extraction)
    operators/    upsert/SCD2, dedup, similarity, text stats, quality rules
    plans/        named analytical queries (the driver-checked surface)
    streaming/    structured-streaming wrappers over the batch operators
"""

__version__ = "0.1.0"

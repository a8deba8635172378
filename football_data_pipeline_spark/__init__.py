"""football_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference pipeline (Coding-champ/Football-Data-Pipeline), rebuilt
idiomatically on the Spark DataFrame/SQL stack: nested-JSON flattening,
merge/upsert relational modeling, windowed time-series analytics, a
zero-UDF entity-resolution cascade, large-scale dedup / similarity /
text-analysis operators, and Structured Streaming equivalents of the
reference's cron-emulated micro-batches.

Layout
------
- ``session``    : SparkSession bootstrap with scale-conscious defaults
- ``catalog``    : loaders for the test star schema (TESTDATA.md)
- ``registry``   : the (query, oracle SQL) registry the driver consumes
- ``operators/`` : relational / time-series / flatten / upsert / dedup /
                   text / embedding operators (SURVEY.md §2)
- ``functions/`` : scalar kernels — name normalization + similarity
- ``sources/``   : bronze ingest schemas & readers, maintenance
- ``streaming/`` : Structured Streaming layer (SURVEY.md §2.10)

Import ``football_data_pipeline_spark.all_queries`` to populate the
registry with every driver-checkable query.
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the query/data-processing
capabilities of jj-liew/Cloud-Native-Reddit-Data-Pipeline.

The reference (at /root/reference, snapshot 2025-09-26) is a serverless
Reddit ETL + NLP pipeline: PRAW harvesters -> Redis queue -> Elasticsearch
-> pandas/sklearn batch analytics.  This package re-expresses every
implicit operator of that pipeline (SURVEY.md section 2, O1-O41) as
first-class, 100-TB-scale Spark DataFrame / Structured Streaming
operators, plus the training-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns) the reference lacks.

Layout
------
- ``session``    : SparkSession builder tuned for the harness.
- ``sources``    : parquet table loaders + reddit JSON ingest schemas.
- ``functions``  : scalar/column functions (text normalization, time
                   encoding, sentiment, vector math) - all JVM-side
                   ``pyspark.sql.functions`` compositions unless noted.
- ``operators``  : relational + analytical dataflow operators
                   (joins, top-k, dedup families, similarity search,
                   event-time windows, topic modelling).
- ``plans``      : end-to-end job compositions (the reference's EP3
                   analytics job re-expressed as one lazy DataFrame plan).
- ``streaming``  : Structured Streaming ingest (queue source, stateful
                   dedup, idempotent keyed upsert sink).
"""

__version__ = "0.1.0"

"""sumologic_aws_lambda_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of SumoLogic/sumologic-aws-lambda.

The reference (read-only at /root/reference) is a fleet of AWS Lambda
collectors (decode → parse → filter → enrich → transform → group → batch →
deliver) plus a Search-Job/FER query surface.  This package re-expresses
that capability Spark-first:

- ``sources``   — envelope/record decoders (CWL, VPC flow, CloudTrail, ASFF,
                  Firehose) as declarative DataFrame stages.
- ``functions`` — scalar/text/vector column-expression libraries (built-in
                  ``pyspark.sql.functions`` only; no row-at-a-time UDFs in
                  hot paths).
- ``operators`` — relational + LLM-data-pipeline operators (dedup,
                  similarity search, text analysis).
- ``plans``     — the Sumo-style query-language compiler (string → DataFrame).
- ``streaming`` — Structured Streaming ingestion shell (triggers, watermark,
                  DLQ/retry sink semantics).
- ``queries``   — the registry consumed by ``__spark_entry__.py``: every
                  implemented operator exposed as a (spark, sf_dir) →
                  DataFrame callable with a DuckDB oracle SQL twin.
"""

__version__ = "0.1.0"

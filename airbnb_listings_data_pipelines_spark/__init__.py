"""PySpark-native analytics engine with the query/data-processing surface of
``wenyingw/Airbnb-Listings-Data-Pipelines`` (reference: Snowflake SQL + Airflow
ELT over Airbnb listing snapshots), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local testing / cluster scale.
- ``sources``    : parquet testdata loaders, positional CSV reader (raw layer).
- ``functions``  : dialect shims (split_part, multi-replace, qualify, decimals).
- ``plans``      : the reference pipeline — staging → warehouse → datamart → adhoc.
- ``queries``    : driver-contract query registry (one per SURVEY.md §2 row).
- ``operators``  : large-scale training-data ops (dedup, similarity, text, multimodal).
- ``streaming``  : Structured Streaming over the events table.
"""

__version__ = "0.1.0"

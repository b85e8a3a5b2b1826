"""sap_cta_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of the reference ETL/feature pipeline ``jdhp-sap/
sap-cta-data-pipeline`` (reference snapshot at /root/reference was empty at
survey time — see SURVEY.md §0), rebuilt idiomatically on Spark DataFrames,
Spark SQL / Catalyst, and Structured Streaming, and extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) designed for 100 TB scale.

Public surface:

- :mod:`.session`   — SparkSession factory + runtime tuning (UTC, AQE).
- :mod:`.catalog`   — explicit schemas + loaders for the 10 test tables.
- :mod:`.registry`  — ``@query`` decorator populating the driver contract.
- :mod:`.operators` — the SURVEY.md §2 operator inventory.
- :mod:`.functions` — parity/vector/text helper column functions.
- :mod:`.streaming` — Structured Streaming twins of the §2-K batch ops.
"""

__version__ = "0.1.0"

"""agri_market_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``PrinceGhevariya-23DCS033/agri-market-data-pipeline``
(an incremental batch-ETL pipeline over India's Agmarknet mandi-price
feed; see ``SURVEY.md``), extended with the LLM-data-pipeline operator
surface (dedup, similarity search, text analysis, multimodal columns).

Layers:

- ``session``     — SparkSession builder tuned for scale (AQE, Arrow, UTC).
- ``schemas``     — explicit StructTypes (reference table + driver testdata).
- ``tables``      — parquet/CSV loaders for the driver testdata star schema.
- ``registry``    — the (queries, oracle_sql) registration surface consumed
                    by ``__spark_entry__.py``.
- ``operators/``  — the batch relational operator library (SURVEY.md §2.B).
- ``functions/``  — scalar/array/text column-expression helpers.
- ``sources/``    — ingestion: paginated REST source, checkpointing, sinks.
- ``streaming/``  — Structured Streaming operators (windows, dedup, state).

Everything is declarative DataFrame/SQL so Catalyst owns optimization;
Python UDFs appear only where built-ins genuinely cannot express the
semantics (and then as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

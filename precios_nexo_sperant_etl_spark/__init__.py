"""PySpark-native analytics engine with the query and data-processing
capabilities of ``dinatalediego/precios-nexo-sperant-etl``.

The reference is an eager single-threaded pandas ETL + BI-serving system
(see SURVEY.md). This package re-expresses every operator it supports as
idiomatic, lazy, distributed Spark DataFrame / SQL plans, designed so the
same code runs unchanged from local[32] test scale up to a multi-thousand
executor cluster over ~100 TB:

- ``session``   — tuned SparkSession builder (AQE, broadcast, shuffle sizing)
- ``sources``   — parquet table loaders + the ingest-normalization layer
                  (header detection, alias renames, duplicate-column
                  collapse) that the reference performs per-file
- ``functions`` — scalar Column-expression builders (locale number parsing,
                  key normalization, tolerant compares, half-even rounding)
- ``operators`` — relational operators (window dedup, enrich-join, audit
                  aggregation, pivot, serving-layer search/sort/page) plus
                  the beyond-reference scale operators (fuzzy dedup,
                  similarity search, text analysis, multimodal plumbing)
- ``plans``     — end-to-end pipeline compositions mirroring the
                  reference's three entry points
- ``streaming`` — Structured Streaming variants of the KPI aggregations
"""

__version__ = "0.1.0"

"""makerdao_dw_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``makerdao-rwf/makerdao-dw``.

The reference (surveyed in SURVEY.md) is a blockchain ETL that produces
relational tables and ships analytics SQL executed by an external warehouse.
This package re-expresses that whole surface Spark-first:

- ``abi``      — ABI -> StructType schema compiler (reference functions.py:86-115,
                 classes.py:52-87)
- ``decode``   — calldata / event-log decoders as vectorized pandas ops
                 (reference functions.py:119-149, eth-contract.py:92-123)
- ``ingest``   — partitioned block-range backfill + incremental pipelines with a
                 pluggable (mockable) RPC source (reference eth-blocks.py,
                 eth-contract.py)
- ``operators``— relational + LLM-data-pipeline operator library (dedup,
                 similarity search, text analysis, multimodal columns)
- ``queries``  — the declared query surface: every entry has a Spark
                 implementation and (where expressible) a DuckDB oracle SQL twin
"""

__version__ = "0.1.0"

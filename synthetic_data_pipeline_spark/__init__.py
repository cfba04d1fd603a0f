"""synthetic_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``kkaaars/synthetic-data-pipeline`` (see SURVEY.md):
synthetic-document generation with Sensitive Information Types (SITs),
format rendition, regex validation analytics — plus the relational,
streaming, deduplication, similarity-search and text-analysis operators
a large-scale training-data pipeline needs.

Design principles (SURVEY.md §4, §7):
- DataFrame/SQL declarative plans; let Catalyst optimize.
- Broadcast small dimensions; partial aggregation; AQE on.
- Deterministic md5-counter randomness instead of sequential PRNG
  (reference: modules/meta_generator.py:64 global ``random.seed``) so
  results are independent of partitioning AND reproducible in the
  DuckDB oracle.
- Pandas UDFs only where a Python library is load-bearing.
"""

__version__ = "0.1.0"

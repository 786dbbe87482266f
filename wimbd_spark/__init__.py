"""wimbd_spark — a PySpark-native corpus-analytics engine.

A from-scratch reimplementation of the query surface of allenai/wimbd
("What's In My Big Data?") on Spark's DataFrame/SQL algebra, plus the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text quality, multimodal plumbing, streaming).

Design rules (see SURVEY.md §7):
- Declarative DataFrame plans; Catalyst/AQE pick the physical strategy.
- Built-in `pyspark.sql.functions` in the hot path; Pandas UDFs only
  where built-ins can't express the semantics (model/tokenizer ops).
- Every operator scales out: hash agg + shuffle, broadcast small dims,
  window functions for per-key order; no driver-side loops.
"""

from wimbd_spark.session import (
    get_spark,
    load_tables,
    table_summary,
    union_tables,
)

__all__ = ["get_spark", "load_tables", "table_summary", "union_tables"]
__version__ = "0.1.0"

"""Beyond-reference operators: as-of/range joins, dedup, similarity search,
text analysis, multimodal plumbing, sessionization.

The reference has none of these (SURVEY.md §2.8) — they are the extension
surface a large-scale training-data pipeline needs, built Spark-first.
"""

from stupidb_spark.operators.asof import asof_join, range_join

__all__ = ["asof_join", "range_join"]

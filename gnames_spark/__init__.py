"""gnames_spark — PySpark-native near-duplicate detection & clustering engine.

A from-scratch re-expression of the query semantics of gnames/gnames
(candidate generation via approximate indexes → exact verification →
scoring → clustering → best-representative selection) as an idiomatic
Spark DataFrame pipeline over web-scale text corpora. See SURVEY.md.
"""

from gnames_spark.config import DEFAULT_CONFIG, DedupConfig  # noqa: F401

"""pond_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CM4all/pond (reference studied read-only
at /root/reference; see SURVEY.md for the operator inventory).

Pond is a volatile round-robin log database: one append-only log table,
filtered/windowed/grouped/streamed queries, plus client-side operators
(top-k accumulation, sessionization, GeoIP enrichment, anonymization,
formatting, partitioned sinks). This package re-expresses every
observable operator Spark-first: DataFrame/SQL plans optimized by
Catalyst, Parquet storage with partition/row-group pruning instead of
ring buffers and skip lists, and Structured Streaming for follow mode.

Beyond the reference surface, it adds the large-scale training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) under ``pond_spark.dedup``, ``.similarity``,
``.functions.text`` and ``.multimodal``.
"""

from pond_spark.filters import FilterSpec
from pond_spark.query import Query
from pond_spark.schema import LOG_SCHEMA

__version__ = "0.1.0"

__all__ = ["FilterSpec", "Query", "LOG_SCHEMA", "__version__"]

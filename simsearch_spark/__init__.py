"""simsearch_spark — a PySpark-native top-k multi-attribute similarity search
engine with the query semantics of smartdatalake/simsearch, plus the
large-scale training-data pipeline operators (dedup, ANN, text analysis,
multimodal plumbing) a 100 TB corpus needs.

Design stance (SURVEY.md §7): the reference fakes a scan-free top-k with
per-attribute in-heap indexes (B+-tree, STR-tree, inverted lists) walked by
one thread per attribute.  Spark's idiomatic answer is declarative:
score-everything as column expressions, let Catalyst push filters/prune
columns, and let `TakeOrderedAndProject` (per-partition top-k + merge on the
driver) replace every index walk.  All hot-path math is JVM-side built-in
functions — no Python row UDFs anywhere.
"""

from simsearch_spark.plans.spec import Facet, SearchRequest
from simsearch_spark.session import get_spark
from simsearch_spark.sources.catalog import Catalog

__all__ = ["Catalog", "Facet", "SearchRequest", "get_spark"]

__version__ = "0.1.0"

from simsearch_spark.plans.spec import Facet, SearchRequest

__all__ = ["Facet", "SearchRequest"]
